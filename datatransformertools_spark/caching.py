"""Session-scoped cache tracking for stage tables.

Several operators persist intermediate stage tables (shingles,
minhash signatures, IoU pairs) that multiple downstream plans reuse
within one query run. A bare ``.persist()`` inside a plan builder
has no release path, so a long-lived session running many queries
(bench.py runs the whole registry) accumulates cached blocks it can
never free. ``track()`` registers every such frame; callers that
own the session lifecycle (bench.py per query, tests per module)
call ``release_caches()`` to drop them all.

At cluster scale the same role is played by writing the stage table
to storage; in-session, persist+track is the zero-copy equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []


def track(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` and register it for later release."""
    df.persist(level) if level is not None else df.persist()
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked frame (LIFO); returns how many."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session may already be stopped
    return n
