"""Text analysis Column builders.

All built-in JVM expressions (split/regexp/transform) — the text
hot path stays inside whole-stage codegen. Every builder has an
exact ANSI-SQL twin used in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse whitespace, trim — the canonical form
    used by exact dedup and fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    return F.split(F.trim(col), r"\s+")


def word_shingles(tok: Column, n: int) -> Column:
    """n-gram word shingles from a token array (space-joined,
    deduplicated, first-occurrence order).

    Built by zipping n-1 shifted copies of the array —
    `zip_with(acc, slice(tok, j+1, …))` — instead of indexing with
    `transform(sequence, i -> element_at(tok, i+j))`: the positional
    zip traverses each array once and benchmarks ~10× faster than
    per-index element_at under the interpreted higher-order-function
    path. Tail entries where the shifted copy ran out are partial
    windows; the final slice keeps only the size-n+1 valid ones.
    The DuckDB twin enumerates windows [i, i+n) with 1-based list
    indexing — identical keys.
    """
    acc = tok
    for j in range(1, n):
        shifted = F.slice(tok, j + 1, F.greatest(F.lit(0), F.size(tok) - j))
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat_ws(" ", x, y))
    win = F.slice(acc, 1, F.greatest(F.lit(0), F.size(tok) - (n - 1)))
    return F.when(F.size(tok) >= n, F.array_distinct(win)).otherwise(
        F.array().cast("array<string>")
    )
