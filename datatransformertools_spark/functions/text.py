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
    """n-gram word shingles from a token array (space-joined).

    Spark arrays are 0-based; the DuckDB twin uses 1-based list
    indexing — both enumerate windows [i, i+n).
    """
    idx = F.sequence(F.lit(0), F.size(tok) - n)
    parts = lambda i: [F.element_at(tok, i + j + 1) for j in range(n)]  # noqa: E731
    return F.when(
        F.size(tok) >= n,
        F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))),
    ).otherwise(F.array().cast("array<string>"))
