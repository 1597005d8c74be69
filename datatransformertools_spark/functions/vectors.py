"""Dense-vector math over array<float>/array<double> columns.

Built on zip_with + aggregate — sequential fold per row, JVM-side,
no UDF. Elements are cast to double before folding so the result
is bit-identical to a sequential double accumulation in any other
engine (the DuckDB oracle does the same cast).

Scale note: brute-force similarity is O(n·m) pair rows; the pair
generation is a broadcast (small query side) or bucketed join —
the per-pair dot product itself is cheap, the design question is
always who joins with whom (see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = as_double(a), as_double(b)
    denom = norm(ad) * norm(bd)
    return F.when(denom > 0, dot(ad, bd) / denom).otherwise(F.lit(0.0))


def cosine_prenormed(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with per-vector norms precomputed BEFORE the pair join
    — same values as ``cosine`` (identical sequential fold per
    vector) but the O(pairs) stage folds one array instead of
    three. This is the form every pairwise operator should use at
    scale."""
    denom = norm_a * norm_b
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))
