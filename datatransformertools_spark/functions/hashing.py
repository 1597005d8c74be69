"""Stable cross-engine hash primitives.

Everything here is built on md5 because its byte-for-byte output is
identical in Spark, DuckDB, and every other engine — that is what
lets the driver's DuckDB oracle hash-check our minhash / simhash /
fingerprint results value-by-value. All expressions are built-in
JVM functions (no UDFs): md5 + substring + conv run inside
whole-stage codegen, so a 100 TB minhash pass is scan-bound, not
Python-bound.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 15 hex chars = 60 bits — always fits a signed int64.
_HEX_CHARS = 15


def md5_long(col: Column, salt: str | None = None) -> Column:
    """Stable 60-bit non-negative int64 hash of a string column.

    DuckDB equivalent: ``('0x' || substr(md5(<salt>||x),1,15))::BIGINT``.
    """
    s = F.concat(F.lit(salt), col) if salt is not None else col
    return F.conv(F.substring(F.md5(s), 1, _HEX_CHARS), 16, 10).cast("long")


def md5_bits32(col: Column, offset: int) -> Column:
    """A 32-bit unsigned slice of md5(col) as int64 (hex chars
    offset..offset+7). Used for simhash bit planes."""
    return F.conv(F.substring(F.md5(col), offset, 8), 16, 10).cast("long")


def minhash_signature(shingles: Column, num_perm: int) -> Column:
    """Minhash signature: array of per-permutation minima over an
    array-of-string shingles column.

    Each "permutation" i is the independent hash family
    md5(i||':'||shingle) → 60-bit int. array_min over the
    transformed array is a per-row JVM loop — no shuffle, no UDF.
    Perf note: higher-order-function lambdas evaluate interpreted
    (outside codegen), so the production dedup pipeline uses the
    explode + codegen'd agg-min form instead
    (operators/dedup.py:_signature_df); this builder suits plans
    that need the signature as an array column without an exchange.
    """
    sigs = [
        F.array_min(
            F.transform(
                shingles,
                lambda s, i=i: F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{i}:"), s)), 1, _HEX_CHARS), 16, 10
                ).cast("long"),
            )
        )
        for i in range(num_perm)
    ]
    return F.array(*sigs)


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Banded LSH keys: md5 over each band's slice of the signature.

    Docs sharing any band key become candidate pairs — the join key
    is a 32-hex-char string, so the dedup shuffle moves ~40 bytes
    per (doc, band), independent of document size. That is the
    100 TB design: never shuffle text, only signatures.
    """
    keys = []
    for b in range(bands):
        parts = [F.lit(f"{b}:")]
        for r in range(rows_per_band):
            idx = b * rows_per_band + r
            parts.append(F.element_at(signature, idx + 1).cast("string"))
            parts.append(F.lit(","))
        keys.append(F.md5(F.concat(*parts)))
    return F.array(*keys)
