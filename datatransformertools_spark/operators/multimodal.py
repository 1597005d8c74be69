"""Multimodal column plumbing.

Re-expresses the reference server's media handling
(`Tools/server.py:43-88`: bytes → decoded pages/images → batched
model input) as Spark-native plumbing: media travel as opaque
``binary`` columns with typed metadata; per-item decode /
feature-extract runs as Arrow-batched ``mapInPandas`` so Python
touches whole columnar batches, never single rows.

The container (by design) has no image/audio codecs, so the decode
kernel is a deterministic stub (documented below); everything
around it — schema, batch shape, partitioning, UDF signature — is
real and tested (tests/test_multimodal.py).

``multimodal_manifest`` is the oracle-checked query: it builds the
binary payload column from document text (utf-8 bytes — the same
trick both engines can replay) and derives the typed metadata a
100 TB media lake would carry per object: byte length, sha256,
sniffed kind, shard assignment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datatransformertools_spark.functions.hashing import md5_long
from datatransformertools_spark.sources.tables import load_table

N_SHARDS = 16

# ---------------------------------------------------------------------------
# multimodal_manifest — oracle-checked metadata derivation
# ---------------------------------------------------------------------------


def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    payload = F.encode(F.col("text"), "UTF-8")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        F.col("source").alias("bucket"),
        kind.alias("media_kind"),
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
        (md5_long(F.col("text"), salt="shard:") % N_SHARDS).alias("shard"),
    )


MULTIMODAL_MANIFEST_SQL = f"""
SELECT
  doc_id,
  source AS bucket,
  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_kind,
  octet_length(encode(text))  AS n_bytes,
  sha256(text)                AS sha256,
  ('0x' || substr(md5('shard:' || text), 1, 15))::BIGINT % {N_SHARDS} AS shard
FROM documents
"""

# ---------------------------------------------------------------------------
# decode / feature plumbing — real Spark mechanics, stubbed kernel
# ---------------------------------------------------------------------------

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature", BinaryType()),
    ]
)


def _decode_kernel(payload: bytes, kind: str) -> dict:
    """STUB decode: the real implementation would call PIL/ffmpeg
    here (absent from this container by design). The stub derives
    deterministic pseudo-metadata from the payload bytes so the
    pipeline stays testable end to end; swapping in a real codec
    changes only this function."""
    n = len(payload)
    if kind == "image":
        return {"width": 64 + n % 512, "height": 64 + n % 384, "n_frames": 1}
    if kind == "video":
        return {"width": 320, "height": 240, "n_frames": 1 + n % 120}
    return {"width": 0, "height": 0, "n_frames": 1 + n % 600}  # audio: frames≈chunks


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode over (doc_id, media_kind, payload).

    mapInPandas streams whole record batches through Python — the
    reference's one-file-at-a-time PIL loop (server.py:76-82)
    becomes a vectorized per-partition pass that scales with
    executors, and the decode cost is amortized over Arrow batches
    instead of paid per row.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_kernel(p, k) for p, k in zip(pdf["payload"], pdf["media_kind"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_kind": pdf["media_kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    # stub "feature": first 8 payload bytes — stands in for
                    # an embedding / thumbnail produced by a real kernel
                    "feature": [bytes(p[:8]) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(decode, DECODED_SCHEMA)


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, media_kind, payload) frame used by the decode tests:
    payload is the utf-8 text, kind assigned deterministically,
    repartitioned by shard the way a media lake would be."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        kind.alias("media_kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    ).repartition(8, "doc_id")


QUERIES = {
    "multimodal_manifest": (multimodal_manifest, MULTIMODAL_MANIFEST_SQL),
}
