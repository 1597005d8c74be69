"""Similarity search over the ``embeddings`` table.

- ``ann_bruteforce_topk`` — exact cosine top-k: the correctness
  baseline. The query side is tiny (k query vectors) and broadcast,
  so the scan side streams once; ranking is a per-query window.
- ``ann_lsh_topk`` — the scale path: multi-table random-hyperplane
  LSH (N_TABLES independent tables of NBITS sign bits each, the
  classic recall amplifier). A vector lands in one bucket per
  table; candidates share a bucket in ANY table, then exact cosine
  reranks the deduplicated candidate set. At 100 TB the bucket
  joins replace the n·m pair blowup with per-bucket work; recall
  vs brute force is asserted in tests (tests/test_operators.py).

The hyperplanes are ±1-valued with signs derived from
md5(plane:dim), so the DuckDB oracle reproduces the buckets
bit-for-bit — even the approximate path is value-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datatransformertools_spark.functions.vectors import as_double, cosine_prenormed, norm
from datatransformertools_spark.sources.tables import load_table

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
NBITS = 4
N_TABLES = 4
DIM = 64

# ---------------------------------------------------------------------------
# ann_bruteforce_topk
# ---------------------------------------------------------------------------


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cands = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    pairs = cands.crossJoin(F.broadcast(queries))  # query side broadcast: scan streams once
    cos = F.round(cosine_prenormed(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")) + 1e-9, 6)
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cos_sim"))
    rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    )
    return (
        scored.withColumn("rank", rank)
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


ANN_BRUTEFORCE_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e WHERE vec_id >= {N_QUERIES}),
scored AS (
  SELECT query_id, neighbor_id,
         round(
           CASE WHEN sqrt(list_sum(list_transform(qv, x -> x * x)))
                     * sqrt(list_sum(list_transform(cv, x -> x * x))) > 0
                THEN list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i]))
                     / (sqrt(list_sum(list_transform(qv, x -> x * x)))
                        * sqrt(list_sum(list_transform(cv, x -> x * x))))
                ELSE 0.0 END + 1e-9, 6) AS cos_sim
  FROM q CROSS JOIN c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cos_sim FROM ranked WHERE rank <= {TOP_K}
"""

# ---------------------------------------------------------------------------
# ann_lsh_topk — sign-random-projection buckets, then exact rerank
# ---------------------------------------------------------------------------


def _plane_signs() -> list[list[list[float]]]:
    """±1 hyperplane signs from md5(t:p:d) low bit — computed once
    in Python so both engines embed identical literal arrays (no
    per-row hashing; bucket assignment is a pure dot product)."""
    import hashlib

    tables = []
    for t in range(N_TABLES):
        planes = []
        for p in range(NBITS):
            row = []
            for d in range(DIM):
                h = hashlib.md5(f"{t}:{p}:{d}".encode()).hexdigest()
                row.append(1.0 if int(h[0], 16) % 2 == 1 else -1.0)
            planes.append(row)
        tables.append(planes)
    return tables


PLANES = _plane_signs()


def _bucket_col(v, table: int) -> F.Column:
    """LSH bucket id in one table: bit p = sign of Σ_d v[d]·h(t,p,d)."""
    plane_dots = []
    for p in range(NBITS):
        signs = F.array(*[F.lit(s) for s in PLANES[table][p]])
        dot = F.aggregate(F.zip_with(v, signs, lambda x, s: x * s), F.lit(0.0), lambda acc, x: acc + x)
        plane_dots.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return sum(plane_dots)


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    buckets = F.array(*[_bucket_col(F.col("v"), t) for t in range(N_TABLES)])
    bucketed = emb.select(
        "vec_id", "v", "nrm",
        F.explode(
            F.transform(buckets, lambda b, i: F.concat(i.cast("string"), F.lit(":"), b.cast("string")))
        ).alias("bucket"),
    )
    queries = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), F.col("bucket").alias("qb")
    )
    cands = bucketed.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), F.col("bucket").alias("cb")
    )
    pairs = (
        cands.join(F.broadcast(queries), F.col("cb") == F.col("qb"))
        .select("query_id", "neighbor_id", "qv", "cv", "qn", "cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = F.round(cosine_prenormed(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")) + 1e-9, 6)
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cos_sim"))
    rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    )
    return (
        scored.withColumn("rank", rank)
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def _lsh_sql() -> str:
    bucket_cols = []
    for t in range(N_TABLES):
        plane_terms = []
        for p in range(NBITS):
            lit = "[" + ", ".join(str(s) for s in PLANES[t][p]) + "]"
            dot = f"list_sum(list_transform(range(1, {DIM} + 1), i -> v[i] * ({lit}::DOUBLE[])[i]))"
            plane_terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
        bucket_cols.append(f"'{t}:' || CAST({' + '.join(plane_terms)} AS VARCHAR) AS bucket{t}")
    bucket_select = ",\n    ".join(bucket_cols)
    union = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, v, bucket{t} AS bucket FROM with_buckets" for t in range(N_TABLES)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
with_buckets AS (
  SELECT vec_id, v,
    {bucket_select}
  FROM e
),
bucketed AS (
  {union}
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb FROM bucketed WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket AS cb FROM bucketed WHERE vec_id >= {N_QUERIES}),
cand AS (
  SELECT DISTINCT ON (query_id, neighbor_id) query_id, neighbor_id, qv, cv
  FROM q JOIN c ON qb = cb
),
scored AS (
  SELECT query_id, neighbor_id,
         round(
           CASE WHEN sqrt(list_sum(list_transform(qv, x -> x * x)))
                     * sqrt(list_sum(list_transform(cv, x -> x * x))) > 0
                THEN list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i]))
                     / (sqrt(list_sum(list_transform(qv, x -> x * x)))
                        * sqrt(list_sum(list_transform(cv, x -> x * x))))
                ELSE 0.0 END + 1e-9, 6) AS cos_sim
  FROM cand
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cos_sim FROM ranked WHERE rank <= {TOP_K}
"""


ANN_LSH_SQL = _lsh_sql()


QUERIES = {
    "ann_bruteforce_topk": (ann_bruteforce_topk, ANN_BRUTEFORCE_SQL),
    "ann_lsh_topk": (ann_lsh_topk, ANN_LSH_SQL),
}
