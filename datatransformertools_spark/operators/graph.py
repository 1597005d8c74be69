"""Graph analytics over relationship edges derived from the star
schema.

`part_pagerank` runs the classic distributed PageRank loop (the
GraphX/Pregel shape) over the part co-purchase graph: parts are
nodes, an undirected edge connects two parts bought in the same
order. Each iteration is one shuffle (contributions grouped by
destination); the edge and degree tables are built once, persisted,
and reused every round; `localCheckpoint` truncates lineage between
rounds exactly like the connected-components loop in
``operators/dedup.py``. Driver-side state is two scalars (node
count, iteration index) — never row data.

Cross-engine determinism follows the k-means recipe
(``operators/similarity.py``): ranks are quantized to 9 dp at every
iteration boundary in BOTH engines so float summation-order noise
cannot compound, and the DuckDB oracle replays the same five rounds
as an unrolled CTE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datatransformertools_spark.caching import track
from datatransformertools_spark.sources.tables import load_table

PR_DAMPING = 0.85
PR_ITERS = 5


def part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph. Scale design: the
    distinct edge list shuffles on l_orderkey once to build (the
    same apriori shape as orders_market_basket, fan-out bounded by
    basket size); every iteration shuffles only (dst, contribution)
    pairs with map-side partial sums; degree rides a persisted
    src-keyed table so the per-round join reuses one partitioning.
    All nodes have ≥1 in-edge (edges are symmetric), so no dangling
    mass correction is needed. The node count is the one scalar the
    driver holds between rounds — the same exemption the CC and
    k-means loops use."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = track(
        a.join(b, "l_orderkey").filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    )
    deg = track(edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")))
    n_nodes = deg.count()  # scalar: every node appears as a src (symmetric edges)

    ranks = deg.select(
        F.col("src").alias("part"),
        F.round(F.lit(1.0 / n_nodes) + 1e-9, 9).alias("r"),
    )
    base = F.lit((1.0 - PR_DAMPING) / n_nodes)
    for i in range(PR_ITERS):
        contribs = (
            edges.join(ranks, edges.src == ranks.part)
            .join(deg, "src")
            .select("dst", (F.col("r") / F.col("deg")).alias("c"))
        )
        ranks = (
            contribs.groupBy("dst")
            .agg(F.round(base + PR_DAMPING * F.sum("c") + 1e-9, 9).alias("r"))
            .select(F.col("dst").alias("part"), "r")
        )
        if i < PR_ITERS - 1:
            ranks = ranks.localCheckpoint()  # truncate lineage; final round stays lazy
    return ranks.join(deg, ranks.part == deg.src).select(
        "part",
        F.col("deg").alias("n_neighbors"),
        F.round(F.col("r") + 1e-9, 6).alias("pagerank"),
    )


def _pagerank_sql() -> str:
    n = "(SELECT count(*) FROM deg)"
    ctes = [
        "li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
)""",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1)",
        f"r0 AS (SELECT src AS part, round(1.0/{n} + 1e-9, 9) AS r FROM deg)",
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT e.dst AS part,
         round((1.0 - {PR_DAMPING})/{n} + {PR_DAMPING}*sum(r.r/d.deg) + 1e-9, 9) AS r
  FROM edges e
  JOIN r{i - 1} r ON e.src = r.part
  JOIN deg d ON e.src = d.src
  GROUP BY e.dst
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT f.part, CAST(d.deg AS BIGINT) AS n_neighbors, round(f.r + 1e-9, 6) AS pagerank
FROM r{PR_ITERS} f JOIN deg d ON f.part = d.src
"""
    )


PART_PAGERANK_SQL = _pagerank_sql()


QUERIES = {
    "part_pagerank": (part_pagerank, PART_PAGERANK_SQL),
}
