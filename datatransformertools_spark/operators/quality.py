"""Corpus quality-filter operators (Gopher/C4-style heuristics).

The pre-training quality gate family: rule-based document filters
in the style of Gopher (Rae et al. 2021, arXiv:2112.11446 §A1.1)
and C4 (Raffel et al. 2020), re-expressed as pure JVM column
expressions so a 100 TB filter pass is scan-bound.

- ``gopher_quality_filter`` — per-document rule flags + keep
  decision: word-count bounds, mean-word-length bounds, alphabetic
  word fraction, top-word dominance. The only shuffle is the
  (doc_id, word) count for the dominance rule, which map-side
  combines to ≤|vocab| rows per doc before the exchange.
- ``doc_length_percentile_filter`` — drop the global length tails
  (P5/P95): the two scalars ride as a broadcast 1-row frame (house
  rule), so the filter is one scan + one tiny aggregate, never a
  sort.
- ``word_zipf_slope`` — per-source Zipf slope (regr_slope of
  log-frequency on log-rank): the corpus-health diagnostic that
  flags template/boilerplate sources (slope far from ~-1). All
  aggregation collapses to |sources|·|vocab| rows map-side.

Reference scope note: the reference repo (aibelbin/
DataTransformerTools) has no corpus tooling; this family extends
the engine to the training-data pipeline per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datatransformertools_spark.functions.text import tokens
from datatransformertools_spark.operators.dedup import _FrameMemo
from datatransformertools_spark.sources.tables import load_table

# the standardized logreg feature frame (see _logreg_features)
_FEATS_MEMO = _FrameMemo()

# Gopher-style thresholds, tuned so each rule does real work on the
# synthetic corpus (word counts span 10-99, median 56; top-word
# dominance averages 0.10).
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_ALPHA_WORD_FRAC = 0.80
MAX_TOP_WORD_RATIO = 0.12


def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = tokens(F.trim(F.col("text")))
    n_words = F.size(tok)
    # mean word length = non-space chars / words (single regex pass)
    n_nonspace = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s", ""))
    mean_wl = F.when(n_words > 0, n_nonspace / n_words).otherwise(F.lit(0.0))
    alpha_words = F.size(F.filter(tok, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.when(n_words > 0, alpha_words / n_words).otherwise(F.lit(0.0))
    base = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wl + 1e-9, 6).alias("mean_word_len"),
        F.round(alpha_frac + 1e-9, 6).alias("alpha_word_frac"),
    )

    # dominance rule: most frequent word's share. explode → two
    # keyed aggregations; the first map-side combines duplicates, so
    # the exchange carries ≤|per-doc vocab| rows per document and
    # never the text itself.
    top = (
        docs.select("doc_id", F.explode(tokens(F.trim(F.col("text")))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word_count"))
    )

    joined = base.join(top, "doc_id", "left").withColumn(
        "top_word_ratio",
        F.round(
            F.when(F.col("n_words") > 0, F.col("top_word_count") / F.col("n_words")).otherwise(
                F.lit(0.0)
            )
            + 1e-9,
            6,
        ),
    )
    rule_len = (F.col("n_words") >= MIN_WORDS) & (F.col("n_words") <= MAX_WORDS)
    rule_wl = (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN) & (
        F.col("mean_word_len") <= MAX_MEAN_WORD_LEN
    )
    rule_alpha = F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC
    rule_dom = F.col("top_word_ratio") <= MAX_TOP_WORD_RATIO
    return joined.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_word_frac",
        "top_word_ratio",
        rule_len.cast("int").alias("rule_word_count"),
        rule_wl.cast("int").alias("rule_mean_word_len"),
        rule_alpha.cast("int").alias("rule_alpha_frac"),
        rule_dom.cast("int").alias("rule_dominance"),
        (rule_len & rule_wl & rule_alpha & rule_dom).cast("int").alias("keep"),
    )


GOPHER_QUALITY_FILTER_SQL = rf"""
WITH t AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS tok
  FROM documents
),
base AS (
  SELECT doc_id,
         len(tok) AS n_words,
         round(CASE WHEN len(tok) > 0
                    THEN length(regexp_replace(trim(text), '\s', '', 'g'))::DOUBLE / len(tok)
                    ELSE 0.0 END + 1e-9, 6) AS mean_word_len,
         round(CASE WHEN len(tok) > 0
                    THEN len(list_filter(tok, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE / len(tok)
                    ELSE 0.0 END + 1e-9, 6) AS alpha_word_frac
  FROM t
),
wc AS (
  SELECT doc_id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(tok) AS w FROM t)
  GROUP BY 1, 2
),
top AS (
  SELECT doc_id, max(c) AS top_word_count FROM wc GROUP BY 1
),
j AS (
  SELECT base.*,
         round(CASE WHEN n_words > 0
                    THEN top.top_word_count::DOUBLE / n_words
                    ELSE 0.0 END + 1e-9, 6) AS top_word_ratio
  FROM base LEFT JOIN top USING (doc_id)
)
SELECT doc_id, n_words, mean_word_len, alpha_word_frac, top_word_ratio,
       CASE WHEN n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS} THEN 1 ELSE 0 END AS rule_word_count,
       CASE WHEN mean_word_len BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN} THEN 1 ELSE 0 END AS rule_mean_word_len,
       CASE WHEN alpha_word_frac >= {MIN_ALPHA_WORD_FRAC} THEN 1 ELSE 0 END AS rule_alpha_frac,
       CASE WHEN top_word_ratio <= {MAX_TOP_WORD_RATIO} THEN 1 ELSE 0 END AS rule_dominance,
       CASE WHEN n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
             AND mean_word_len BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN}
             AND alpha_word_frac >= {MIN_ALPHA_WORD_FRAC}
             AND top_word_ratio <= {MAX_TOP_WORD_RATIO}
            THEN 1 ELSE 0 END AS keep
FROM j
"""


# ---------------------------------------------------------------------------
# doc_length_percentile_filter — drop global length tails
# ---------------------------------------------------------------------------

P_LO = 0.05
P_HI = 0.95


def doc_length_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents whose n_chars lies in the global [P5, P95]
    band. The exact percentiles (linear interpolation — identical
    definition to DuckDB's quantile_cont) reduce map-side to one
    1-row frame that rides as a broadcast scalar (house rule): one
    scan for the bounds, one for the filter, zero sorts."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    bounds = docs.agg(
        F.round(F.expr(f"percentile(n_chars, {P_LO})") + 1e-9, 6).alias("p_lo"),
        F.round(F.expr(f"percentile(n_chars, {P_HI})") + 1e-9, 6).alias("p_hi"),
    )
    return (
        docs.crossJoin(F.broadcast(bounds))
        .filter((F.col("n_chars") >= F.col("p_lo")) & (F.col("n_chars") <= F.col("p_hi")))
        .select("doc_id", "source", "n_chars", "p_lo", "p_hi")
    )


DOC_LENGTH_PERCENTILE_FILTER_SQL = f"""
WITH bounds AS (
  SELECT round(quantile_cont(n_chars, {P_LO}) + 1e-9, 6) AS p_lo,
         round(quantile_cont(n_chars, {P_HI}) + 1e-9, 6) AS p_hi
  FROM documents
)
SELECT doc_id, source, n_chars, p_lo, p_hi
FROM documents, bounds
WHERE n_chars >= p_lo AND n_chars <= p_hi
"""


# ---------------------------------------------------------------------------
# word_zipf_slope — per-source rank-frequency slope
# ---------------------------------------------------------------------------


def word_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of ln(frequency) on ln(rank) per source
    — natural text sits near -1; template/boilerplate sources skew
    shallow. Counts collapse map-side to |sources|·|vocab| rows;
    the rank window partitions by source (one task per source after
    the agg, trivially small frames). Ties rank deterministically
    by (count desc, word asc) in both engines."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    wc = (
        docs.select("source", F.explode(tokens(F.trim(F.col("text")))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rank = Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("w").asc())
    ranked = wc.withColumn("r", F.row_number().over(rank))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.round(F.expr("regr_slope(ln(c), ln(r))") + 1e-9, 6).alias("zipf_slope"),
            F.round(F.expr("regr_r2(ln(c), ln(r))") + 1e-9, 6).alias("zipf_r2"),
        )
    )


WORD_ZIPF_SLOPE_SQL = r"""
WITH wc AS (
  SELECT source, w, count(*) AS c
  FROM (
    SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
    FROM documents
  )
  GROUP BY 1, 2
),
ranked AS (
  SELECT source, c,
         row_number() OVER (PARTITION BY source ORDER BY c DESC, w ASC) AS r
  FROM wc
)
SELECT source,
       count(*) AS n_distinct_words,
       round(regr_slope(ln(c), ln(r)) + 1e-9, 6) AS zipf_slope,
       round(regr_r2(ln(c), ln(r)) + 1e-9, 6) AS zipf_r2
FROM ranked
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# corpus_filter_funnel — per-stage survivor counts of the filter chain
# ---------------------------------------------------------------------------

FUNNEL_QUALITY_MIN = 0.5  # corpus_prep_pipeline's keep threshold


def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel observability: the per-stage doc/token survivor
    counts every production corpus pipeline reports (raw → quality
    score ≥ 0.5 → exact dedup first-keeper → length inside the raw
    [P5, P95] band). Same score/hash definitions as
    `corpus_prep_pipeline`, same percentile definition as
    `doc_length_percentile_filter`, so the funnel audits exactly the
    filters the engine ships.

    Scale design: one scan computes every per-doc flag (score, hash,
    tokens fused in one projection); the percentile bounds ride as a
    broadcast 1-row frame; the dedup-keeper decision is the single
    data-scale shuffle (hash window); all eight funnel sums collapse
    map-side into ONE 1-row aggregate, and the 4 output rows explode
    from it — counts only, no per-doc rows leave the executors."""
    from datatransformertools_spark.functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    norm = normalize_text(F.col("text"))
    tok = tokens(norm)
    n_tokens = F.size(tok)
    uniq_ratio = F.when(n_tokens > 0, F.size(F.array_distinct(tok)) / n_tokens).otherwise(
        F.lit(0.0)
    )
    score = F.round(
        0.5 * uniq_ratio + 0.5 * F.least(F.col("n_chars") / F.lit(400.0), F.lit(1.0)) + 1e-9, 6
    )
    base = docs.select(
        "doc_id",
        "n_chars",
        F.md5(norm).alias("h"),
        n_tokens.alias("n_tok"),
        score.alias("q"),
    )
    bounds = docs.agg(
        F.round(F.expr(f"percentile(n_chars, {P_LO})") + 1e-9, 6).alias("p_lo"),
        F.round(F.expr(f"percentile(n_chars, {P_HI})") + 1e-9, 6).alias("p_hi"),
    )
    rn = F.row_number().over(Window.partitionBy("h", "q_pass").orderBy("doc_id"))
    flags = (
        base.crossJoin(F.broadcast(bounds))
        .withColumn("q_pass", F.col("q") >= FUNNEL_QUALITY_MIN)
        .withColumn("d_pass", F.col("q_pass") & (rn == 1))
        .withColumn(
            "l_pass",
            F.col("d_pass")
            & (F.col("n_chars") >= F.col("p_lo"))
            & (F.col("n_chars") <= F.col("p_hi")),
        )
    )
    passes = [F.lit(True), F.col("q_pass"), F.col("d_pass"), F.col("l_pass")]
    aggs = []
    for i, p in enumerate(passes):
        aggs.append(F.sum(p.cast("long")).alias(f"docs{i}"))
        aggs.append(F.sum(F.when(p, F.col("n_tok").cast("long")).otherwise(F.lit(0))).alias(f"toks{i}"))
    sums = flags.agg(*aggs)  # 1 row
    stages = ["raw", "quality", "exact_dedup", "length_band"]
    rows = [
        F.struct(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(s).alias("stage"),
            F.col(f"docs{i}").alias("n_docs"),
            F.col(f"toks{i}").alias("n_tokens"),
            F.round(F.col(f"docs{i}") / F.col("docs0") + 1e-9, 6).alias("doc_retention"),
            F.round(F.col(f"toks{i}") / F.col("toks0") + 1e-9, 6).alias("token_retention"),
        )
        for i, s in enumerate(stages)
    ]
    return sums.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


CORPUS_FILTER_FUNNEL_SQL = rf"""
WITH base AS (
  SELECT doc_id, n_chars,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h,
         len(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), '\s+')) AS n_tok,
         round(
           0.5 * (CASE WHEN len(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), '\s+')) > 0
                       THEN len(list_distinct(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), '\s+')))::DOUBLE
                            / len(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), '\s+'))
                       ELSE 0.0 END)
           + 0.5 * least(n_chars / 400.0, 1.0) + 1e-9, 6) AS q
  FROM documents
),
bounds AS (
  SELECT round(quantile_cont(n_chars, {P_LO}) + 1e-9, 6) AS p_lo,
         round(quantile_cont(n_chars, {P_HI}) + 1e-9, 6) AS p_hi
  FROM documents
),
flag1 AS (SELECT *, (q >= {FUNNEL_QUALITY_MIN}) AS q_pass FROM base),
flag2 AS (
  SELECT *, row_number() OVER (PARTITION BY h, q_pass ORDER BY doc_id) AS rn FROM flag1
),
flags AS (
  SELECT f.*, (q_pass AND rn = 1) AS d_pass,
         (q_pass AND rn = 1 AND n_chars >= p_lo AND n_chars <= p_hi) AS l_pass
  FROM flag2 f, bounds
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS docs0, CAST(sum(n_tok) AS BIGINT) AS toks0,
         CAST(sum(CASE WHEN q_pass THEN 1 ELSE 0 END) AS BIGINT) AS docs1,
         CAST(sum(CASE WHEN q_pass THEN n_tok ELSE 0 END) AS BIGINT) AS toks1,
         CAST(sum(CASE WHEN d_pass THEN 1 ELSE 0 END) AS BIGINT) AS docs2,
         CAST(sum(CASE WHEN d_pass THEN n_tok ELSE 0 END) AS BIGINT) AS toks2,
         CAST(sum(CASE WHEN l_pass THEN 1 ELSE 0 END) AS BIGINT) AS docs3,
         CAST(sum(CASE WHEN l_pass THEN n_tok ELSE 0 END) AS BIGINT) AS toks3
  FROM flags
)
SELECT CAST(s.idx AS INT) AS stage_idx, s.stage,
       CASE s.idx WHEN 0 THEN docs0 WHEN 1 THEN docs1 WHEN 2 THEN docs2 ELSE docs3 END AS n_docs,
       CASE s.idx WHEN 0 THEN toks0 WHEN 1 THEN toks1 WHEN 2 THEN toks2 ELSE toks3 END AS n_tokens,
       round((CASE s.idx WHEN 0 THEN docs0 WHEN 1 THEN docs1 WHEN 2 THEN docs2 ELSE docs3 END)
             / docs0 + 1e-9, 6) AS doc_retention,
       round((CASE s.idx WHEN 0 THEN toks0 WHEN 1 THEN toks1 WHEN 2 THEN toks2 ELSE toks3 END)
             / toks0 + 1e-9, 6) AS token_retention
FROM (VALUES (0, 'raw'), (1, 'quality'), (2, 'exact_dedup'), (3, 'length_band')) AS s(idx, stage),
     sums
"""


# ---------------------------------------------------------------------------
# corpus_filter_ablation — independent-filter overlap grid (r8)
# ---------------------------------------------------------------------------


def corpus_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-ablation grid: the 2³ cross-tabulation of the three
    corpus filters applied INDEPENDENTLY (quality score ≥ 0.5, exact
    first-keeper dedup, length inside the raw [P5, P95] band), with
    doc/token mass per cell. `corpus_filter_funnel` shows the
    sequential survivor counts but hides attribution — a doc dropped
    at the quality stage never reaches the dedup stage, so the
    funnel cannot say whether relaxing one filter would recover
    anything (the overlap question every pipeline-tuning session
    asks: "is this filter doing unique work, or re-rejecting what
    another filter already catches?"). Each grid cell here is a
    disjoint population; cells with exactly one False column are the
    docs ONLY that filter rejects — its unique contribution — and
    the all-False cell is the triply-rejected core. Same
    score/hash/percentile definitions as the funnel, so the two
    tables reconcile.

    Unlike the funnel's conditional dedup flag (first-keeper among
    quality survivors), the dedup flag here is first-keeper over the
    WHOLE corpus — the independence the ablation needs.

    Scale design: one scan computes every per-doc flag (score,
    hash, tokens fused in one projection); the percentile bounds
    ride as a broadcast 1-row frame; the dedup-keeper window on the
    text hash is the single data-scale shuffle; the grid collapses
    map-side into ≤ 8 rows."""
    from datatransformertools_spark.functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    norm = normalize_text(F.col("text"))
    tok = tokens(norm)
    n_tokens = F.size(tok)
    uniq_ratio = F.when(n_tokens > 0, F.size(F.array_distinct(tok)) / n_tokens).otherwise(
        F.lit(0.0)
    )
    score = F.round(
        0.5 * uniq_ratio + 0.5 * F.least(F.col("n_chars") / F.lit(400.0), F.lit(1.0)) + 1e-9, 6
    )
    base = docs.select(
        "doc_id",
        "n_chars",
        F.md5(norm).alias("h"),
        n_tokens.alias("n_tok"),
        score.alias("q"),
    )
    bounds = docs.agg(
        F.round(F.expr(f"percentile(n_chars, {P_LO})") + 1e-9, 6).alias("p_lo"),
        F.round(F.expr(f"percentile(n_chars, {P_HI})") + 1e-9, 6).alias("p_hi"),
    )
    rn = F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
    flags = (
        base.withColumn("rn", rn)
        .crossJoin(F.broadcast(bounds))
        .select(
            (F.col("q") >= FUNNEL_QUALITY_MIN).cast("int").alias("pass_quality"),
            (F.col("rn") == 1).cast("int").alias("pass_dedup"),
            (
                (F.col("n_chars") >= F.col("p_lo")) & (F.col("n_chars") <= F.col("p_hi"))
            ).cast("int").alias("pass_length"),
            "n_tok",
        )
    )
    totals = Window.partitionBy()
    return (
        flags.groupBy("pass_quality", "pass_dedup", "pass_length")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tok").cast("long")).alias("n_tokens"),
        )
        .select(
            "pass_quality",
            "pass_dedup",
            "pass_length",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_docs") / F.sum("n_docs").over(totals) + 1e-9, 6).alias(
                "doc_share"
            ),
            F.round(F.col("n_tokens") / F.sum("n_tokens").over(totals) + 1e-9, 6).alias(
                "token_share"
            ),
        )
    )


CORPUS_FILTER_ABLATION_SQL = rf"""
WITH base AS (
  SELECT doc_id, n_chars,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h,
         len(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), '\s+')) AS n_tok,
         round(
           0.5 * (CASE WHEN len(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), '\s+')) > 0
                       THEN len(list_distinct(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), '\s+')))::DOUBLE
                            / len(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), '\s+'))
                       ELSE 0.0 END)
           + 0.5 * least(n_chars / 400.0, 1.0) + 1e-9, 6) AS q
  FROM documents
),
bounds AS (
  SELECT round(quantile_cont(n_chars, {P_LO}) + 1e-9, 6) AS p_lo,
         round(quantile_cont(n_chars, {P_HI}) + 1e-9, 6) AS p_hi
  FROM documents
),
keyed AS (
  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM base
),
flags AS (
  SELECT CAST(q >= {FUNNEL_QUALITY_MIN} AS INT) AS pass_quality,
         CAST(rn = 1 AS INT)                    AS pass_dedup,
         CAST(n_chars >= p_lo AND n_chars <= p_hi AS INT) AS pass_length,
         n_tok
  FROM keyed, bounds
)
SELECT pass_quality, pass_dedup, pass_length,
       CAST(count(*) AS BIGINT)    AS n_docs,
       CAST(sum(n_tok) AS BIGINT)  AS n_tokens,
       round(count(*) * 1.0 / sum(count(*)) OVER () + 1e-9, 6)      AS doc_share,
       round(sum(n_tok) * 1.0 / sum(sum(n_tok)) OVER () + 1e-9, 6)  AS token_share
FROM flags
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# doc_perplexity_buckets — CCNet-style per-source perplexity terciles
# ---------------------------------------------------------------------------

PPL_BUCKETS = 3


def doc_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359 §4.3): score every document with the
    corpus-trained unigram LM (mean −log p(token), the same signal
    `doc_unigram_logprob` emits per doc), split each source into
    PPL_BUCKETS quantile buckets (bucket 1 = head/most fluent …
    PPL_BUCKETS = tail), and report per-(source, bucket) document
    and token mass plus the score range — the table a pipeline uses
    to keep head+middle and drop (or down-weight) the tail per
    source, CCNet's central curation move.

    Plan shape: one vocabulary-scale token-count shuffle, the corpus
    total as a broadcast 1-row aggregate (house rule), the score
    join on the token key (vocab is corpus-scaled — never
    hint-broadcast), one per-doc aggregate, one |docs|-row window
    for the per-source ntile (partition key = source), and a final
    |sources|·PPL_BUCKETS-row aggregate. ntile ordering ties break
    on doc_id, so bucket assignment is deterministic cross-engine."""
    from datatransformertools_spark.functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tok = docs.select(
        "doc_id", "source", F.explode(tokens(normalize_text(F.col("text")))).alias("token")
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").cast("double").alias("total"))
    scored = (
        tok.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.avg(F.log(F.col("c") / F.col("total"))) + 1e-9, 6).alias("log_ppl"),
        )
    )
    w = Window.partitionBy("source").orderBy("log_ppl", "doc_id")
    return (
        scored.withColumn("bucket", F.ntile(PPL_BUCKETS).over(w))
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.avg("log_ppl") + 1e-9, 6).alias("avg_log_ppl"),
            F.round(F.min("log_ppl") + 1e-9, 6).alias("min_log_ppl"),
            F.round(F.max("log_ppl") + 1e-9, 6).alias("max_log_ppl"),
        )
    )


DOC_PERPLEXITY_BUCKETS_SQL = rf"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS token
  FROM documents
),
vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
total AS (SELECT sum(c)::DOUBLE AS total FROM vocab),
scored AS (
  SELECT doc_id, source,
         CAST(count(*) AS BIGINT) AS n_tokens,
         round(-avg(ln(c / total)) + 1e-9, 6) AS log_ppl
  FROM tok JOIN vocab USING (token) CROSS JOIN total
  GROUP BY doc_id, source
),
bucketed AS (
  SELECT *, ntile({PPL_BUCKETS}) OVER (PARTITION BY source ORDER BY log_ppl, doc_id) AS bucket
  FROM scored
)
SELECT source, CAST(bucket AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       round(avg(log_ppl) + 1e-9, 6) AS avg_log_ppl,
       round(min(log_ppl) + 1e-9, 6) AS min_log_ppl,
       round(max(log_ppl) + 1e-9, 6) AS max_log_ppl
FROM bucketed
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# quality_logreg_train — in-engine CCNet-style quality classifier
# ---------------------------------------------------------------------------

LOGREG_ITERS = 24
LOGREG_LR = 2.0
_LOGREG_FEATURES = ["bias", "n_words", "mean_word_len", "alpha_word_frac", "top_word_ratio"]


def _logreg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc (x1..x5, y) for the distillation task: the four
    Gopher rule INPUTS as standardized features ((x − mean)/std,
    zero-variance features pinned to 0 via a std floor, 6-dp-rounded
    so every GD round sees bit-identical features cross-engine) and
    the rule-cascade `keep` verdict as label. The 8 standardization
    scalars ride as a broadcast 1-row frame (house rule).

    Memoized per (session, sf_dir) — r13: the GD training loop, the
    train query's accuracy aggregate, and the score query each
    rebuilt the full Gopher chain (tokenize + word stats over every
    document); one persisted build now serves all three — the
    feature stage table a distillation pipeline writes once per
    corpus (the _FrameMemo contract; cleared by clear_dedup_memos)."""
    return _FEATS_MEMO.get_or_build(
        spark, sf_dir, lambda: _logreg_features_build(spark, sf_dir)
    )


def _logreg_features_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = gopher_quality_filter(spark, sf_dir).select(
        "doc_id",
        F.col("n_words").cast("double").alias("f1"),
        F.col("mean_word_len").alias("f2"),
        F.col("alpha_word_frac").alias("f3"),
        F.col("top_word_ratio").alias("f4"),
        F.col("keep").cast("double").alias("y"),
    )
    # zero-variance features (possible on a synthetic corpus, e.g. a
    # rule input that is constant) get std pinned to 1.0 AFTER the
    # 6-dp rounding — their standardized value is exactly 0 and the
    # GD never moves their weight.
    def _std(i: int):
        s = F.round(F.stddev_pop(f"f{i}") + 1e-9, 6)
        return F.when(s < 1e-6, F.lit(1.0)).otherwise(s).alias(f"s{i}")

    stats = g.agg(
        *[F.round(F.avg(f"f{i}") + 1e-9, 6).alias(f"m{i}") for i in range(1, 5)],
        *[_std(i) for i in range(1, 5)],
    )
    return g.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        F.lit(1.0).alias("x1"),
        *[
            F.round((F.col(f"f{i}") - F.col(f"m{i}")) / F.col(f"s{i}") + 1e-9, 6).alias(
                f"x{i + 1}"
            )
            for i in range(1, 5)
        ],
        "y",
    )


def quality_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distill the Gopher rule cascade into a linear quality scorer
    — the classifier move of CCNet/fastText quality filtering
    (Wenzek et al. 2020 §4.3), with the engine's own
    `gopher_quality_filter` verdict as the teacher: logistic
    regression by LOGREG_ITERS rounds of full-batch gradient
    descent over the standardized rule inputs. The payoff at 100 TB
    is a CONTINUOUS quality score (one dot product per doc, fit for
    ranking/thresholding at any retention budget) distilled from a
    binary rule cascade, plus `train_acc` — the distillation
    fidelity (0.97 on this corpus vs 0.55 base rate) a pipeline
    checks before trusting the scorer.

    Scale shape: each GD round is ONE map-side-combined aggregate —
    the 5 gradient components sum partially per partition before a
    single-row shuffle — and only that 1×5 gradient row crosses the
    driver (the kmeans/PageRank scalar-state pattern), so a round
    costs one scan of the persisted feature frame regardless of
    cluster size. Weights are 6-dp-quantized every round in BOTH
    engines, so float summation order cannot compound across
    iterations."""
    wts = _trained_weights(spark, sf_dir)
    n_feat = len(_LOGREG_FEATURES)
    feats = _logreg_features(spark, sf_dir)
    z = _dot(wts)
    pred = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) >= 0.5).cast("double")
    acc = feats.agg(
        F.round(F.avg((pred == F.col("y")).cast("double")) + 1e-9, 6).alias("v")
    )
    rows = [(i, _LOGREG_FEATURES[i], float(wts[i])) for i in range(n_feat)]
    wdf = spark.createDataFrame(rows, "feature_idx int, feature string, value double")
    accdf = acc.select(
        F.lit(n_feat).alias("feature_idx"),
        F.lit("train_acc").alias("feature"),
        F.col("v").alias("value"),
    )
    return wdf.unionByName(accdf)


def _dot(wts: list[float]) -> F.Column:
    return sum(
        (F.lit(wts[i]) * F.col(f"x{i + 1}") for i in range(len(wts))), F.lit(0.0)
    )


# GD is deterministic (fixed init, 6-dp weight quantization per
# round), so the trained weights are memoized per sf_dir — the
# train and score queries share one run per session (same pattern
# and same contract as similarity.trained_centroids: sf_dir
# contents are immutable for the process lifetime).
_W_MEMO: dict[str, list[float]] = {}


def _trained_weights(spark: SparkSession, sf_dir: str) -> list[float]:
    if sf_dir not in _W_MEMO:
        n_feat = len(_LOGREG_FEATURES)
        # the memoized feature frame is already persisted (r13); the
        # loop's 24 rounds and the train/score consumers share it
        feats = _logreg_features(spark, sf_dir)
        wts = [0.0] * n_feat
        xs = [F.col(f"x{i + 1}") for i in range(n_feat)]
        for _ in range(LOGREG_ITERS):
            z = _dot(wts)
            err = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
            g = feats.agg(
                *[F.avg(err * xs[i]).alias(f"g{i + 1}") for i in range(n_feat)]
            ).collect()[0]
            wts = [
                round(wts[i] - LOGREG_LR * g[f"g{i + 1}"] + 1e-9, 6)
                for i in range(n_feat)
            ]
        _W_MEMO[sf_dir] = wts
    return _W_MEMO[sf_dir]


def _logreg_chain_parts() -> list[str]:
    """Shared oracle CTE chain for the distillation family: unrolled
    GD as chained 1-row CTEs — same init, same 6-dp weight/feature
    quantization as the Spark loop — ending with the final weights
    CTE w{LOGREG_ITERS}. Both the train and score oracles compose
    from this parts list (never by splitting rendered SQL on a
    textual marker). The feature frame is MATERIALIZED (DuckDB
    would otherwise re-evaluate the whole Gopher chain once per
    gradient round — the Spark side persists the same frame)."""
    n_feat = len(_LOGREG_FEATURES)
    means = ", ".join(f"round(avg(f{i}) + 1e-9, 6) AS m{i}" for i in range(1, 5))
    stds = ", ".join(
        f"CASE WHEN round(stddev_pop(f{i}) + 1e-9, 6) < 1e-6 THEN 1.0"
        f" ELSE round(stddev_pop(f{i}) + 1e-9, 6) END AS s{i}"
        for i in range(1, 5)
    )
    std_feats = ", ".join(
        f"round((f{i} - m{i}) / s{i} + 1e-9, 6) AS x{i + 1}" for i in range(1, 5)
    )
    parts = [
        f"""gq AS MATERIALIZED (
  SELECT doc_id, n_words::DOUBLE AS f1, mean_word_len AS f2,
         alpha_word_frac AS f3, top_word_ratio AS f4, keep::DOUBLE AS y
  FROM ({GOPHER_QUALITY_FILTER_SQL}) g
)""",
        f"stats AS (SELECT {means}, {stds} FROM gq)",
        f"""feats AS MATERIALIZED (
  SELECT doc_id, 1.0 AS x1, {std_feats}, y
  FROM gq CROSS JOIN stats
)""",
        "w0 AS (SELECT " + ", ".join(f"0.0 AS w{i + 1}" for i in range(n_feat)) + ")",
    ]
    for k in range(1, LOGREG_ITERS + 1):
        z = " + ".join(f"w.w{i + 1} * f.x{i + 1}" for i in range(n_feat))
        grads = ", ".join(
            f"avg((1.0 / (1.0 + exp(-({z}))) - f.y) * f.x{i + 1}) AS g{i + 1}"
            for i in range(n_feat)
        )
        # MATERIALIZED: the 1-row weight/gradient frames are each
        # referenced twice; inlined they double the expression tree
        # per round (2^T blowup in the planner).
        parts.append(f"g{k} AS MATERIALIZED (SELECT {grads} FROM feats f CROSS JOIN w{k - 1} w)")
        ws = ", ".join(
            f"round(w.w{i + 1} - {LOGREG_LR} * g.g{i + 1} + 1e-9, 6) AS w{i + 1}"
            for i in range(n_feat)
        )
        parts.append(f"w{k} AS MATERIALIZED (SELECT {ws} FROM w{k - 1} w CROSS JOIN g{k} g)")
    return parts


_LOGREG_ZF_SQL = " + ".join(
    f"w.w{i + 1} * f.x{i + 1}" for i in range(len(_LOGREG_FEATURES))
)


def _logreg_sql() -> str:
    n_feat = len(_LOGREG_FEATURES)
    zf = _LOGREG_ZF_SQL
    feat_rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS feature_idx, '{_LOGREG_FEATURES[i]}' AS feature,"
        f" (SELECT w{i + 1} FROM w{LOGREG_ITERS}) AS value"
        for i in range(n_feat)
    )
    return (
        "WITH " + ",\n".join(_logreg_chain_parts()) + f""",
acc AS (
  SELECT round(avg(CASE WHEN (CASE WHEN 1.0 / (1.0 + exp(-({zf}))) >= 0.5
                               THEN 1.0 ELSE 0.0 END) = f.y
                        THEN 1.0 ELSE 0.0 END) + 1e-9, 6) AS v
  FROM feats f CROSS JOIN w{LOGREG_ITERS} w
)
{feat_rows}
UNION ALL
SELECT {n_feat} AS feature_idx, 'train_acc' AS feature, (SELECT v FROM acc) AS value
"""
    )


QUALITY_LOGREG_TRAIN_SQL = _logreg_sql()


SCORE_DECILES = 10


def quality_logreg_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the distillation loop: score every document with the
    trained linear scorer (one dot product + sigmoid, 6-dp-rounded)
    and report the per-source decile table — for each (source,
    decile by score, best first) the doc count, score range, and
    the TEACHER's keep-rate (`gopher_quality_filter`). A faithful
    distilled scorer shows keep-rate falling monotonically across
    deciles; this is the calibration exhibit a pipeline inspects
    before replacing the cascade with a score threshold.

    Deciles are per SOURCE (ntile over a source-partitioned window,
    doc_id tie-breaks) — a global ntile would funnel every doc
    through one partition at 100 TB; per-source windows shard by the
    partition key, and the stratified view is the operationally
    useful one anyway."""
    wts = _trained_weights(spark, sf_dir)
    feats = _logreg_features(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_dot(wts))) + 1e-9, 6)
    scored = feats.join(docs, "doc_id").select("doc_id", "source", "y", score.alias("score"))
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("decile", F.ntile(SCORE_DECILES).over(w))
        .groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("score") + 1e-9, 6).alias("min_score"),
            F.round(F.max("score") + 1e-9, 6).alias("max_score"),
            F.round(F.avg("y") + 1e-9, 6).alias("rule_keep_rate"),
        )
    )


def _logreg_score_sql() -> str:
    # same training chain, score/decile tail instead of accuracy
    zf = _LOGREG_ZF_SQL
    return (
        "WITH " + ",\n".join(_logreg_chain_parts())
        + f""",
sc AS (
  SELECT f.doc_id, f.y,
         round(1.0 / (1.0 + exp(-({zf}))) + 1e-9, 6) AS score
  FROM feats f CROSS JOIN w{LOGREG_ITERS} w
),
dd AS (
  SELECT d.source, sc.y, sc.score,
         ntile({SCORE_DECILES}) OVER (PARTITION BY d.source
                                      ORDER BY sc.score DESC, sc.doc_id) AS decile
  FROM sc JOIN documents d ON sc.doc_id = d.doc_id
)
SELECT source, CAST(decile AS INTEGER) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(min(score) + 1e-9, 6) AS min_score,
       round(max(score) + 1e-9, 6) AS max_score,
       round(avg(y) + 1e-9, 6) AS rule_keep_rate
FROM dd
GROUP BY 1, 2
"""
    )


QUALITY_LOGREG_SCORE_SQL = _logreg_score_sql()


# ---------------------------------------------------------------------------
# source_length_ks — exact Kolmogorov-Smirnov drift test per source
# ---------------------------------------------------------------------------


def source_length_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per source:
    sup_x |CDF_source(x) − CDF_rest(x)| over the document length
    distribution — the distribution-shape drift audit that catches
    what `events_drift_psi`-style binned tests smooth away (a
    source whose lengths cluster at one value moves KS to ~1 while
    barely moving a 10-bin PSI). The same shape works for any
    numeric doc feature; length is the canonical first screen
    (truncated crawls, boilerplate farms, chopped documents).

    Scale: both CDFs are step functions that only change at observed
    values, so the sup is EXACT when evaluated on the distinct-value
    grid. The grid is |sources| × |distinct lengths| rows (feature
    cardinality, not corpus size); cumulative sums run in windows
    PARTITIONED BY SOURCE (parallel — never a global unpartitioned
    sort); per-(source, x) counts map-side combine before the one
    shuffle. The small sources frame broadcasts into the grid
    cross-join (house rule)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    per_sx = docs.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("n_sx"))
    per_x = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("n_x"))
    per_s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    total = docs.agg(F.count(F.lit(1)).alias("n"))
    grid = (
        per_x.crossJoin(F.broadcast(per_s.select("source")))
        .join(per_sx, ["source", "n_chars"], "left")
        .select("source", "n_chars", "n_x", F.coalesce("n_sx", F.lit(0)).alias("n_sx"))
    )
    w = Window.partitionBy("source").orderBy("n_chars")
    cum = grid.select(
        "source",
        "n_chars",
        F.sum("n_sx").over(w).alias("cum_s"),
        F.sum("n_x").over(w).alias("cum_all"),
    )
    diff = (
        cum.join(F.broadcast(per_s), "source")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_s",
            F.abs(
                F.col("cum_s") / F.col("n_s")
                - (F.col("cum_all") - F.col("cum_s"))
                / F.nullif(F.col("n") - F.col("n_s"), F.lit(0))
            ).alias("d"),
        )
    )
    return diff.groupBy("source").agg(
        F.first("n_s").alias("n_docs"),
        F.round(F.max("d") + 1e-9, 6).alias("ks_stat"),
    )


SOURCE_LENGTH_KS_SQL = """
WITH per_sx AS (SELECT source, n_chars, count(*) AS n_sx FROM documents GROUP BY 1, 2),
per_x AS (SELECT n_chars, count(*) AS n_x FROM documents GROUP BY 1),
per_s AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
grid AS (
  SELECT s.source, x.n_chars, x.n_x, COALESCE(sx.n_sx, 0) AS n_sx
  FROM per_x x CROSS JOIN (SELECT source FROM per_s) s
  LEFT JOIN per_sx sx ON sx.source = s.source AND sx.n_chars = x.n_chars
),
cum AS (
  SELECT source, n_chars,
         sum(n_sx) OVER (PARTITION BY source ORDER BY n_chars) AS cum_s,
         sum(n_x) OVER (PARTITION BY source ORDER BY n_chars) AS cum_all
  FROM grid
),
diff AS (
  SELECT c.source, p.n_s,
         abs(c.cum_s::DOUBLE / p.n_s
             - (c.cum_all - c.cum_s)::DOUBLE / nullif(n.n - p.n_s, 0)) AS d
  FROM cum c JOIN per_s p USING (source) CROSS JOIN n
)
SELECT source,
       CAST(any_value(n_s) AS BIGINT) AS n_docs,
       round(max(d) + 1e-9, 6) AS ks_stat
FROM diff GROUP BY 1
"""


# ---------------------------------------------------------------------------
# dup_quality_interaction — duplication exposure × rule-cascade keep rate
# ---------------------------------------------------------------------------

DUP_BANDS = 4  # quarter-width dup_frac bands; -1 = no shingles (<3 tokens)


def dup_quality_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do duplicated documents fail quality anyway? Cross the
    per-doc duplication exposure (`doc_duplication_score`'s
    dup_frac — the fraction of a doc's shingles shared with any
    other doc) with the Gopher rule-cascade verdict, banded into
    quarter-width dup_frac bands (band -1 = docs too short to
    shingle). Per band: doc count, keep rate, mean dup_frac, and
    mean word count. Lee et al. (2022, arXiv:2107.06499 §5) observe
    dedup and quality filters remove substantially overlapping
    mass; this table measures that overlap on THIS corpus, so a
    pipeline knows whether running the expensive pair-level dedup
    before or after the cheap rule cascade changes the surviving
    token mass (high keep-rate in the top band ⇒ dedup removes
    docs quality would have kept ⇒ order matters).

    Scale design: both inputs are per-doc aggregate frames keyed on
    doc_id (duplication exposure off the memoized shingle stage;
    the rule cascade one token-census shuffle); one doc_id-keyed
    left join, then a map-side banding and a ≤5-row aggregate. The
    band boundary reads the 6-dp-rounded dup_frac both engines
    already agree on, so banding is deterministic cross-engine."""
    from datatransformertools_spark.operators.dedup import doc_duplication_score

    gq = gopher_quality_filter(spark, sf_dir).select("doc_id", "n_words", "keep")
    dup = doc_duplication_score(spark, sf_dir).select("doc_id", "dup_frac")
    j = gq.join(dup, "doc_id", "left")
    band = (
        F.when(F.col("dup_frac").isNull(), F.lit(-1))
        .otherwise(F.least(F.floor(F.col("dup_frac") * DUP_BANDS), F.lit(DUP_BANDS - 1)))
        .cast("int")
    )
    return (
        j.withColumn("dup_band", band)
        .groupBy("dup_band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("keep") + 1e-9, 6).alias("keep_rate"),
            F.round(F.avg("dup_frac") + 1e-9, 6).alias("mean_dup_frac"),
            F.round(F.avg("n_words") + 1e-9, 6).alias("mean_n_words"),
        )
    )


def _dup_quality_interaction_sql() -> str:
    from datatransformertools_spark.operators.dedup import DOC_DUPLICATION_SCORE_SQL

    return f"""
WITH dup AS ({DOC_DUPLICATION_SCORE_SQL}),
gq AS ({GOPHER_QUALITY_FILTER_SQL}),
j AS (
  SELECT gq.doc_id, gq.n_words, gq.keep, dup.dup_frac,
         CASE WHEN dup.doc_id IS NULL THEN CAST(-1 AS INT)
              ELSE CAST(least(floor(dup.dup_frac * {DUP_BANDS}), {DUP_BANDS - 1}) AS INT)
         END AS dup_band
  FROM gq LEFT JOIN dup ON gq.doc_id = dup.doc_id
)
SELECT dup_band,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(keep) + 1e-9, 6) AS keep_rate,
       round(avg(dup_frac) + 1e-9, 6) AS mean_dup_frac,
       round(avg(n_words) + 1e-9, 6) AS mean_n_words
FROM j GROUP BY 1
"""


DUP_QUALITY_INTERACTION_SQL = _dup_quality_interaction_sql()


QUERIES = {
    "gopher_quality_filter": (gopher_quality_filter, GOPHER_QUALITY_FILTER_SQL),
    "source_length_ks": (source_length_ks, SOURCE_LENGTH_KS_SQL),
    "doc_perplexity_buckets": (doc_perplexity_buckets, DOC_PERPLEXITY_BUCKETS_SQL),
    "quality_logreg_train": (quality_logreg_train, QUALITY_LOGREG_TRAIN_SQL),
    "quality_logreg_score": (quality_logreg_score, QUALITY_LOGREG_SCORE_SQL),
    "corpus_filter_funnel": (corpus_filter_funnel, CORPUS_FILTER_FUNNEL_SQL),
    "corpus_filter_ablation": (corpus_filter_ablation, CORPUS_FILTER_ABLATION_SQL),
    "doc_length_percentile_filter": (
        doc_length_percentile_filter,
        DOC_LENGTH_PERCENTILE_FILTER_SQL,
    ),
    "word_zipf_slope": (word_zipf_slope, WORD_ZIPF_SLOPE_SQL),
    "dup_quality_interaction": (dup_quality_interaction, DUP_QUALITY_INTERACTION_SQL),
}
