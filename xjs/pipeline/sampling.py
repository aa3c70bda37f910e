"""Deterministic sampling for training-data curation.

Training-mix construction needs *reproducible* samples: the same
corpus snapshot must yield the same subset on every run, regardless of
partitioning, so downstream dedup/eval splits stay stable.  Spark's
``df.sample`` is seed-stable only per-partitioning; these operators
derive keep-decisions from a portable hash of the row's own id
(``xjs.pipeline.hashing``), so the result is a pure function of the
data and every query has an exact DuckDB oracle.

Scale shapes (the 100 TB story):

- ``hash_sample`` is a narrow filter fused into the parquet scan —
  zero shuffle, trivially parallel at any cluster size.
- ``stratified_quota`` (fixed-size per-group sample, e.g. "at most N
  docs per language/domain") is a per-group top-``quota`` by hash
  order.  A single ``row_number() OVER (PARTITION BY group)`` would
  re-concentrate a dominant group (English is ~half the web) on one
  reducer, so it uses the same two-stage salted cap as
  ``xjs.checks.uniqueness.duplicate_key_evidence``: stage 1 ranks
  within (group, salt) and keeps ``quota`` rows per bucket — every
  global top-``quota`` row survives its bucket's cap — stage 2 ranks
  the bounded ``quota * n_salts`` survivors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from xjs.pipeline.hashing import rehash, rehash_sql


def id_hash(col: Column, k: int = 0) -> Column:
    """Portable deterministic hash of an integer id column."""
    return rehash(col.cast("long"), k)


def id_hash_sql(expr: str, k: int = 0) -> str:
    return rehash_sql(expr, k)


def hash_sample(
    df: DataFrame, id_col: str, keep_num: int, keep_den: int, k: int = 0
) -> DataFrame:
    """Deterministic Bernoulli(keep_num/keep_den) sample: keep rows
    whose id-hash bucket falls below the threshold.  Narrow — no
    shuffle, no state; at scale this fuses into the scan and combines
    with predicate pushdown on other filters."""
    return df.filter(F.pmod(id_hash(F.col(id_col), k), F.lit(keep_den)) < keep_num)


def stratified_quota(
    df: DataFrame,
    group_col: str,
    id_col: str,
    quota: int,
    n_salts: int = 16,
    k: int = 0,
) -> DataFrame:
    """At most ``quota`` rows per group, chosen by hash order (a
    deterministic shuffle of each group).  Appends ``sample_rank``
    (1-based position within the group's sample).

    Two-stage skew-safe: no reducer ever holds more than
    ``~rows(group)/n_salts`` of a hot group in stage 1, and stage 2
    ranks at most ``quota * n_salts`` rows per group.
    """
    h = id_hash(F.col(id_col), k).alias("_h")
    salted = df.select("*", h).withColumn(
        "_salt", F.pmod(F.col("_h"), F.lit(n_salts))
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy("_h", id_col)
    capped = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= quota)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy(group_col).orderBy("_h", id_col)
    return (
        capped.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= quota)
        .drop("_h")
    )


# ---------------------------------------------------------------------------
# driver queries + oracles
# ---------------------------------------------------------------------------

BERNOULLI_NUM = 3
BERNOULLI_DEN = 10
QUOTA = 40


def q_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return hash_sample(d, "doc_id", BERNOULLI_NUM, BERNOULLI_DEN).select(
        "doc_id", "lang", "source"
    )


def oracle_sample_bernoulli_sql() -> str:
    h = id_hash_sql("doc_id")
    return f"""
SELECT doc_id, lang, source FROM documents
WHERE ({h}) % {BERNOULLI_DEN} < {BERNOULLI_NUM}
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    return stratified_quota(d, "lang", "doc_id", QUOTA)


def oracle_sample_stratified_sql() -> str:
    h = id_hash_sql("doc_id")
    return f"""
WITH ranked AS (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ({h}), doc_id)
               AS sample_rank
    FROM documents
)
SELECT doc_id, lang, sample_rank FROM ranked WHERE sample_rank <= {QUOTA}
"""


# ---------------------------------------------------------------------------
# weighted sampling
# ---------------------------------------------------------------------------

WEIGHT_BASIS = 10_000  # weight resolution (basis points of keep probability)
MIX = 2_654_435_761    # Knuth multiplicative constant: scatters small ids


def _uniform_bp(col: Column, k: int = 0) -> Column:
    """Pseudo-uniform variate in [0, WEIGHT_BASIS): the affine id_hash
    is nearly linear for small dense ids (fine for the coarse
    Bernoulli buckets, useless at basis-point resolution), so mix it
    multiplicatively before reducing."""
    return F.pmod((id_hash(col, k) * MIX) % 1_000_000_007, F.lit(WEIGHT_BASIS))


def _uniform_bp_sql(expr: str, k: int = 0) -> str:
    return f"((({id_hash_sql(expr, k)}) * {MIX}) % 1000000007) % {WEIGHT_BASIS}"


def weighted_sample(df: DataFrame, id_col: str, weight: Column, k: int = 0) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep a row with
    probability ``weight`` (in [0,1]) — quality-proportional corpus
    selection ("sample good documents more").  The id-hash plays the
    uniform variate, so the decision is reproducible, partitioning-
    invariant, and narrow (fuses into the scan, like hash_sample).
    The weight is quantized to 1/WEIGHT_BASIS so the threshold compare
    is integer-exact across engines."""
    thresh = F.round(weight * WEIGHT_BASIS).cast("long")
    return df.filter(_uniform_bp(F.col(id_col), k) < thresh)


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xjs.pipeline.text import quality_score

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = quality_score(F.col("text"))
    return weighted_sample(d, "doc_id", w).select(
        "doc_id", "lang", w.alias("weight")
    )


def oracle_sample_weighted_sql() -> str:
    from xjs.pipeline.text import quality_score_sql

    q = quality_score_sql("text")
    return f"""
SELECT doc_id, lang, {q} AS weight FROM documents
WHERE ({_uniform_bp_sql("doc_id")}) < CAST(round(({q}) * {WEIGHT_BASIS}) AS BIGINT)
"""


# ---------------------------------------------------------------------------
# exact fixed-size global sample (the reservoir-sample slot)
# ---------------------------------------------------------------------------

FIXED_K = 100
_FIXED_SEED = "fixedk"


def _md5_variate(col: Column, seed: str) -> Column:
    """60-bit md5 variate (the mixture/export arithmetic, bit-exact in
    DuckDB).  Hashed — not id-affine — so id-structured corpora can't
    bias the sample (the ccnet sample-selector lesson)."""
    key = F.md5(F.concat(col.cast("string"), F.lit(f"#{seed}")))
    return F.conv(F.substring(key, 1, 15), 16, 10).cast("long")


def _md5_variate_sql(expr: str, seed: str) -> str:
    return f"('0x' || substr(md5({expr}::VARCHAR || '#{seed}'), 1, 15))::BIGINT"


def fixed_k_sample(
    df: DataFrame, id_col: str, k: int = FIXED_K, seed: str = _FIXED_SEED
) -> DataFrame:
    """EXACTLY min(k, N) rows, uniform without replacement,
    deterministic and partitioning-invariant: the k smallest md5
    variates.  Appends ``sample_rank`` (1-based by variate).

    This replaces driver-side reservoir sampling at scale: ``orderBy
    LIMIT k`` compiles to TakeOrderedAndProject — each task keeps a
    local k-heap and only the bounded partials merge (plan-asserted
    in tests) — so the corpus is scanned once and NOTHING is globally
    sorted or shuffled.  The same-snapshot-same-sample property the
    module contract demands falls out of the variate being a pure
    function of the id."""
    v = _md5_variate(F.col(id_col), seed)
    top = df.withColumn("_v", v).orderBy("_v", id_col).limit(k)
    w = Window.orderBy("_v", id_col)  # k rows, one bounded partition
    return top.withColumn("sample_rank", F.row_number().over(w)).drop("_v")


def q_sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang")
    return fixed_k_sample(d, "doc_id", FIXED_K)


def oracle_sample_fixed_k_sql() -> str:
    return f"""
SELECT doc_id, lang,
       ROW_NUMBER() OVER (
           ORDER BY {_md5_variate_sql("doc_id", _FIXED_SEED)}, doc_id
       ) AS sample_rank
FROM documents
ORDER BY {_md5_variate_sql("doc_id", _FIXED_SEED)}, doc_id
LIMIT {FIXED_K}
"""
