"""Uniqueness-of-key with explicit skew defusal (north_star class).

At 10^12 rows a ``groupBy(url)`` shuffles on a Zipfian key.  For pure
counting, Spark's partial aggregation already combines map-side, but
any per-key state beyond a counter (example rows, first/last ts)
re-concentrates hot keys on one reducer.  The two-stage *salted*
aggregation below bounds any single reducer's share of a hot key to
1/S regardless of what is aggregated:

    stage 1: groupBy(key, salt)  ->  partial per-(key,salt) state
    stage 2: groupBy(key)        ->  merge the S partials

Salt is derived from a per-row value (``monotonically_increasing_id``)
so identical keys spread across S buckets; the final result is
salt-invariant, so determinism is preserved.  AQE's skew handling
(``spark.sql.adaptive...skewJoin``) is the fallback when salting is
off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key: str, n_salts: int = 64, min_count: int = 2) -> DataFrame:
    """(key, n_rows) for every key appearing >= min_count times."""
    salted = df.select(
        F.col(key),
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).alias("_salt"),
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_c"),
    )
    return (
        partial.groupBy(key)
        .agg(F.sum("_c").alias("n_rows"))
        .filter(F.col("n_rows") >= min_count)
    )


def duplicate_url_sample(df: DataFrame, key: str = "url", n_salts: int = 64) -> DataFrame:
    """Duplicates with per-key evidence (min/max partition seen) — the
    case where salting actually matters: the merged state is more than
    a counter but stays bounded per salt bucket."""
    salted = df.select(
        F.col(key),
        F.col("partition_id"),
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).alias("_salt"),
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_c"),
        F.min("partition_id").alias("_minp"),
        F.max("partition_id").alias("_maxp"),
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("_c").alias("n_rows"),
            F.min("_minp").alias("first_partition"),
            F.max("_maxp").alias("last_partition"),
        )
        .filter(F.col("n_rows") >= 2)
    )


def _evidence_stage1(
    df: DataFrame, key: str, order_col: str, per_key: int, n_salts: int
) -> DataFrame:
    """Stage 1 of the two-stage evidence cap: keep the first
    ``per_key`` rows per (key, salt) bucket.  The salt is derived from
    the row's own order value (deterministic across runs), so a hot
    key's rows spread over ``n_salts`` window partitions and no single
    reducer ever materializes more than ~rows/n_salts of it."""
    from pyspark.sql.window import Window

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_salts))
    )
    w1 = Window.partitionBy(key, "_salt").orderBy(order_col)
    return (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= per_key)
        .drop("_rn1")
    )


def duplicate_key_evidence(
    df: DataFrame, key: str, order_col: str, per_key: int = 3, n_salts: int = 64
) -> DataFrame:
    """north_star: "violations join back to sample offending rows" —
    each duplicated key joined back to its first ``per_key`` rows.

    Two-stage cap (round-1 verdict: a single
    ``Window.partitionBy(key)`` re-concentrates a million-copy hot key
    on one reducer BEFORE the rn <= per_key filter).  Stage 1 caps per
    (key, salt) — every global top-``per_key`` row is also in its salt
    bucket's top-``per_key``, so no wanted row is lost; stage 2 ranks
    the <= per_key * n_salts survivors per key, which is bounded
    regardless of the key's true row count."""
    from pyspark.sql.window import Window

    dups = duplicate_keys(df, key, n_salts=n_salts)
    capped = _evidence_stage1(df.join(dups, key), key, order_col, per_key, n_salts)
    w2 = Window.partitionBy(key).orderBy(order_col)
    return (
        capped.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= per_key)
        .select(key, "n_rows", order_col, "partition_id")
    )


def webpages_duplicate_evidence(spark, sf_dir: str) -> DataFrame:
    from xjs.sources.webpages import webpages

    return duplicate_key_evidence(webpages(spark, sf_dir), "url", "doc_id")


def oracle_duplicate_evidence_sql(cte: str) -> str:
    return """
WITH {cte},
dups AS (
    SELECT url, COUNT(*) AS n_rows FROM webpages GROUP BY url HAVING COUNT(*) >= 2
),
ev AS (
    SELECT w.url, d.n_rows, w.doc_id, w.partition_id,
           ROW_NUMBER() OVER (PARTITION BY w.url ORDER BY w.doc_id) AS rn
    FROM webpages w JOIN dups d ON w.url = d.url
)
SELECT url, n_rows, doc_id, partition_id FROM ev WHERE rn <= 3
""".format(cte=cte)


def webpages_duplicate_urls(spark, sf_dir: str) -> DataFrame:
    from xjs.sources.webpages import webpages

    return duplicate_url_sample(webpages(spark, sf_dir), "url")


def oracle_duplicate_urls_sql(cte: str) -> str:
    return f"""
WITH {cte}
SELECT url, COUNT(*) AS n_rows,
       MIN(partition_id) AS first_partition,
       MAX(partition_id) AS last_partition
FROM webpages
GROUP BY url
HAVING COUNT(*) >= 2
"""
