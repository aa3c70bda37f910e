"""Reporting queries over validation output: top-k worst offenders
(orderBy + limit) and verdict rollups (grouping sets) — SURVEY.md §2.9
rows "Top-k / sort / limit" and "Grouping sets / cube / rollup".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xjs.flagship import compile_plan
from xjs.runtime import verdicts, violations
from xjs.sources.webpages import webpages

TOP_K = 20


def worst_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k urls by violation count (deterministic tiebreak on url).
    At scale: the groupBy shuffles only violating urls (a small
    fraction), and the top-k is a TakeOrdered — no global sort."""
    wp = webpages(spark, sf_dir)
    v = violations(wp, compile_plan(wp))
    return (
        v.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .orderBy(F.desc("n_violations"), F.asc("id"))
        .limit(TOP_K)
    )


def oracle_worst_urls_sql(violations_sql: str) -> str:
    return f"""
WITH v AS ({violations_sql})
SELECT id, COUNT(*) AS n_violations
FROM v GROUP BY id
ORDER BY n_violations DESC, id ASC
LIMIT {TOP_K}
"""


TOP_PER_GROUP = 3


def worst_urls_per_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k offenders *per domain* (window rank, not a global sort):
    the per-group analog of ``worst_urls``.  At scale the rank window
    shuffles only aggregated (url, count) rows — one row per violating
    url — and each domain's partition is bounded by its violating-url
    count, not its page count."""
    from xjs.checks.referential import domain_of
    from pyspark.sql.window import Window

    wp = webpages(spark, sf_dir)
    v = violations(wp, compile_plan(wp))
    counts = (
        v.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .withColumn("domain", domain_of(F.col("id")))
    )
    w = Window.partitionBy("domain").orderBy(F.desc("n_violations"), F.asc("id"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_PER_GROUP)
        .select("domain", "id", "n_violations", "rank")
    )


def oracle_worst_urls_per_domain_sql(violations_sql: str) -> str:
    return f"""
WITH v AS ({violations_sql}),
counts AS (
    SELECT id, COUNT(*) AS n_violations,
           regexp_extract(id, '^(?:[a-zA-Z][a-zA-Z0-9.+-]*://)?([^/]+)', 1) AS domain
    FROM v GROUP BY id
),
ranked AS (
    SELECT domain, id, n_violations,
           ROW_NUMBER() OVER (PARTITION BY domain
                              ORDER BY n_violations DESC, id ASC) AS rank
    FROM counts
)
SELECT domain, id, n_violations, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TOP_PER_GROUP}
"""


def verdict_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation totals at (partition, check), (partition) and ()
    grain via ROLLUP — the roll-up verdict report.  Null grouping
    columns are labeled 'ALL' so the output is stable for hashing."""
    wp = webpages(spark, sf_dir)
    vd = verdicts(wp, compile_plan(wp))
    rolled = vd.rollup("partition_id", "check_name").agg(
        F.sum("n_violations").alias("n_violations"),
        F.sum("n_checked").alias("n_checked"),
    )
    return rolled.select(
        F.coalesce(F.col("partition_id").cast("string"), F.lit("ALL")).alias("partition"),
        F.coalesce(F.col("check_name"), F.lit("ALL")).alias("check_name"),
        "n_violations",
        "n_checked",
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup (orders ⋈ customer ⋈ nation): the classic
    OLAP join chain with both dimensions explicitly broadcast — the
    fact table never shuffles for the joins, only for the final
    aggregate (which partial-aggregates map-side on ~25 nation keys)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # decimal accumulation: double SUM is ordering-dependent and
            # partition order differs between engines; decimal is exact
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


ORACLE_REVENUE_BY_NATION_SQL = """
SELECT n_name, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-way join chain (orders ⋈ customer ⋈ nation ⋈ region):
    the dimension chain collapses to nested broadcasts — nation⋈region
    resolves executor-side first (both broadcast), then customer maps
    orders to the pre-joined geography.  The fact table still never
    shuffles until the final 5-key aggregate."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    geo = (
        customer.select("c_custkey", "c_nationkey")
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "r_name")
    )
    return (
        orders.join(F.broadcast(geo), orders["o_custkey"] == F.col("c_custkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


ORACLE_REVENUE_BY_REGION_SQL = """
SELECT r_name, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


SEGMENT = "BUILDING"


def top_orders_in_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: dimension-filtered fact top-k.  The segment
    filter prunes the customer dim BEFORE the broadcast (ship the
    filtered dim, not the full one), and the top-k is a TakeOrdered —
    per-partition heaps + one k-row merge, never a global sort."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    seg = customer.where(F.col("c_mktsegment") == SEGMENT).select("c_custkey")
    return (
        orders.join(F.broadcast(seg), orders["o_custkey"] == F.col("c_custkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(TOP_K)
    )


ORACLE_TOP_ORDERS_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{SEGMENT}'
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT {TOP_K}
"""


PRICING_CUTOFF = "1998-09-01"


def lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan-filter + one groupBy on a
    2-value key pair — the canonical partial-aggregation workload (map
    side collapses 10^12 rows to 4 groups per task before the
    shuffle).  All money math in decimal: double accumulation is
    ordering-dependent and would flake the cross-engine hash."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    disc = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    return (
        li.where(F.col("l_shipdate").cast("date") <= F.lit(PRICING_CUTOFF).cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .withColumn("avg_qty", F.round(F.col("sum_qty") / F.col("n_rows"), 6))
    )


ORACLE_LINEITEM_PRICING_SQL = f"""
WITH agg AS (
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '{PRICING_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
)
SELECT *, round(sum_qty / n_rows, 6) AS avg_qty FROM agg
"""


def oracle_verdict_rollup_sql(verdicts_sql: str) -> str:
    return f"""
WITH vd AS ({verdicts_sql})
SELECT COALESCE(CAST(partition_id AS VARCHAR), 'ALL') AS partition,
       COALESCE(check_name, 'ALL') AS check_name,
       CAST(SUM(n_violations) AS BIGINT) AS n_violations,
       CAST(SUM(n_checked) AS BIGINT) AS n_checked
FROM vd GROUP BY ROLLUP (partition_id, check_name)
"""
