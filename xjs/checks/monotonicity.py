"""Timestamp monotonicity: per-entity out-of-order detection via a
window ``lag`` — the warc_ts extension keyword the target layers onto
the reference's skeleton (SURVEY.md §1.2).

One shuffle on the entity key; the window itself is a sort within
each hash partition.  At scale the entity key (domain / user) is
high-cardinality, so partitions stay balanced; no global sort ever
happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def out_of_order(df: DataFrame, entity: str, order_col: str, ts_col: str) -> DataFrame:
    """(entity, n_events, n_out_of_order) — rows where ts decreased
    relative to the previous event of the same entity."""
    w = Window.partitionBy(entity).orderBy(order_col)
    flagged = df.select(
        F.col(entity),
        (F.col(ts_col) < F.lag(ts_col).over(w)).cast("long").alias("_ooo"),
    )
    return (
        flagged.groupBy(entity)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col("_ooo"), F.lit(0))).alias("n_out_of_order"),
        )
    )


def ts_range_violations(df: DataFrame, ts_col: str, lo: str, hi: str,
                        id_col: str) -> DataFrame:
    """(id, ts, reason) — rows whose timestamp falls outside [lo, hi).
    A pure pushdown-able filter (the north_star's warc_ts range check);
    Iceberg partition pruning on days(ts) makes this a metadata-only
    operation for fully-out-of-range partitions."""
    t = F.col(ts_col)
    return df.filter((t < F.lit(lo).cast("timestamp")) | (t >= F.lit(hi).cast("timestamp"))).select(
        F.col(id_col).alias("id"),
        t.alias("ts"),
        F.when(t < F.lit(lo).cast("timestamp"), F.lit("before range"))
        .otherwise(F.lit("after range"))
        .alias("reason"),
    )


TS_LO, TS_HI = "2024-01-01 00:00:00", "2025-01-01 00:00:00"


def webpages_ts_range(spark, sf_dir: str) -> DataFrame:
    from xjs.sources.webpages import webpages

    return ts_range_violations(webpages(spark, sf_dir), "warc_ts", TS_LO, TS_HI, "url")


def oracle_ts_range_sql(cte: str) -> str:
    return f"""
WITH {cte}
SELECT url AS id, warc_ts AS ts,
       CASE WHEN warc_ts < TIMESTAMP '{TS_LO}' THEN 'before range' ELSE 'after range' END AS reason
FROM webpages
WHERE warc_ts < TIMESTAMP '{TS_LO}' OR warc_ts >= TIMESTAMP '{TS_HI}'
"""


def webpages_ts_monotonicity(spark, sf_dir: str) -> DataFrame:
    """Per-source warc_ts monotonicity over the crawl order (doc_id)."""
    from xjs.sources.webpages import webpages

    wp = webpages(spark, sf_dir)
    return out_of_order(wp, "source", "doc_id", "warc_ts").filter(
        F.col("n_out_of_order") > 0
    )


def events_ts_monotonicity(spark, sf_dir: str) -> DataFrame:
    """Out-of-order event timestamps per user (driver events table)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return out_of_order(ev, "user_id", "event_id", "ts")


def oracle_webpages_monotonicity_sql(cte: str) -> str:
    return f"""
WITH {cte},
flagged AS (
    SELECT source,
           CASE WHEN warc_ts < LAG(warc_ts) OVER (PARTITION BY source ORDER BY doc_id)
                THEN 1 ELSE 0 END AS ooo
    FROM webpages
)
SELECT source, COUNT(*) AS n_events, CAST(SUM(ooo) AS BIGINT) AS n_out_of_order
FROM flagged GROUP BY source HAVING SUM(ooo) > 0
"""


ORACLE_EVENTS_MONOTONICITY_SQL = """
WITH flagged AS (
    SELECT user_id,
           CASE WHEN ts < LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id)
                THEN 1 ELSE 0 END AS ooo
    FROM events
)
SELECT user_id, COUNT(*) AS n_events, CAST(SUM(ooo) AS BIGINT) AS n_out_of_order
FROM flagged GROUP BY user_id
"""
