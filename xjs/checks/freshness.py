"""Freshness + completeness (row-count anomaly) checks — the two
operational DQ classes that complement the content checks: "did data
arrive, and recently enough?"

Both are single aggregation passes keyed by the partition column
(map-side partial counts/maxes — the same shuffle-light shape as
``xjs.checks.stats``).  ``as_of`` is an explicit parameter, never
wall-clock: runs must be reproducible and oracle-checkable, and a
production scheduler passes its logical run timestamp anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def freshness(
    df: DataFrame, ts_col: str, partition_col: str,
    as_of: str, max_lag_seconds: int,
) -> DataFrame:
    """(partition, last_ts, lag_seconds, stale): per-partition max
    event time vs the logical run time."""
    agg = df.groupBy(partition_col).agg(F.max(ts_col).alias("last_ts"))
    lag = F.unix_timestamp(F.lit(as_of).cast("timestamp")) - F.unix_timestamp(
        F.col("last_ts")
    )
    return agg.select(
        partition_col,
        "last_ts",
        lag.alias("lag_seconds"),
        (lag > max_lag_seconds).alias("stale"),
    )


def row_count_anomaly(
    df: DataFrame, partition_col: str, rel_tol: float,
) -> DataFrame:
    """(partition, n_rows, expected, ratio, anomalous): each
    partition's row count vs the all-partition mean (the
    self-referential baseline; swap in a checkpointed expected-counts
    table for cross-run comparison).  ``anomalous`` when the count
    deviates more than ``rel_tol`` relative."""
    counts = df.groupBy(partition_col).agg(F.count(F.lit(1)).alias("n_rows"))
    expected = counts.agg(F.avg("n_rows").alias("expected"))
    j = counts.crossJoin(F.broadcast(expected))
    ratio = F.round(F.col("n_rows") / F.col("expected"), 6)
    return j.select(
        partition_col,
        "n_rows",
        F.round("expected", 6).alias("expected"),
        ratio.alias("ratio"),
        (F.abs(ratio - 1) > rel_tol).alias("anomalous"),
    )


# ---------------------------------------------------------------------------
# driver queries + oracles (webpages; as_of fixed for reproducibility)
# ---------------------------------------------------------------------------

AS_OF = "2024-01-01 01:00:00"   # EPOCH + 1h: early partitions go stale
MAX_LAG_S = 1800
REL_TOL = 0.05


def q_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xjs.sources.webpages import webpages

    return freshness(webpages(spark, sf_dir), "warc_ts", "partition_id",
                     AS_OF, MAX_LAG_S)


def oracle_freshness_sql(cte: str) -> str:
    return f"""
WITH {cte},
agg AS (
    SELECT partition_id, MAX(warc_ts) AS last_ts FROM webpages
    GROUP BY partition_id
)
SELECT partition_id, last_ts,
       CAST(epoch(TIMESTAMP '{AS_OF}') - epoch(last_ts) AS BIGINT) AS lag_seconds,
       (epoch(TIMESTAMP '{AS_OF}') - epoch(last_ts)) > {MAX_LAG_S} AS stale
FROM agg
"""


def q_row_count_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xjs.sources.webpages import webpages

    return row_count_anomaly(webpages(spark, sf_dir), "partition_id", REL_TOL)


def oracle_row_count_anomaly_sql(cte: str) -> str:
    return f"""
WITH {cte},
counts AS (
    SELECT partition_id, COUNT(*) AS n_rows FROM webpages GROUP BY partition_id
),
e AS (SELECT AVG(n_rows) AS expected FROM counts)
SELECT partition_id, n_rows,
       ROUND(expected, 6) AS expected,
       ROUND(n_rows / expected, 6) AS ratio,
       ABS(ROUND(n_rows / expected, 6) - 1) > {REL_TOL} AS anomalous
FROM counts, e
"""
