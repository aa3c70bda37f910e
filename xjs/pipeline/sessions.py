"""Sessionization: gap-based session assignment over the events table
(batch counterpart of streaming session windows; SURVEY.md §2.9
windows row).

Classic two-window composition: a boundary flag from ``lag``, then a
running sum per entity — one shuffle on the entity key, both windows
share it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

GAP_MINUTES = 30


def sessionize(df: DataFrame, entity: str, ts_col: str, order_col: str) -> DataFrame:
    """(entity, session_id, n_events, session_start, session_end)."""
    w = Window.partitionBy(entity).orderBy(order_col)
    # interval comparison (TIMESTAMP_NTZ has no bigint cast under ANSI)
    boundary = (
        F.when(
            F.col(ts_col) > F.lag(F.col(ts_col)).over(w) + F.expr(f"INTERVAL {GAP_MINUTES} MINUTES"),
            1,
        )
        .otherwise(0)
    )
    flagged = df.select(
        F.col(entity),
        F.col(ts_col),
        F.col(order_col),
        F.sum(boundary).over(w).alias("session_id"),
    )
    return flagged.groupBy(entity, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(ev, "user_id", "ts", "event_id")


def q_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in ``F.session_window`` operator (batch form of the
    streaming session aggregation in xjs.streaming.session_stats):
    same gap semantics as ``sessionize`` ordered by event time, except
    session_end is defined as last event + gap."""
    from xjs.streaming import session_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_stats(ev, "user_id", "ts", gap=f"{GAP_MINUTES} minutes")


ORACLE_SESSION_WINDOW_SQL = f"""
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {GAP_MINUTES * 60}
                THEN 1 ELSE 0 END AS boundary
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    SELECT user_id, ts,
           SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts) AS sid
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {GAP_MINUTES} MINUTES AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
"""


ORACLE_SESSIONIZE_SQL = f"""
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {GAP_MINUTES * 60}
                THEN 1 ELSE 0 END AS boundary
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
),
sess AS (
    SELECT user_id, ts,
           SUM(boundary) OVER (PARTITION BY user_id ORDER BY event_id) AS session_id
    FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess GROUP BY user_id, session_id
"""
