"""Point-in-time (as-of) join — the classic operator Spark's join
syntax lacks (DuckDB ships it as ``ASOF JOIN``; pandas as
``merge_asof``).  For each left row, attach the latest right row with
the same key whose timestamp is at-or-before the left timestamp.

Scale shape: the naive formulation (equi-join on key + ``r.ts <=
l.ts`` + argmax) explodes to |L_k|x|R_k| rows per key before the
rank prunes it — quadratic in the hot key.  This implementation
instead UNIONs both sides tagged with a side bit and carries one
side-gated STRUCT payload with a single ``last(payload,
ignorenulls=True)`` window: a single shuffle on the key,
O(|L_k|+|R_k|) rows per key, no intermediate blow-up.  The struct is
what makes the carried columns atomic — per-column carries would
backfill a NULL value column from an older right row (a mixed row;
ADVICE r2).  Ties broken by ``tiebreak``.  Hot-key caveat matches sessionize: one
reducer sees the whole key; time-bucketing the window is the 100 TB
mitigation (see SCALE.md).

Use case here (training-data flavored): error attribution — for each
``error`` event, the most recent ``click`` by the same user, plus a
tolerance-gated variant (clicks older than 30 min don't count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOLERANCE_MIN = 30


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    values: dict[str, str],
    tiebreak: str,
) -> DataFrame:
    """Left rows + ``values`` (right col -> output alias) from the
    latest right row per ``key`` with ``right_ts <= left_ts``; NULL
    aliases when no right row precedes.  Ties on ``right_ts`` resolve
    to the largest ``tiebreak``; at equal timestamps the right row IS
    visible to the left row (inclusive semantics, side bit sorts the
    right row first)."""
    lcols = left.columns
    clash = set(values.values()) & set(lcols)
    if clash:
        raise ValueError(f"value aliases collide with left columns: {sorted(clash)}")
    rtype = dict(right.dtypes)
    ltype = dict(left.dtypes)
    rside = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        *[F.col(src).alias(f"_v_{alias}") for src, alias in values.items()],
        *[F.lit(None).cast(ltype[c]).alias(c) for c in lcols],
    )
    lside = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtype[tiebreak]).alias("_tb"),
        *[
            F.lit(None).cast(rtype[src]).alias(f"_v_{alias}")
            for src, alias in values.items()
        ],
        *[F.col(c) for c in lcols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # one atomic side-gated struct payload, NOT one independent
    # last(...) per value column: independent carries would backfill a
    # NULL value column from an OLDER right row, producing a mixed row
    # (the gate also matters because an all-NULL-fields struct is
    # itself non-NULL — same trick as asof_join_bucketed stage 1)
    payload = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(f"_v_{a}").alias(a) for a in values.values()]),
    )
    carried = rside.unionByName(lside).select(
        F.col("_side"),
        *lcols,
        F.last(payload, ignorenulls=True).over(w).alias("_p"),
    )
    return carried.where(F.col("_side") == 1).select(
        *lcols,
        *[F.col("_p").getField(a).alias(a) for a in values.values()],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    values: dict[str, str],
    tiebreak: str,
    bucket: str = "hour",
) -> DataFrame:
    """The 100 TB form of ``asof_join``: shuffle on (key, time-bucket)
    instead of key alone, so a hot key spreads across its buckets and
    no reducer ever holds a whole key.

    Three stages, same output as ``asof_join``:

    1. local carry within (key, bucket) — the union+window trick,
       partitioned by (key, bucket);
    2. per-(key, bucket) summaries of the right side (payload of the
       latest right row), then a carry of summaries across buckets per
       key — this window is over bucket-grain rows (thousands per key
       at most), not row-grain;
    3. join the summary carry back on (key, bucket) and coalesce:
       a left row takes its in-bucket match, else the latest right
       payload from any earlier bucket.
    """
    lcols = left.columns
    clash = set(values.values()) & set(lcols)
    if clash:
        raise ValueError(f"value aliases collide with left columns: {sorted(clash)}")
    rtype = dict(right.dtypes)
    ltype = dict(left.dtypes)

    def payload():
        return F.struct(*[F.col(f"_v_{a}").alias(a) for a in values.values()])

    rside = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.date_trunc(bucket, F.col(right_ts)).alias("_b"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        *[F.col(src).alias(f"_v_{a}") for src, a in values.items()],
        *[F.lit(None).cast(ltype[c]).alias(c) for c in lcols],
    )
    lside = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.date_trunc(bucket, F.col(left_ts)).alias("_b"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtype[tiebreak]).alias("_tb"),
        *[F.lit(None).cast(rtype[src]).alias(f"_v_{a}") for src, a in values.items()],
        *[F.col(c) for c in lcols],
    )
    u = rside.unionByName(lside)

    # stage 1: in-bucket carry (hot key spread over its buckets)
    w_local = (
        Window.partitionBy("_k", "_b")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NB: a struct whose fields are all NULL is itself non-NULL, so the
    # payload must be gated on the side bit or left rows would clobber
    # the ignorenulls carry with empty structs
    right_payload = F.when(F.col("_side") == 0, payload())
    local = u.select(
        F.col("_side"),
        F.col("_k"),
        F.col("_b"),
        *lcols,
        F.last(right_payload, ignorenulls=True).over(w_local).alias("_local"),
    ).where(F.col("_side") == 1)

    # stage 2: right-side bucket summaries -> carry across buckets.
    # spine = every (key, bucket) either side touches, so gaps carry through.
    summaries = rside.groupBy("_k", "_b").agg(
        F.max(
            F.struct(F.col("_ts").alias("ts"), F.col("_tb").alias("tb"), payload().alias("p"))
        )["p"].alias("_bucket_last")
    )
    spine = (
        u.select("_k", "_b")
        .distinct()
        .join(summaries, ["_k", "_b"], "left")
    )
    w_carry = (
        Window.partitionBy("_k")
        .orderBy(F.col("_b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = spine.select(
        "_k",
        "_b",
        F.last(F.col("_bucket_last"), ignorenulls=True).over(w_carry).alias("_prev"),
    )

    # stage 3: coalesce in-bucket match with earlier-bucket carry
    joined = local.join(carry, ["_k", "_b"])
    merged = F.coalesce(F.col("_local"), F.col("_prev"))
    return joined.select(
        *lcols,
        *[merged.getField(a).alias(a) for a in values.values()],
    )


def q_asof_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error event: the latest preceding click by the same
    user (as-of), plus ``recent_click_id`` gated to a 30-minute
    tolerance."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    errors = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click")
    out = asof_join(
        errors,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        values={"event_id": "click_event_id", "value": "click_value", "ts": "click_ts"},
        tiebreak="event_id",
    )
    recent = F.when(
        F.col("ts") <= F.col("click_ts") + F.expr(f"INTERVAL {TOLERANCE_MIN} MINUTES"),
        F.col("click_event_id"),
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "click_event_id",
        "click_value",
        "click_ts",
        recent.alias("recent_click_id"),
    )


def oracle_asof_clicks_sql() -> str:
    """Same union + IGNORE-NULLS carry-forward in portable SQL (not
    DuckDB's ASOF JOIN syntax, so the oracle states the semantics
    explicitly)."""
    return f"""
WITH u AS (
    SELECT user_id AS k, ts AS sort_ts, 0 AS side, event_id AS tb,
           event_id AS v_click_event_id, value AS v_click_value, ts AS v_click_ts,
           CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS TIMESTAMP) AS ts
    FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, ts, 1, CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP),
           event_id, ts
    FROM events WHERE event_type = 'error'
),
c AS (
    -- atomic struct carry (same semantics as the Spark side): all
    -- carried columns come from the SAME matched right row, even when
    -- that row holds NULL value columns
    SELECT side, event_id, k, ts,
           last_value(CASE WHEN side = 0 THEN struct_pack(
               click_event_id := v_click_event_id,
               click_value := v_click_value,
               click_ts := v_click_ts) END IGNORE NULLS) OVER w AS p
    FROM u
    WINDOW w AS (PARTITION BY k ORDER BY sort_ts, side, tb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, k AS user_id, ts,
       p.click_event_id AS click_event_id,
       p.click_value AS click_value,
       p.click_ts AS click_ts,
       CASE WHEN ts <= p.click_ts + INTERVAL {TOLERANCE_MIN} MINUTES
            THEN p.click_event_id END AS recent_click_id
FROM c WHERE side = 1
"""
