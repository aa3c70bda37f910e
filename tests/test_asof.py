"""As-of join semantics on hand-built frames: inclusive equal-ts
match, tie-break to the largest right row, NULL before any right row,
tolerance gating, and the one-shuffle plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from xjs.pipeline.asof import asof_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(0)), (2, 100, _ts(10)), (3, 100, _ts(20)), (4, 200, _ts(5))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        # user 100: two rows at the same ts=10 (tie), one later at 15
        [(51, 100, _ts(10), 1.0), (52, 100, _ts(10), 2.0), (53, 100, _ts(15), 3.0)],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    return left, right


def _run(left, right):
    out = asof_join(
        left,
        right,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        values={"event_id": "m_id", "value": "m_value"},
        tiebreak="event_id",
    )
    return {r["event_id"]: r for r in out.collect()}


def test_asof_semantics(frames):
    left, right = frames
    rows = _run(left, right)
    assert rows[1]["m_id"] is None and rows[1]["m_value"] is None  # nothing precedes
    # equal-ts inclusive + tie-break to the largest tiebreak (52 over 51)
    assert rows[2]["m_id"] == 52 and rows[2]["m_value"] == 2.0
    assert rows[3]["m_id"] == 53  # latest preceding
    assert rows[4]["m_id"] is None  # key with no right rows at all


def test_asof_carried_columns_same_row(frames):
    """All carried value columns must come from the SAME matched row."""
    left, right = frames
    rows = _run(left, right)
    pairs = {51: 1.0, 52: 2.0, 53: 3.0}
    for r in rows.values():
        if r["m_id"] is not None:
            assert r["m_value"] == pairs[r["m_id"]]


def test_asof_null_value_column_not_backfilled(spark):
    """ADVICE r2 repro: when the matched right row carries a NULL value
    column, that NULL must survive — per-column carries would backfill
    it from an OLDER right row (left@t10 matching (52,t8,NULL) must
    NOT surface 7.0 from (51,t5))."""
    left = spark.createDataFrame(
        [(1, 100, _ts(10))], "event_id bigint, user_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(51, 100, _ts(5), 7.0), (52, 100, _ts(8), None)],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    rows = _run(left, right)
    assert rows[1]["m_id"] == 52
    assert rows[1]["m_value"] is None
    # and the bucketed variant agrees (the 'same output' contract)
    from xjs.pipeline.asof import asof_join_bucketed

    b = asof_join_bucketed(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        values={"event_id": "m_id", "value": "m_value"}, tiebreak="event_id",
    ).collect()
    assert b[0]["m_id"] == 52 and b[0]["m_value"] is None


def test_asof_alias_collision_raises(frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="ts",
            values={"event_id": "ts"}, tiebreak="event_id",
        )


def test_asof_single_shuffle(frames):
    """One shuffle on the key — the union is narrow, the window is the
    only Exchange; no join blow-up node in the plan."""
    left, right = frames
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        values={"event_id": "m_id"}, tiebreak="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_asof_tolerance_query(spark):
    """recent_click_id nulls out matches older than the tolerance."""
    from xjs.pipeline.asof import q_asof_clicks

    out = q_asof_clicks(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        if r["recent_click_id"] is not None:
            assert r["recent_click_id"] == r["click_event_id"]
            assert (r["ts"] - r["click_ts"]).total_seconds() <= 30 * 60
        elif r["click_ts"] is not None:
            assert (r["ts"] - r["click_ts"]).total_seconds() > 30 * 60


def test_asof_bucketed_equals_plain(spark):
    """The (key, time-bucket) scale path must reproduce the plain
    as-of join exactly on real interleaved data — including left rows
    whose match sits many empty buckets back."""
    from xjs.pipeline.asof import asof_join, asof_join_bucketed

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    right = ev.where(F.col("event_type") == "click")
    kw = dict(
        key="user_id", left_ts="ts", right_ts="ts",
        values={"event_id": "m_id", "value": "m_value", "ts": "m_ts"},
        tiebreak="event_id",
    )
    plain = asof_join(left, right, **kw)
    bucketed = asof_join_bucketed(left, right, bucket="hour", **kw)
    assert plain.count() == bucketed.count() > 0
    assert bucketed.exceptAll(plain).count() == 0
    assert plain.exceptAll(bucketed).count() == 0
    # the big-data shuffle is on (key, bucket), not key alone
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_k#" in plan and "_b#" in plan
