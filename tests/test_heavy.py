"""Misra-Gries heavy hitters: sketch-state bound, superset guarantee
on adversarially spread keys, exactness vs brute force, threshold
precondition."""

import pytest
from pyspark.sql import functions as F

from xjs.pipeline.heavy import heavy_hitters, mg_candidates, _mg_reduce


def test_mg_reduce_bound_and_semantics():
    counts = {i: i + 1 for i in range(10)}  # 1..10
    out = _mg_reduce(dict(counts), capacity=3)
    assert len(out) <= 3
    # decrement was the 7th-smallest (=7); survivors keep count-7
    assert out == {7: 1, 8: 2, 9: 3}
    assert _mg_reduce({1: 5}, capacity=3) == {1: 5}  # under capacity: untouched


def _skewed_df(spark, n_keys=500, hot_copies=400, n_rows=10_000, partitions=8):
    """hot key 0 has hot_copies rows, the rest spread uniformly —
    deterministic, shuffled across partitions by hash."""
    base = spark.range(0, n_rows, 1, partitions)
    key = F.when(F.col("id") % (n_rows // hot_copies) == 0, F.lit(0)).otherwise(
        (F.col("id") % F.lit(n_keys)) + 1
    )
    return base.select(key.cast("bigint").alias("k"))


def test_mg_candidates_state_bounded(spark):
    df = _skewed_df(spark)
    per_part = (
        mg_candidates(df, "k", capacity=16)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_part <= 16


def test_heavy_hitters_exact_vs_bruteforce(spark):
    df = _skewed_df(spark)
    got = {
        (r["k"], r["n_rows"])
        for r in heavy_hitters(df, "k", s_num=2, s_den=100, capacity=64).collect()
    }
    total = df.count()
    brute = {
        (r["k"], r["count"])
        for r in df.groupBy("k").count().collect()
        if r["count"] * 100 >= 2 * total
    }
    assert got == brute and len(brute) >= 1


def test_heavy_hitters_null_key_counted(spark):
    """ADVICE r2: a NULL-heavy column must surface NULL as a hitter —
    value_counts() silently drops NaN, and a plain equi-join confirm
    would drop the NULL group again."""
    df = spark.range(0, 1000, 1, 4).select(
        F.when(F.col("id") % 2 == 0, F.col("id")).alias("k")  # 50% NULL
    )
    got = {
        (r["k"], r["n_rows"])
        for r in heavy_hitters(df, "k", s_num=10, s_den=100, capacity=64).collect()
    }
    assert got == {(None, 500)}


def test_heavy_hitters_string_column(spark):
    """The sketch and confirm must work on string keys (domains), not
    just longs."""
    df = spark.range(0, 300, 1, 4).select(
        F.when(F.col("id") % 3 == 0, F.lit("hot.example"))
        .otherwise(F.concat(F.lit("d"), F.col("id").cast("string")))
        .alias("dom")
    )
    got = {
        (r["dom"], r["n_rows"])
        for r in heavy_hitters(df, "dom", s_num=10, s_den=100, capacity=64).collect()
    }
    assert got == {("hot.example", 100)}


def test_heavy_hitters_capacity_precondition():
    with pytest.raises(ValueError, match="capacity"):
        # capacity+1 must exceed s_den/s_num = 200
        heavy_hitters(None, "k", s_num=1, s_den=200, capacity=64)


def test_heavy_hitters_broadcast_confirm_plan(spark, sf_dir):
    from xjs.pipeline.heavy import q_heavy_hitters

    plan = (
        q_heavy_hitters(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    # the fact-table confirm pass must be a broadcast semi-join, never
    # a shuffled join of the big side
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
