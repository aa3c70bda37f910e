"""Percentile outlier check: handcrafted distribution + broadcast
threshold plan shape."""

from pyspark.sql import functions as F

from xjs.checks.outliers import numeric_outliers


def test_outliers_handcrafted(spark):
    # group a: 0..99 uniform plus one 10x spike; p99 of 0..99,1000 sits
    # just above 99 -> only the spike exceeds it
    rows = [(i, "a", float(i)) for i in range(100)] + [(100, "a", 1000.0)]
    rows += [(i, "b", 5.0) for i in range(200, 210)]  # constant group: no outliers
    df = spark.createDataFrame(rows, "rid bigint, g string, v double")
    out = numeric_outliers(df, F.col("v"), "g")
    got = [(r["g"], r["value"]) for r in out.collect()]
    assert got == [("a", 1000.0)]


def test_outliers_threshold_broadcast(spark, sf_dir):
    from xjs.checks.outliers import q_outlier_text_lengths

    plan = (
        q_outlier_text_lengths(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # thresholds broadcast back
    assert "SortMergeJoin" not in plan  # the table never shuffles for the join
