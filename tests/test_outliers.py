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


def test_embedding_quality_degenerate_vectors(spark):
    from xjs.pipeline.similarity import embedding_quality

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),          # zero vector
        (3, [float("nan"), 1.0, 0.0, 0.0]), # NaN component
        (4, [1.0, 2.0]),                    # wrong dim
        (5, [float("inf"), 0.0, 0.0, 0.0]), # Inf component
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r["vec_id"]: r for r in embedding_quality(df, expected_dim=4).collect()}
    assert out[1]["l2_norm"] == 1.0 and not out[1]["is_zero"]
    assert out[2]["is_zero"] and not out[2]["has_nonfinite"]
    assert out[3]["has_nonfinite"]
    assert out[4]["dim_violation"] and out[4]["dim"] == 2
    assert out[5]["has_nonfinite"]
    assert not out[1]["dim_violation"]
