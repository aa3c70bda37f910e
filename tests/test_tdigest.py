"""t-digest-lite quantiles: accuracy vs exact, mergeability across
partitionings."""

import numpy as np
from pyspark.sql import functions as F

from xjs.checks.tdigest import quantiles_tdigest


def test_tdigest_accuracy(spark):
    # deterministic skewed data: x^2 over a range
    df = spark.range(0, 20000, 1, 8).select((F.col("id") % 1000).alias("v")).select(
        (F.col("v") * F.col("v")).cast("double").alias("x")
    )
    got = {r["q"]: r["value"] for r in quantiles_tdigest(df, "x", (0.5, 0.9, 0.99)).collect()}
    vals = np.tile((np.arange(1000) ** 2).astype(float), 20)
    for q in (0.5, 0.9, 0.99):
        exact = np.quantile(vals, q)
        rel = abs(got[q] - exact) / max(exact, 1)
        assert rel < 0.02, f"q={q}: {got[q]} vs {exact}"


def test_tdigest_partitioning_stability(spark):
    """Different input partitionings must give near-identical results
    (mergeable-sketch property)."""
    base = spark.range(0, 9999, 1, 4).select((F.pmod(F.col("id") * 7919, F.lit(9999))).cast("double").alias("x"))
    a = {r["q"]: r["value"] for r in quantiles_tdigest(base, "x").collect()}
    b = {r["q"]: r["value"] for r in quantiles_tdigest(base.repartition(13), "x").collect()}
    for q in a:
        assert abs(a[q] - b[q]) / max(abs(a[q]), 1) < 0.01
