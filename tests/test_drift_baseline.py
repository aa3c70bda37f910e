"""Drift baseline snapshot: write once, compare later runs against it."""

import shutil
import tempfile

from pyspark.sql import functions as F

from xjs.checks import drift
from xjs.sources.webpages import webpages


def test_psi_vs_checkpointed_baseline(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="xjs-drift-", dir="/root/repo/.tmp")
    try:
        wp = webpages(spark, sf_dir)
        base_hist = drift.histogram(
            wp, F.length("text"), "partition_id",
            drift.TEXT_LEN_LO, drift.TEXT_LEN_HI, drift.N_BUCKETS,
        )
        drift.write_baseline(base_hist, f"{d}/baseline")

        # same data vs its own snapshot: small PSI everywhere
        p = drift.psi_vs_baseline(
            wp, F.length("text"), "partition_id", f"{d}/baseline",
            drift.TEXT_LEN_LO, drift.TEXT_LEN_HI, drift.N_BUCKETS,
        ).collect()
        assert len(p) == 16
        assert all(r["psi"] < 1.5 for r in p)

        # shifted data vs the snapshot: partition 5 must stand out
        shifted = wp.withColumn(
            "text",
            F.when(F.col("partition_id") == 5, F.concat(F.col("text"), F.lit("y" * 300)))
            .otherwise(F.col("text")),
        )
        p2 = {r["partition_id"]: r["psi"] for r in drift.psi_vs_baseline(
            shifted, F.length("text"), "partition_id", f"{d}/baseline",
            drift.TEXT_LEN_LO, drift.TEXT_LEN_HI, drift.N_BUCKETS,
        ).collect()}
        others = [v for k, v in p2.items() if k != 5]
        assert p2[5] > 1.5 and p2[5] > 2 * max(others)
    finally:
        shutil.rmtree(d, ignore_errors=True)
