"""Clustered write: files carry disjoint key ranges, a narrow filter
prunes most files, and an unclustered write of the same data doesn't."""

import shutil
import tempfile

import pytest

from xjs.sources.layout import file_key_ranges, pruning_ratio, write_clustered
from xjs.sources.webpages import webpages


@pytest.fixture()
def tmp(spark):
    d = tempfile.mkdtemp(prefix="xjs-layout-", dir="/root/repo/.tmp")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_clustered_ranges_disjoint_and_pruning(spark, sf_dir, tmp):
    wp = webpages(spark, sf_dir).select("doc_id", "warc_ts", "url")
    write_clustered(wp, f"{tmp}/clustered", ["doc_id"], n_files=8)

    ranges = sorted(file_key_ranges(f"{tmp}/clustered", "doc_id"))
    assert len(ranges) >= 4
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next  # disjoint, ordered ranges

    lo, hi = ranges[0][0], ranges[0][1]  # one file's span
    assert pruning_ratio(f"{tmp}/clustered", "doc_id", lo, hi) >= 0.5

    # control: random layout -> every file overlaps the probe range
    wp.repartition(8).write.parquet(f"{tmp}/random")
    assert pruning_ratio(f"{tmp}/random", "doc_id", lo, hi) == 0.0


def test_clustered_scan_reads_fewer_rows(spark, sf_dir, tmp):
    """End-to-end: the same filter over the clustered layout feeds the
    scan fewer rows (row-group pruning), observable in scan metrics."""
    wp = webpages(spark, sf_dir).select("doc_id", "warc_ts", "url")
    write_clustered(wp, f"{tmp}/c2", ["doc_id"], n_files=8)

    df = spark.read.parquet(f"{tmp}/c2").where("doc_id < 10")
    assert df.count() == 10
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)" in plan


def test_compaction_shrinks_file_count(spark, sf_dir, tmp):
    from xjs.sources.layout import compact_small_files

    wp = webpages(spark, sf_dir).select("doc_id", "url", "text")
    wp.repartition(32).write.parquet(f"{tmp}/small")  # 32 tiny files
    import os
    n_in = sum(1 for f in os.listdir(f"{tmp}/small") if f.endswith(".parquet"))
    assert n_in >= 16

    n_out = compact_small_files(spark, f"{tmp}/small", f"{tmp}/compact", target_mb=64)
    files = [f for f in os.listdir(f"{tmp}/compact") if f.endswith(".parquet")]
    assert len(files) == n_out == 1  # tiny table -> one file
    assert (
        spark.read.parquet(f"{tmp}/compact").count()
        == spark.read.parquet(f"{tmp}/small").count()
    )


def test_bench_force_defeats_count_pruning(spark, sf_dir):
    """Guard for bench.force() (r4): count() over a pure projection
    prunes to a struct<> metadata scan — the operator never runs; the
    forced form must keep every output column in the scan."""
    import re
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import force
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    proj = docs.select("doc_id", F.reverse(F.col("text")).alias("r"))

    def read_schemas(df):
        plan = df.groupBy().count()._jdf.queryExecution().executedPlan().toString()
        return re.findall(r"ReadSchema: ([^\n]*)", plan)

    assert all(r.startswith("struct<>") for r in read_schemas(proj))
    forced = read_schemas(force(proj))
    assert any("text" in r for r in forced), forced
