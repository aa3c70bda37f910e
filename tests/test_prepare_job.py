"""End-to-end spark-submit smoke of the training-data preparation
job: line dedup → exact dedup → BPE billing + packing → shard export,
with each stage's output landing and mutually consistent."""

import json
import os
import shutil
import subprocess
import tempfile

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp(prefix="xjs-prepjob-", dir=os.path.join(REPO, ".tmp"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_prepare_training_data_job(tmp, spark):
    subprocess.run(
        ["python", os.path.join(REPO, "scripts", "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    proc = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master", "local[4]",
            "--py-files", os.path.join(REPO, "dist", "xjs.zip"),
            os.path.join(REPO, "jobs", "prepare_training_data.py"),
            "--input", "/root/testdata/sf0.001",
            "--out", tmp,
            "--n-shards", "8",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])

    for sub in ("line_state", "cleaned", "packed", "shards", "manifest"):
        assert os.path.exists(os.path.join(tmp, sub, "_SUCCESS")) or any(
            f == "_SUCCESS" or f.startswith("shard_id=")
            for f in os.listdir(os.path.join(tmp, sub))
        ), sub

    assert summary["n_docs_in"] == 500
    assert summary["n_dup_lines"] > 0
    assert 0 < summary["n_survivors"] <= 500
    assert summary["total_bpe_tokens"] > 0
    assert summary["n_shards"] == 8

    # line dedup really happened: the corpus-wide banner survives once
    cleaned = spark.read.parquet(f"{tmp}/cleaned")
    assert cleaned.count() == 500
    assert cleaned.filter(
        F.col("text").contains("copyright notice all rights reserved")
    ).count() == 1

    # packing billed every survivor
    packed = spark.read.parquet(f"{tmp}/packed")
    assert packed.count() == summary["n_survivors"]
    assert packed.filter(F.col("n_tokens") <= 0).count() == 0

    # shards cover the survivor set exactly, sizes match the manifest
    shards = spark.read.parquet(f"{tmp}/shards")
    assert shards.count() == summary["n_survivors"]
    assert shards.select("doc_id").distinct().count() == summary["n_survivors"]
    man = {r.shard_id: r.n_docs
           for r in spark.read.parquet(f"{tmp}/manifest").collect()}
    got = {r.shard_id: r["count"]
           for r in shards.groupBy("shard_id").count().collect()}
    assert man == got
    assert sum(man.values()) == summary["n_survivors"]
