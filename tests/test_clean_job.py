"""End-to-end spark-submit smoke of the boilerplate-cleaning job: the
flagged-gram ledger and cleaned corpus must land, every doc must
survive (cleaning never drops rows), and the injected header/footer
must actually be gone from the cleaned text."""

import json
import os
import shutil
import subprocess
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp(prefix="xjs-cleanjob-", dir=os.path.join(REPO, ".tmp"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_clean_job_spark_submit(tmp, spark):
    subprocess.run(
        ["python", os.path.join(REPO, "scripts", "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    proc = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master", "local[4]",
            "--py-files", os.path.join(REPO, "dist", "xjs.zip"),
            os.path.join(REPO, "jobs", "clean_boilerplate.py"),
            "--input", "/root/testdata/sf0.001",
            "--out", tmp,
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_flagged_grams"] > 0
    assert summary["chars_removed"] > 0
    assert os.path.exists(os.path.join(tmp, "grams", "_SUCCESS"))
    assert os.path.exists(os.path.join(tmp, "cleaned", "_SUCCESS"))

    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cleaned = spark.read.parquet(os.path.join(tmp, "cleaned"))
    assert cleaned.count() == docs.count() == summary["n_docs"]
    # the injected footer phrase must be gone from every cleaned doc
    assert (
        cleaned.filter(F.col("clean_text").contains("newsletter today now")).count()
        == 0
    )
