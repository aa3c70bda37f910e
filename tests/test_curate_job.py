"""End-to-end spark-submit smoke of the curation job: row accounting
must cover the input exactly, outputs must land, the kept corpus must
be PII-free by construction (redaction is part of the job)."""

import json
import os
import shutil
import subprocess
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp(prefix="xjs-curatejob-", dir=os.path.join(REPO, ".tmp"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_curate_job_spark_submit(tmp):
    subprocess.run(
        ["python", os.path.join(REPO, "scripts", "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    proc = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master", "local[4]",
            "--py-files", os.path.join(REPO, "dist", "xjs.zip"),
            os.path.join(REPO, "jobs", "curate_corpus.py"),
            "--input", "/root/testdata/sf0.001",
            "--out", tmp,
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["accounted"] is True
    assert summary["kept"] > 0
    assert summary["kept"] + sum(summary["rejects"].values()) == summary["input_docs"]
    assert os.path.exists(os.path.join(tmp, "corpus", "_SUCCESS"))
    assert os.path.exists(os.path.join(tmp, "rejects", "_SUCCESS"))
