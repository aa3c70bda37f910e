"""End-to-end spark-submit test of the incremental daily-ingest job:
three ordered slices fold line/char/simhash state forward, the union
of per-day cleaned outputs equals the batch pipeline (line-clean then
anchored char-clean) over the full corpus, and a completed day
replays as a no-op."""

import json
import os
import shutil
import subprocess
import tempfile

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ANCHOR = 8


@pytest.fixture(scope="module")
def ingest(tmp_path_factory):
    base = tempfile.mkdtemp(prefix="xjs-ingest-", dir=os.path.join(REPO, ".tmp"))
    subprocess.run(
        ["python", os.path.join(REPO, "scripts", "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    # ordered slices (new docs get new ids — the production shape that
    # makes forward-pass cleaning equal the batch pipeline)
    filters = [
        "doc_id < 167",
        "doc_id >= 167 AND doc_id < 333",
        "doc_id >= 333",
    ]
    manifests = []
    prev = None
    for day, flt in enumerate(filters):
        out = os.path.join(base, f"day{day}")
        cmd = [
            "/opt/spark/bin/spark-submit",
            "--master", "local[4]",
            "--py-files", os.path.join(REPO, "dist", "xjs.zip"),
            os.path.join(REPO, "jobs", "daily_ingest.py"),
            "--input", "/root/testdata/sf0.001",
            "--out", out,
            "--filter", flt,
            "--day", f"day{day}",
            "--anchor-mod", str(ANCHOR),
        ]
        if prev:
            cmd += ["--state-in", prev]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-2000:]
        manifests.append(json.loads(proc.stdout.strip().splitlines()[-1]))
        prev = out
    yield base, manifests, filters
    shutil.rmtree(base, ignore_errors=True)


def test_day_manifests_and_state_land(ingest):
    base, manifests, _ = ingest
    assert [m["day"] for m in manifests] == ["day0", "day1", "day2"]
    assert sum(m["n_docs_slice"] for m in manifests) == 500
    for day in range(3):
        for sub in ("lines", "chars", "cleaned_lines", "cleaned"):
            assert os.path.exists(
                os.path.join(base, f"day{day}", sub, "_SUCCESS")
            ), (day, sub)
        assert os.path.exists(os.path.join(base, f"day{day}", "_DONE"))
    # state grows monotonically across days
    rows = [m["n_char_state_rows"] for m in manifests]
    assert rows[0] < rows[1] < rows[2]
    assert manifests[-1]["n_components"] > 0


def test_union_of_days_equals_batch_pipeline(spark, ingest):
    """Forward-pass cleaned slices, unioned, must byte-match the batch
    pipeline (corpus-wide line dedup, then anchored char dedup over the
    line-cleaned text) — owners sit in the earliest slice because the
    slices are id-ordered."""
    from xjs.pipeline.lines import line_dedup_remove, line_page_transform
    from xjs.pipeline.suffix import char_dedup_remove, char_span_duplicates

    base, _, _ = ingest
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = line_page_transform(docs.select("doc_id", "text"))
    lc = line_dedup_remove(corpus).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    spans = char_span_duplicates(lc, method="rolling", anchor_mod=ANCHOR)
    batch = char_dedup_remove(lc, spans)

    got = spark.read.parquet(*[
        os.path.join(base, f"day{d}", "cleaned") for d in range(3)
    ])
    diff = got.withColumnRenamed("text", "clean_text").exceptAll(batch)
    assert got.count() == 500
    assert diff.count() == 0
    assert batch.exceptAll(
        got.withColumnRenamed("text", "clean_text")
    ).count() == 0


def test_simhash_state_equals_single_fold(spark, ingest):
    """The 3-day simhash registry answers survivors identically to a
    single-slice bootstrap over the same final cleaned corpus (fold
    count is invisible — the state-merge contract)."""
    from xjs.pipeline.incremental import incremental_update, survivors

    base, _, _ = ingest
    clean = spark.read.parquet(*[
        os.path.join(base, f"day{d}", "cleaned") for d in range(3)
    ])
    one = os.path.join(base, "onefold")
    incremental_update(spark, clean, one)
    a = survivors(spark, os.path.join(base, "day2", "sim"))
    b = survivors(spark, one)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_completed_day_replays_as_noop(ingest):
    base, manifests, filters = ingest
    out = os.path.join(base, "day2")
    proc = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master", "local[4]",
            "--py-files", os.path.join(REPO, "dist", "xjs.zip"),
            os.path.join(REPO, "jobs", "daily_ingest.py"),
            "--input", "/root/testdata/sf0.001",
            "--out", out,
            "--filter", filters[2],
            "--day", "day2",
            "--anchor-mod", str(ANCHOR),
            "--state-in", os.path.join(base, "day1"),
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    replay = json.loads(proc.stdout.strip().splitlines()[-1])
    assert replay.get("replay") is True
    for k in ("n_docs_slice", "n_char_state_rows", "n_components"):
        assert replay[k] == manifests[2][k], k


def test_refuses_partial_previous_day(ingest):
    """Chaining onto a day without a _DONE marker must fail fast —
    mixed-lineage state is worse than a crashed run."""
    base, _, filters = ingest
    partial = os.path.join(base, "partialday")
    os.makedirs(partial, exist_ok=True)  # exists but never completed
    proc = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master", "local[4]",
            "--py-files", os.path.join(REPO, "dist", "xjs.zip"),
            os.path.join(REPO, "jobs", "daily_ingest.py"),
            "--input", "/root/testdata/sf0.001",
            "--out", os.path.join(base, "day3"),
            "--filter", filters[2],
            "--state-in", partial,
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode != 0
    assert "not a completed day" in (proc.stderr + proc.stdout)
