"""End-to-end spark-submit test of the WARC ingest job: exact row
accounting across clean/quarantine, the bloom-gated novel slice equals
the exact anti-join, frame errors fail loudly by default, and a
completed run replays as a no-op with the stored manifest."""

import json
import os
import shutil
import subprocess
import tempfile

import pytest
from pyspark.sql import functions as F

from xjs.sources.warc import CORRUPT_MOD, RES_BAD_DATE, RES_NO_URI, write_warc_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(*extra, timeout=600):
    cmd = [
        "/opt/spark/bin/spark-submit",
        "--master", "local[4]",
        "--py-files", os.path.join(REPO, "dist", "xjs.zip"),
        os.path.join(REPO, "jobs", "ingest_warc.py"),
        *extra,
    ]
    return subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="xjs-warcjob-", dir=os.path.join(REPO, ".tmp"))
    subprocess.run(
        ["python", os.path.join(REPO, "scripts", "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    shards = write_warc_fixture(
        spark, sf_dir, os.path.join(base, "shards"), compress=True)
    # history: the urls of even doc_ids (the generator's url formula)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist = d.filter(F.col("doc_id") % 2 == 0).select(
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"))
    hist_path = os.path.join(base, "history-urls")
    hist.write.parquet(hist_path)
    out = os.path.join(base, "day0")
    proc = _submit("--input", shards, "--out", out,
                   "--history-urls", hist_path)
    assert proc.returncode == 0, proc.stderr[-2000:]
    manifest = json.loads(proc.stdout.strip().splitlines()[-1])
    yield base, shards, hist_path, out, manifest
    shutil.rmtree(base, ignore_errors=True)


def test_exact_row_accounting(spark, sf_dir, run):
    _, _, _, out, manifest = run
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    assert manifest["by_type"]["conversion"] == n_docs
    assert manifest["n_frame_errors"] == 0
    n_q = sum(manifest["quarantine"].values())
    assert manifest["n_clean"] + n_q == n_docs
    n_no_uri = docs.filter(F.col("doc_id") % CORRUPT_MOD == RES_NO_URI).count()
    n_bad = docs.filter(F.col("doc_id") % CORRUPT_MOD == RES_BAD_DATE).count()
    assert manifest["quarantine"] == {
        "missing_uri": n_no_uri, "bad_date": n_bad}
    assert spark.read.parquet(os.path.join(out, "clean")).count() \
        == manifest["n_clean"]


def test_novel_slice_equals_exact_antijoin(spark, run):
    _, _, hist_path, out, manifest = run
    clean = spark.read.parquet(os.path.join(out, "clean"))
    hist = spark.read.parquet(hist_path)
    want = clean.join(hist, "url", "left_anti")
    novel = spark.read.parquet(os.path.join(out, "novel"))
    assert manifest["n_novel"] == want.count() == novel.count()
    assert novel.select("url").exceptAll(want.select("url")).count() == 0


def test_completed_run_replays_as_noop(run):
    _, shards, hist_path, out, manifest = run
    marker = os.path.join(out, "_DONE")
    before = os.path.getmtime(marker)
    proc = _submit("--input", shards, "--out", out,
                   "--history-urls", hist_path)
    assert proc.returncode == 0, proc.stderr[-2000:]
    replay = json.loads(proc.stdout.strip().splitlines()[-1])
    assert replay == manifest
    assert os.path.getmtime(marker) == before


def test_warc_clean_slice_feeds_daily_ingest(spark, run):
    """The crawl-to-clean seam: ingest_warc's clean output, mapped to
    the documents shape, is a valid daily_ingest day — the full
    production path from raw shards to dedup state."""
    base, _, _, out, manifest = run
    clean = spark.read.parquet(os.path.join(out, "clean"))
    day_input = os.path.join(base, "day0-docs")
    clean.select(
        F.regexp_extract("record_id", r"urn:xjs:doc:(\d+)", 1)
        .cast("long").alias("doc_id"),
        "text",
    ).write.parquet(os.path.join(day_input, "documents.parquet"))
    ingest_out = os.path.join(base, "day0-ingested")
    cmd = [
        "/opt/spark/bin/spark-submit",
        "--master", "local[4]",
        "--py-files", os.path.join(REPO, "dist", "xjs.zip"),
        os.path.join(REPO, "jobs", "daily_ingest.py"),
        "--input", day_input,
        "--out", ingest_out,
        "--filter", "doc_id >= 0",
        "--day", "day0",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    m = json.loads(proc.stdout.strip().splitlines()[-1])
    assert m["n_docs_slice"] == manifest["n_clean"]
    cleaned = spark.read.parquet(os.path.join(ingest_out, "cleaned"))
    assert cleaned.count() == manifest["n_clean"]


def test_cross_day_novelty_chain(spark, sf_dir, run):
    """Two overlapping crawl days: day0 bootstraps the url registry,
    day1 gates against it — day1's novel slice is exactly its urls
    unseen on day0, and the updated registry is the distinct union."""
    base, _, _, _, _ = run
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text", "lang")
    days = [d.filter(F.col("doc_id") < 300),
            d.filter(F.col("doc_id") >= 200)]  # overlap: 200-299
    shard_dirs = []
    for i, day in enumerate(days):
        p = os.path.join(base, f"chain-shards-{i}")
        write_warc_fixture(spark, sf_dir, p, compress=True, df=day)
        shard_dirs.append(p)
    out0 = os.path.join(base, "chain-day0")
    reg0 = os.path.join(base, "chain-reg0")
    bs0 = os.path.join(base, "chain-bloom0")
    p0 = _submit("--input", shard_dirs[0], "--out", out0,
                 "--history-out", reg0, "--bloom-state-out", bs0)
    assert p0.returncode == 0, p0.stderr[-2000:]
    m0 = json.loads(p0.stdout.strip().splitlines()[-1])
    out1 = os.path.join(base, "chain-day1")
    reg1 = os.path.join(base, "chain-reg1")
    bs1 = os.path.join(base, "chain-bloom1")
    # day1 probes the FOLDED day0 bloom state (history never rescanned
    # for the probe) and folds its own urls forward
    p1 = _submit("--input", shard_dirs[1], "--out", out1,
                 "--history-urls", reg0, "--history-out", reg1,
                 "--bloom-state-in", bs0, "--bloom-state-out", bs1)
    assert p1.returncode == 0, p1.stderr[-2000:]
    m1 = json.loads(p1.stdout.strip().splitlines()[-1])
    assert os.path.exists(os.path.join(bs1, "_SUCCESS"))
    # bootstrap registry = day0's distinct clean urls
    clean0 = spark.read.parquet(os.path.join(out0, "clean"))
    clean1 = spark.read.parquet(os.path.join(out1, "clean"))
    assert m0["n_history_urls"] == clean0.select("url").distinct().count()
    # novel = day1 clean minus day0 clean (exact)
    want_novel = clean1.join(clean0.select("url"), "url", "left_anti")
    novel = spark.read.parquet(os.path.join(out1, "novel"))
    assert m1["n_novel"] == want_novel.count() == novel.count()
    assert novel.count() < clean1.count()  # the overlap was caught
    # updated registry = distinct union of both days
    want_reg = clean0.select("url").unionByName(
        clean1.select("url")).distinct()
    assert m1["n_history_urls"] == want_reg.count()
    assert spark.read.parquet(reg1).count() == want_reg.count()


def test_frame_errors_fail_loudly_by_default(run):
    base, _, _, _, _ = run
    broken_dir = os.path.join(base, "broken-shards")
    os.makedirs(broken_dir, exist_ok=True)
    good = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            b"WARC-Record-ID: <urn:x:1>\r\n"
            b"WARC-Target-URI: https://a/1\r\n"
            b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
    with open(os.path.join(broken_dir, "shard-0000.warc"), "wb") as fh:
        fh.write(good + b"garbage that is not a WARC header")
    out_fail = os.path.join(base, "broken-out")
    proc = _submit("--input", broken_dir, "--out", out_fail)
    assert proc.returncode == 4
    assert "XJS_FRAME_ERRORS" in proc.stdout
    assert not os.path.exists(os.path.join(out_fail, "_DONE"))
    # tolerating is an explicit operator decision
    out_ok = os.path.join(base, "broken-out-tolerated")
    proc2 = _submit("--input", broken_dir, "--out", out_ok,
                    "--tolerate-frame-errors")
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    m = json.loads(proc2.stdout.strip().splitlines()[-1])
    assert m["n_frame_errors"] == 1
    assert m["n_clean"] == 1


def test_retraction_chain_with_counting_state(spark, sf_dir, run):
    """Three-day chain with a day-1 takedown: retracted urls leave the
    registry and the counting-bloom state, come back NOVEL when
    recrawled on day 2, and unknown retractions are reported but never
    folded (the underflow guard stays meaningful)."""
    base, _, _, _, _ = run
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text", "lang")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/doc/"),
                   F.col("doc_id").cast("string")).alias("url")
    days = [d.filter(F.col("doc_id") < 300),
            d.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 400)),
            d.filter(((F.col("doc_id") >= 100) & (F.col("doc_id") < 150))
                     | ((F.col("doc_id") >= 250) & (F.col("doc_id") < 260)))]
    shard_dirs = []
    for i, day in enumerate(days):
        p = os.path.join(base, f"retr-shards-{i}")
        write_warc_fixture(spark, sf_dir, p, compress=True, df=day)
        shard_dirs.append(p)
    # takedown list: urls of docs [100, 200) (crawled day 0) + one url
    # never crawled (doc 450) — must surface as retract_unknown
    retr_path = os.path.join(base, "retr-urls")
    d.filter(((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
             | (F.col("doc_id") == 450)).select(url) \
        .write.parquet(retr_path)

    out0, out1, out2 = (os.path.join(base, f"retr-day{i}") for i in range(3))
    reg0, reg1 = (os.path.join(base, f"retr-reg{i}") for i in range(2))
    cs0, cs1, cs2 = (os.path.join(base, f"retr-cs{i}") for i in range(3))
    p0 = _submit("--input", shard_dirs[0], "--out", out0,
                 "--history-out", reg0, "--counting-state-out", cs0)
    assert p0.returncode == 0, p0.stderr[-2000:]
    p1 = _submit("--input", shard_dirs[1], "--out", out1,
                 "--history-urls", reg0, "--history-out", reg1,
                 "--retract-urls", retr_path,
                 "--counting-state-in", cs0, "--counting-state-out", cs1)
    assert p1.returncode == 0, p1.stderr[-2000:]
    m1 = json.loads(p1.stdout.strip().splitlines()[-1])
    clean0 = spark.read.parquet(os.path.join(out0, "clean"))
    clean1 = spark.read.parquet(os.path.join(out1, "clean"))
    retract = spark.read.parquet(retr_path)
    # accounting: known = retracted urls actually in the day-0 registry
    n_known = spark.read.parquet(reg0).join(
        retract, "url", "left_semi").count()
    assert m1["n_retracted"] == n_known > 0
    # unknown = never-registered urls: doc 450 (never crawled) plus
    # the corrupt residues in [100, 200) that were quarantined on day 0
    n_unknown_want = retract.count() - n_known
    assert m1["n_retract_unknown"] == n_unknown_want >= 1
    # day-1 novel = clean1 minus (reg0 MINUS retractions)
    live0 = spark.read.parquet(reg0).join(retract, "url", "left_anti")
    want1 = clean1.join(live0, "url", "left_anti")
    assert m1["n_novel"] == want1.count()
    # registry after day 1 has no retracted url
    assert spark.read.parquet(reg1).join(
        retract, "url", "left_semi").count() == 0

    p2 = _submit("--input", shard_dirs[2], "--out", out2,
                 "--history-urls", reg1,
                 "--counting-state-in", cs1, "--counting-state-out", cs2)
    assert p2.returncode == 0, p2.stderr[-2000:]
    m2 = json.loads(p2.stdout.strip().splitlines()[-1])
    clean2 = spark.read.parquet(os.path.join(out2, "clean"))
    novel2 = spark.read.parquet(os.path.join(out2, "novel"))
    # retracted-and-recrawled urls (100-149, clean residues) are novel
    # again; the 250-259 recrawls are caught as seen — all EXACT vs
    # the day-1 registry even through the counting-bloom probe
    want2 = clean2.join(spark.read.parquet(reg1), "url", "left_anti")
    assert m2["n_novel"] == want2.count() == novel2.count()
    assert novel2.select("url").exceptAll(want2.select("url")).count() == 0
    got_recrawled = novel2.filter(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long") < 150)
    want_recrawled = clean2.filter(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long") < 150)
    assert got_recrawled.count() == want_recrawled.count() > 0
    assert os.path.exists(os.path.join(cs2, "_SUCCESS"))
