"""WET shard sink: round-trip through both in-repo WARC readers,
assignment equality with shard_assign, byte-determinism, null-url
ledger fidelity, and empty-corpus manifest."""

import glob
import hashlib
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from xjs.pipeline import export
from xjs.sources import warc


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i,
         None if i % 11 == 7 else f"https://src{i % 5}.example.com/doc/{i}",
         f"text body {i} with unicode é中 and \"quotes\"\nline two {i}",
         ["en", "de", None][i % 3])
        for i in range(120)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, url string, text string, lang string"
    )


def _write(spark, corpus, tmp, n_shards=4):
    out = os.path.join(tmp, "wet")
    manifest = export.write_shards_wet(corpus, out, n_shards=n_shards)
    return out, manifest


def test_roundtrip_both_readers(spark, corpus):
    with tempfile.TemporaryDirectory(dir=".tmp") as tmp:
        out, manifest = _write(spark, corpus, tmp)
        src = {r.doc_id: r for r in corpus.collect()}

        for reader in (warc.read_warc_wet,
                       lambda s, p: warc.read_warc_wet_split(
                           s, p, target_split_bytes=1 << 12)):
            recs = reader(spark, out)
            clean, quar = warc.split_clean_quarantine(recs)
            crows = clean.collect()
            # every non-null-url row comes back byte-identical
            assert len(crows) == sum(1 for r in src.values() if r.url is not None)
            for r in crows:
                i = int(r.record_id.split(":")[-1].rstrip(">"))
                assert r.url == src[i].url
                assert r.text == src[i].text
                assert r.lang == ("" if src[i].lang is None else src[i].lang)
            # null-url rows land in quarantine as missing_uri
            qrows = quar.collect()
            assert len(qrows) == sum(1 for r in src.values() if r.url is None)
            assert all(q.reason == "missing_uri" for q in qrows)


def test_assignment_matches_shard_assign(spark, corpus):
    with tempfile.TemporaryDirectory(dir=".tmp") as tmp:
        out, manifest = _write(spark, corpus, tmp)
        expect = {
            r.doc_id: r.shard_id
            for r in export.shard_assign(corpus, n_shards=4).collect()
        }
        got = {}
        for f in glob.glob(os.path.join(out, "shard-*.warc.gz")):
            sid = int(os.path.basename(f)[6:11])
            buf = warc._decompress(open(f, "rb").read())
            for rec in warc.parse_warc_records(buf):
                i = int(rec["record_id"].split(":")[-1].rstrip(">"))
                got[i] = sid
        assert got == expect
        # manifest covers every intended shard, counts match files
        assert set(manifest) == set(range(4))
        assert sum(manifest.values()) == len(expect)


def test_byte_determinism(spark, corpus):
    with tempfile.TemporaryDirectory(dir=".tmp") as t1, \
         tempfile.TemporaryDirectory(dir=".tmp") as t2:
        a, _ = _write(spark, corpus, t1)
        b, _ = _write(spark, corpus.repartition(13), t2)

        def digests(d):
            return {
                os.path.basename(f): hashlib.md5(open(f, "rb").read()).hexdigest()
                for f in glob.glob(os.path.join(d, "*.warc.gz"))
            }

        da, db = digests(a), digests(b)
        assert da == db and len(da) > 0


def test_empty_corpus(spark):
    empty = spark.createDataFrame(
        [], "doc_id long, url string, text string, lang string"
    )
    with tempfile.TemporaryDirectory(dir=".tmp") as tmp:
        out = os.path.join(tmp, "wet")
        manifest = export.write_shards_wet(empty, out, n_shards=3)
        assert manifest == {0: 0, 1: 0, 2: 0}
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        assert glob.glob(os.path.join(out, "*.warc.gz")) == []


def test_ts_col_date_header(spark):
    df = spark.createDataFrame(
        [(1, "https://a.example.com/1", "hello world text.", "en")],
        "doc_id long, url string, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-03-04 05:06:07")))
    with tempfile.TemporaryDirectory(dir=".tmp") as tmp:
        out = os.path.join(tmp, "wet")
        export.write_shards_wet(df, out, n_shards=1, ts_col="warc_ts")
        clean, _ = warc.split_clean_quarantine(warc.read_warc_wet(spark, out))
        row = clean.collect()[0]
        assert str(row.warc_ts) == "2024-03-04 05:06:07"


def test_export_job_wet_format(spark):
    """spark-submit e2e: --format wet writes WET shards + manifest; the
    shards round-trip through read_warc_wet with full doc coverage."""
    import json
    import subprocess

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        ["python", os.path.join(REPO, "scripts", "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    with tempfile.TemporaryDirectory(dir=".tmp") as tmp:
        proc = subprocess.run(
            [
                "/opt/spark/bin/spark-submit",
                "--master", "local[4]",
                "--py-files", os.path.join(REPO, "dist", "xjs.zip"),
                os.path.join(REPO, "jobs", "export_shards.py"),
                "--input", "/root/testdata/sf0.001",
                "--out", tmp,
                "--n-shards", "4",
                "--format", "wet",
            ],
            capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        summary = json.loads(proc.stdout.strip().splitlines()[-1])
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        n = docs.count()
        assert summary["format"] == "wet" and summary["n_docs"] == n

        clean, quar = warc.split_clean_quarantine(
            warc.read_warc_wet(spark, f"{tmp}/shards"))
        assert clean.count() == n and quar.count() == 0
        # text round-trips byte-identical through the job surface
        src = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
        back = {
            int(r.record_id.split(":")[-1].rstrip(">")): r.text
            for r in clean.select("record_id", "text").collect()
        }
        assert back == src
        m = spark.read.parquet(f"{tmp}/manifest")
        assert m.count() == 4
        assert sum(r.n_docs for r in m.collect()) == n


def test_null_id_raises(spark):
    df = spark.createDataFrame(
        [(None, "https://a.example.com/x", "some text", "en")],
        "doc_id long, url string, text string, lang string",
    )
    with tempfile.TemporaryDirectory(dir=".tmp") as tmp:
        with pytest.raises(Exception, match="non-null ids"):
            export.write_shards_wet(df, os.path.join(tmp, "wet"), n_shards=2)


def test_null_ts_lands_in_bad_date_quarantine(spark):
    df = spark.createDataFrame(
        [(1, "https://a.example.com/1", "text one here.", "en",
          "2024-03-04 05:06:07"),
         (2, "https://a.example.com/2", "text two here.", "en", None)],
        "doc_id long, url string, text string, lang string, raw_ts string",
    ).withColumn("warc_ts", F.to_timestamp("raw_ts")).drop("raw_ts")
    with tempfile.TemporaryDirectory(dir=".tmp") as tmp:
        out = os.path.join(tmp, "wet")
        export.write_shards_wet(df, out, n_shards=1, ts_col="warc_ts")
        clean, quar = warc.split_clean_quarantine(warc.read_warc_wet(spark, out))
        crows = clean.collect()
        assert len(crows) == 1 and crows[0].url.endswith("/1")
        q = quar.collect()
        assert len(q) == 1 and q[0].reason == "bad_date"
