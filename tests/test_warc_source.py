"""WARC/WET crawl ingestion: the parser must invert the fixture
generator exactly, the gzip (Common-Crawl layout) and plain paths
must agree byte-for-byte, the clean/quarantine split must partition
conversion records exactly, and broken framing must surface as a
ledger row instead of silent truncation."""

import glob
import gzip
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from xjs.sources.warc import (
    CORRUPT_MOD,
    RES_BAD_DATE,
    RES_NO_URI,
    parse_warc_records,
    read_warc_wet,
    split_clean_quarantine,
    write_warc_fixture,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def paths(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="t-warc-", dir=os.path.join(REPO, ".tmp"))
    plain = write_warc_fixture(spark, sf_dir, os.path.join(base, "plain"))
    gz = write_warc_fixture(
        spark, sf_dir, os.path.join(base, "gz"), compress=True)
    yield plain, gz
    shutil.rmtree(base, ignore_errors=True)


def test_split_partitions_conversion_records_exactly(spark, sf_dir, paths):
    plain, _ = paths
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    records = read_warc_wet(spark, plain)
    # every doc is a conversion record; each shard adds one warcinfo
    by_type = {r.warc_type: r.n for r in records.groupBy("warc_type")
               .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_type["conversion"] == n_docs
    assert "__frame_error__" not in by_type
    clean, quarantine = split_clean_quarantine(records)
    assert clean.count() + quarantine.count() == n_docs
    n_no_uri = docs.filter(F.col("doc_id") % CORRUPT_MOD == RES_NO_URI).count()
    n_bad = docs.filter(F.col("doc_id") % CORRUPT_MOD == RES_BAD_DATE).count()
    by_reason = {r.reason: r.n for r in quarantine.groupBy("reason")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_reason == {"missing_uri": n_no_uri, "bad_date": n_bad}


def test_clean_rows_invert_the_generator(spark, sf_dir, paths):
    """text/lang round-trip byte-identically through WARC framing +
    the parser for every clean row; warc_ts follows the stated
    formula."""
    plain, _ = paths
    clean, _ = split_clean_quarantine(read_warc_wet(spark, plain))
    clean = clean.withColumn(
        "doc_id",
        F.regexp_extract("record_id", r"urn:xjs:doc:(\d+)", 1).cast("long"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("text").alias("want_text"),
        F.col("lang").alias("want_lang"))
    j = clean.join(docs, "doc_id")
    assert j.count() == clean.count()
    assert j.filter(
        (F.col("text") != F.col("want_text"))
        | ~F.col("lang").eqNullSafe(F.col("want_lang"))
    ).count() == 0
    assert j.filter(
        F.col("warc_ts") != F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(secs=F.col("doc_id").cast("double"))
    ).count() == 0


def test_gzip_and_plain_shards_parse_identically(spark, paths):
    """The per-record-gzip-member layout (real Common-Crawl shape)
    must yield the exact same record set as uncompressed shards."""
    plain, gz = paths
    assert glob.glob(os.path.join(gz, "*.warc.gz"))
    a = read_warc_wet(spark, plain)
    b = read_warc_wet(spark, gz)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0


def test_quarantine_rows_carry_debuggable_raw(spark, paths):
    plain, _ = paths
    _, quarantine = split_clean_quarantine(read_warc_wet(spark, plain))
    no_uri = quarantine.filter(F.col("reason") == "missing_uri")
    # record identity survives even when the URI is gone
    assert no_uri.filter(~F.col("record_id").rlike("urn:xjs:doc:")).count() == 0
    assert no_uri.filter(F.col("raw") == "<no WARC-Target-URI>").count() \
        == no_uri.count()
    bad = quarantine.filter(F.col("reason") == "bad_date")
    assert bad.filter(F.col("raw") != "not-a-date").count() == 0


def test_frame_error_is_a_ledger_row_not_silent_truncation(tmp_path):
    """A record whose Content-Length header is missing cannot be
    advanced past safely; the parser emits the records BEFORE the
    break plus one __frame_error__ row."""
    good = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            b"WARC-Record-ID: <urn:x:1>\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
    broken = b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\npayload"
    recs = list(parse_warc_records(good + broken))
    assert [r["warc_type"] for r in recs] == ["conversion", "__frame_error__"]
    assert recs[0]["payload"] == b"hi"
    # non-WARC leading bytes are likewise a frame error, not a crash
    recs2 = list(parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\nnope"))
    assert [r["warc_type"] for r in recs2] == ["__frame_error__"]
    assert list(parse_warc_records(b"")) == []
    # a shard cut mid-payload (declared length > remaining bytes) is a
    # ledger row, never a silently short record
    trunc = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
             b"Content-Length: 100\r\n\r\nhi")
    recs3 = list(parse_warc_records(good + trunc))
    assert [r["warc_type"] for r in recs3] == ["conversion",
                                               "__frame_error__"]
    assert b"truncated payload" in recs3[1]["payload"]


def test_response_records_carry_html_binary_byte_exact(spark, sf_dir):
    """Raw-crawl path: response payloads round-trip BYTE-identically
    through HTTP framing + the reader (html as binary, undecoded), and
    status/mime surface from the HTTP head."""
    import tempfile as _tf

    from xjs.pipeline.html import page_corpus
    from xjs.sources.warc import read_warc_responses, write_warc_fixture

    base = _tf.mkdtemp(prefix="t-warc-resp-", dir=os.path.join(REPO, ".tmp"))
    try:
        path = write_warc_fixture(
            spark, sf_dir, os.path.join(base, "resp"), compress=True,
            kind="response")
        recs = read_warc_responses(spark, path)
        got = recs.select(
            F.regexp_extract("record_id", r"urn:xjs:doc:(\d+)", 1)
            .cast("long").alias("doc_id"),
            F.col("html").cast("string").alias("html_str"),
            "status", "mime")
        want = page_corpus(spark, sf_dir).select(
            "doc_id", F.coalesce(F.col("html"), F.lit("")).alias("want"))
        j = got.join(want, "doc_id")
        assert j.count() == got.count() > 0
        assert j.filter(F.col("html_str") != F.col("want")).count() == 0
        assert j.filter(F.col("status") != 200).count() == 0
        assert j.filter(F.col("mime") != "text/html").count() == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_chunked_member_decompress_equals_gzip(paths):
    """The O(n) chunk-fed zlib loop must byte-match gzip.decompress on
    a real multi-member shard (incl. members straddling chunk feeds)."""
    import gzip as _gzip

    from xjs.sources.warc import _decompress

    _, gz = paths
    shard = sorted(glob.glob(os.path.join(gz, "*.warc.gz")))[0]
    with open(shard, "rb") as fh:
        blob = fh.read()
    want = _gzip.decompress(blob)
    assert _decompress(blob) == want
    assert _decompress(blob, chunk=37) == want  # members straddle feeds
    assert _decompress(want) == want  # plain passthrough


def test_fixture_rebuild_is_byte_deterministic(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="t-warc-det-", dir=os.path.join(REPO, ".tmp"))
    try:
        a = write_warc_fixture(spark, sf_dir, os.path.join(base, "a"),
                               compress=True)
        b = write_warc_fixture(spark, sf_dir, os.path.join(base, "b"),
                               compress=True)
        fa = sorted(glob.glob(os.path.join(a, "*.warc.gz")))
        fb = sorted(glob.glob(os.path.join(b, "*.warc.gz")))
        assert len(fa) == len(fb) > 0
        for x, y in zip(fa, fb):
            with open(x, "rb") as fx, open(y, "rb") as fy:
                assert fx.read() == fy.read()
            # and each shard is a valid multi-member gzip stream
            with open(x, "rb") as fx:
                assert gzip.decompress(fx.read()).startswith(b"WARC/1.0\r\n")
    finally:
        shutil.rmtree(base, ignore_errors=True)
