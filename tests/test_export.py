"""Deterministic shuffle-shard export: determinism, coverage,
balance, exact-size shards, and the materialized layout."""

import shutil
import tempfile
from collections import Counter

import pytest
from pyspark.sql import functions as F

from xjs.pipeline.export import (
    SHARD_SIZE,
    shard_assign,
    shard_assign_sized,
    write_shards,
)


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp(prefix="xjs-export-", dir="/root/repo/.tmp")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_assign_deterministic_and_total(docs):
    a = sorted(shard_assign(docs, n_shards=8).collect())
    b = sorted(shard_assign(docs, n_shards=8).collect())
    assert a == b
    n = docs.count()
    assert len(a) == n
    assert len({r.doc_id for r in a}) == n  # each doc exactly once


def test_assign_positions_contiguous_per_shard(docs):
    rows = shard_assign(docs, n_shards=8).collect()
    per = {}
    for r in rows:
        per.setdefault(r.shard_id, []).append(r.pos_in_shard)
    for shard, ps in per.items():
        assert sorted(ps) == list(range(len(ps))), shard


def test_assign_balanced(docs):
    sizes = Counter(r.shard_id for r in shard_assign(docs, n_shards=8).collect())
    n = docs.count()
    mean = n / 8
    assert len(sizes) == 8
    # binomial: 6 sigma around n/8 (sigma = sqrt(n * p * (1-p)))
    sigma = (n * (1 / 8) * (7 / 8)) ** 0.5
    for s, c in sizes.items():
        assert abs(c - mean) < 6 * sigma, (s, c)


def test_seed_changes_permutation(docs):
    a = {r.doc_id: (r.shard_id, r.pos_in_shard)
         for r in shard_assign(docs, seed=1).collect()}
    b = {r.doc_id: (r.shard_id, r.pos_in_shard)
         for r in shard_assign(docs, seed=2).collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > len(a) * 0.8  # a different seed reshuffles nearly all


def test_sized_shards_exact(docs):
    n = docs.count()
    rows = shard_assign_sized(docs, shard_size=SHARD_SIZE).collect()
    assert len(rows) == n
    sizes = Counter(r.shard_id for r in rows)
    full, last = divmod(n, SHARD_SIZE)
    for sid in range(full):
        assert sizes[sid] == SHARD_SIZE
    if last:
        assert sizes[full] == last
    # global positions 0..n-1, each exactly once
    gpos = sorted(r.shard_id * SHARD_SIZE + r.pos_in_shard for r in rows)
    assert gpos == list(range(n))


def test_sized_matches_global_sort_order(docs):
    """The two-level rank must equal a literal global sort rank."""
    from xjs.pipeline.export import shard_key

    keyed = docs.select("doc_id", shard_key(F.col("doc_id")).alias("k"))
    order = [r.doc_id for r in keyed.orderBy("k", "doc_id").collect()]
    rows = shard_assign_sized(docs).collect()
    got = {r.shard_id * SHARD_SIZE + r.pos_in_shard: r.doc_id for r in rows}
    assert [got[i] for i in range(len(order))] == order


def test_sized_wider_bucket_prefix_equivalent(docs):
    a = sorted(shard_assign_sized(docs, bucket_hex=1).collect())
    b = sorted(shard_assign_sized(docs, bucket_hex=3).collect())
    assert a == b


def test_write_shards_layout(spark, docs, tmp):
    write_shards(docs, f"{tmp}/shards", n_shards=8)
    back = spark.read.parquet(f"{tmp}/shards")
    assert back.count() == docs.count()
    # shard membership on disk == the assignment operator's
    want = {r.doc_id: r.shard_id for r in shard_assign(docs, n_shards=8).collect()}
    got = {r.doc_id: r.shard_id for r in back.select("doc_id", "shard_id").collect()}
    assert got == want
    # one directory per shard
    disk = {r.shard_id for r in back.select("shard_id").distinct().collect()}
    assert disk == set(range(8))


def test_export_job_spark_submit_deterministic(spark, tmp):
    """spark-submit e2e of the export job: shards + manifest land,
    every doc appears exactly once, membership matches the assignment
    operator, and a second run bit-reproduces the shard contents."""
    import json
    import os
    import subprocess

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        ["python", os.path.join(REPO, "scripts", "make_pyfiles.py")],
        check=True, capture_output=True,
    )

    def run(out):
        proc = subprocess.run(
            [
                "/opt/spark/bin/spark-submit",
                "--master", "local[4]",
                "--py-files", os.path.join(REPO, "dist", "xjs.zip"),
                os.path.join(REPO, "jobs", "export_shards.py"),
                "--input", "/root/testdata/sf0.001",
                "--out", out,
                "--n-shards", "8",
            ],
            capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    s1 = run(f"{tmp}/run1")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    assert s1["n_docs"] == n and s1["n_shards"] == 8
    assert os.path.exists(f"{tmp}/run1/manifest/_SUCCESS")

    back = spark.read.parquet(f"{tmp}/run1/shards")
    assert back.count() == n
    assert back.select("doc_id").distinct().count() == n
    got = {r.doc_id: r.shard_id for r in back.select("doc_id", "shard_id").collect()}
    want = {r.doc_id: r.shard_id
            for r in shard_assign(docs.select("doc_id"), n_shards=8).collect()}
    assert got == want

    s2 = run(f"{tmp}/run2")
    assert s2["n_docs"] == s1["n_docs"]
    a = sorted(spark.read.parquet(f"{tmp}/run1/shards")
               .select("doc_id", "shard_id", "_key").collect())
    b = sorted(spark.read.parquet(f"{tmp}/run2/shards")
               .select("doc_id", "shard_id", "_key").collect())
    assert a == b


def test_composite_identity_spreads_mixture_replicas(spark, sf_dir, docs):
    """Sharding a mixture-expanded corpus on (doc_id, rep) gives each
    replica an independent key — replicas spread across shards instead
    of clumping — while (doc_id, rep) coverage stays exact."""
    from xjs.pipeline.mixture import mixture_sample

    full = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    mix = mixture_sample(full, {"src0": 3.0, "src1": 3.0})
    rows = shard_assign(mix, n_shards=8, id_col=["doc_id", "rep"]).collect()
    # exact coverage: every (doc, rep) exactly once
    pairs = [(r.doc_id, r.rep) for r in rows]
    assert len(pairs) == len(set(pairs)) == mix.count()
    # replicas of tripled docs land in >1 shard for most docs
    per = {}
    for r in rows:
        per.setdefault(r.doc_id, set()).add(r.shard_id)
    tripled = {d: s for d, s in per.items() if len([p for p in pairs if p[0] == d]) == 3}
    clumped = sum(1 for s in tripled.values() if len(s) == 1)
    assert len(tripled) > 0
    assert clumped <= len(tripled) * 0.3  # P(all 3 same shard) = 1/64
    # single-column form unchanged: str and [str] agree
    a = sorted((r.doc_id, r.shard_id, r.pos_in_shard)
               for r in shard_assign(docs, n_shards=8).collect())
    b = sorted((r.doc_id, r.shard_id, r.pos_in_shard)
               for r in shard_assign(docs, n_shards=8, id_col=["doc_id"]).collect())
    assert a == b


def test_null_id_propagates_to_null_key(spark):
    """A NULL id must yield a NULL key (matching the SQL oracle's ||
    semantics), not collapse onto the md5 of the seed alone."""
    from pyspark.sql import functions as F

    from xjs.pipeline.export import shard_key

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    rows = {r.doc_id: r.k for r in df.select(
        "doc_id", shard_key(F.col("doc_id")).alias("k")).collect()}
    assert rows[1] is not None
    assert rows[None] is None


def test_write_shards_jsonl_roundtrip_and_assignment(spark, tmp_path):
    """JSONL sink: same shard assignment as the parquet sink, lines
    parse back byte-faithfully (incl. unicode + null), no plumbing
    columns in the payload."""
    import json as _json

    from xjs.pipeline.export import shard_assign, write_shards_jsonl

    docs = spark.createDataFrame(
        [(1, "plain"), (2, "unicode é中"), (3, None),
         (4, "tab\tand \"quote\"")],
        "doc_id long, text string",
    )
    out = str(tmp_path / "jsonl")
    write_shards_jsonl(docs, out, n_shards=3, seed=7)
    back = spark.read.text(out, pathGlobFilter="*.txt", recursiveFileLookup=False)
    # read with partition discovery so shard_id comes back
    back = spark.read.format("text").load(out)
    rows = back.select("shard_id", "value").collect()
    parsed = {}
    for r in rows:
        d = _json.loads(r["value"])
        parsed[d["doc_id"]] = (int(r["shard_id"]), d.get("text"))
    want = {r["doc_id"]: r["shard_id"] for r in
            shard_assign(docs, n_shards=3, seed=7).collect()}
    assert {k: v[0] for k, v in parsed.items()} == want
    assert parsed[2][1] == "unicode é中"
    assert parsed[4][1] == "tab\tand \"quote\""
    # null field: to_json drops null keys — absent means NULL
    assert parsed[3][1] is None
    # payload carries data only (no _key / shard_id duplicated inside)
    sample = _json.loads(rows[0]["value"])
    assert set(sample.keys()) <= {"doc_id", "text"}
