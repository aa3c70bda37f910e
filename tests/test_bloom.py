"""Bloom prefilter: no false negatives ever, exactness survives a
deliberately undersized filter (false positives are caught by the
verify join), the measured fpp tracks the sizing formula, and the
distributed build is partitioning-invariant."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xjs.pipeline.bloom import (
    bloom_build,
    bloom_probe,
    novel_keys,
    q_bloom_novel_urls,
)


@pytest.fixture(scope="module")
def keys(spark):
    # 10k member keys and 10k disjoint probe keys, deterministic
    member = spark.range(10_000).select(
        F.concat(F.lit("k-"), F.col("id")).alias("key"))
    other = spark.range(10_000, 20_000).select(
        F.concat(F.lit("k-"), F.col("id")).alias("key"))
    return member.cache(), other.cache()


def test_no_false_negatives(spark, keys):
    member, _ = keys
    bloom = bloom_build(member, "key", n_bits=1 << 17, k=5)
    probed = bloom_probe(member, "key", bloom, n_bits=1 << 17, k=5)
    assert probed.filter(~F.col("bloom_maybe")).count() == 0


def test_fpp_tracks_sizing(spark, keys):
    """~13 bits/key at k=5 targets fpp well under 1e-2; assert an
    order-of-magnitude bound, not the exact constant."""
    member, other = keys
    bloom = bloom_build(member, "key", n_bits=1 << 17, k=5)
    probed = bloom_probe(other, "key", bloom, n_bits=1 << 17, k=5)
    fp = probed.filter(F.col("bloom_maybe")).count()
    assert fp / 10_000 < 0.05


def test_exactness_survives_an_undersized_filter(spark, keys):
    """256 bits for 10k keys -> the filter saturates and nearly every
    probe is a false positive; novel_keys must STILL be exact because
    survivors go through the verify join."""
    member, other = keys
    bloom = bloom_build(member, "key", n_bits=256, k=2)
    probed = bloom_probe(other, "key", bloom, n_bits=256, k=2)
    assert probed.filter(F.col("bloom_maybe")).count() > 9_000  # saturated
    novel = novel_keys(other, member, "key", n_bits=256, k=2)
    assert novel.count() == 10_000
    dup = novel_keys(member, member, "key", n_bits=256, k=2)
    assert dup.count() == 0


def test_prefilter_prunes_the_join_side(spark, keys):
    """The whole point: rows reaching the verify join == true dupes +
    a small fp margin, not the corpus."""
    member, other = keys
    new = member.limit(500).union(other)  # 500 dupes + 10k novel
    bloom = bloom_build(member, "key", n_bits=1 << 17, k=5)
    probed = bloom_probe(new, "key", bloom, n_bits=1 << 17, k=5)
    candidates = probed.filter(F.col("bloom_maybe")).count()
    assert 500 <= candidates <= 500 + 500  # dupes + bounded fp mass
    assert novel_keys(new, member, "key", n_bits=1 << 17, k=5).count() == 10_000


def test_null_keys_never_member_and_never_break_build(spark):
    member = spark.createDataFrame(
        [("a",), (None,), ("b",)], "key string")
    bloom = bloom_build(member, "key", n_bits=1 << 10, k=3)
    probe = spark.createDataFrame(
        [("a",), (None,), ("c",)], "key string")
    rows = {r.key: r.bloom_maybe
            for r in bloom_probe(probe, "key", bloom,
                                 n_bits=1 << 10, k=3).collect()}
    assert rows["a"] is True
    assert rows[None] is False


def test_empty_sides_behave(spark):
    """Empty history -> all-zero filter -> everything novel; empty new
    side -> empty result. Neither crashes the distributed build."""
    member = spark.createDataFrame([], "key string")
    some = spark.range(5).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"))
    bloom = bloom_build(member, "key", n_bits=1 << 10, k=3)
    assert not np.frombuffer(bloom, dtype=np.uint64).any()
    assert novel_keys(some, member, "key", n_bits=1 << 10, k=3).count() == 5
    assert novel_keys(member, some, "key", n_bits=1 << 10, k=3).count() == 0


def test_build_is_partitioning_invariant(spark, keys):
    member, _ = keys
    a = bloom_build(member.coalesce(1), "key", n_bits=1 << 14, k=4)
    b = bloom_build(member.repartition(16), "key", n_bits=1 << 14, k=4)
    assert a == b
    assert np.frombuffer(a, dtype=np.uint64).any()


def test_query_matches_exact_semantics(spark, sf_dir):
    got = q_bloom_novel_urls(spark, sf_dir)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist = d.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    new = d.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    want = new.join(hist, "doc_id", "left_anti")
    assert got.count() == want.count()
    assert got.select("doc_id").exceptAll(want).count() == 0


def test_state_fold_equals_single_pass_build(spark, keys, tmp_path):
    """bloom(A ∪ B ∪ C) == fold of per-slice blooms, bit for bit —
    set union IS bitwise OR; slices may overlap."""
    import os

    from xjs.pipeline.bloom import bloom_build, bloom_from_state, bloom_state_update

    member, _ = keys
    slices = [
        member.filter(F.col("key").substr(3, 1).isin("0", "1", "2")),
        member.filter(F.col("key").substr(3, 1).isin("2", "3", "4", "5")),
        member.filter(~F.col("key").substr(3, 1).isin("0", "1", "2", "3",
                                                      "4", "5")),
    ]
    prev = None
    for i, sl in enumerate(slices):
        d = os.path.join(tmp_path, f"day{i}")
        bloom_state_update(spark, sl, "key", d, prev,
                           n_bits=1 << 14, k=4)
        prev = d
    folded, n_bits, k = bloom_from_state(prev)
    assert (n_bits, k) == (1 << 14, 4)
    assert folded == bloom_build(member, "key", n_bits=1 << 14, k=4)
    # replay is a no-op returning the stored words
    again = bloom_state_update(spark, slices[-1], "key", prev,
                               os.path.join(tmp_path, "day1"),
                               n_bits=1 << 14, k=4)
    assert again == folded


def test_state_fold_rejects_param_mismatch(spark, keys, tmp_path):
    import os

    import pytest as _pytest

    from xjs.pipeline.bloom import bloom_state_update

    member, _ = keys
    d0 = os.path.join(tmp_path, "p0")
    bloom_state_update(spark, member, "key", d0, None, n_bits=1 << 14, k=4)
    with _pytest.raises(ValueError, match="params changed"):
        bloom_state_update(spark, member, "key",
                           os.path.join(tmp_path, "p1"), d0,
                           n_bits=1 << 15, k=4)
