"""Leakage-safe splits: every near-duplicate component shares one
split, coverage is total, weights land near spec, and a plain doc-hash
split on the same corpus DOES leak (the property the operator buys)."""

import pytest
from pyspark.sql import functions as F

from xjs.pipeline.dedup import dedup_corpus, verified_near_duplicates
from xjs.pipeline.sampling import _md5_variate
from xjs.pipeline.splits import SPLIT_SEED, assign_splits, q_split_leakage_safe


@pytest.fixture(scope="module")
def assigned(spark, sf_dir):
    return q_split_leakage_safe(spark, sf_dir).cache()


def test_total_coverage_one_split_each(spark, sf_dir, assigned):
    corpus = dedup_corpus(spark, sf_dir)
    assert assigned.count() == corpus.count()
    assert assigned.select("doc_id").distinct().count() == corpus.count()
    assert assigned.filter(F.col("split").isNull()).count() == 0


def test_no_cluster_crosses_splits(assigned):
    per_cluster = assigned.groupBy("cluster").agg(
        F.countDistinct("split").alias("n_splits"),
        F.count(F.lit(1)).alias("n"))
    assert per_cluster.filter(F.col("n_splits") > 1).count() == 0
    # the guarantee is non-vacuous: multi-member clusters exist
    assert per_cluster.filter(F.col("n") > 1).count() > 0


def test_weights_land_near_spec(assigned):
    n = assigned.count()
    by = {r.split: r.c for r in assigned.groupBy("split")
          .agg(F.count(F.lit(1)).alias("c")).collect()}
    assert 0.7 < by["train"] / n < 0.9
    assert 0.04 < by["val"] / n < 0.17
    assert 0.04 < by["test"] / n < 0.17


def test_plain_doc_hash_split_would_leak(spark, sf_dir, assigned):
    """The counterfactual: assigning by the DOC id variate instead of
    the cluster id puts at least one near-dup pair across splits on
    this corpus — the contamination this operator exists to prevent."""
    naive_v = F.pmod(_md5_variate(F.col("doc_id"), SPLIT_SEED), F.lit(1000))
    naive = assigned.select(
        "doc_id", "cluster",
        F.when(naive_v < 800, "train").when(naive_v < 900, "val")
        .otherwise("test").alias("split"))
    leaked = naive.groupBy("cluster").agg(
        F.countDistinct("split").alias("n_splits"))
    assert leaked.filter(F.col("n_splits") > 1).count() > 0


def test_deterministic_and_custom_weights(spark, sf_dir):
    corpus = dedup_corpus(spark, sf_dir)
    pairs = verified_near_duplicates(corpus)
    a = assign_splits(corpus, pairs)
    b = assign_splits(corpus.repartition(16), pairs)
    assert a.exceptAll(b).count() == 0
    fifty = assign_splits(corpus, pairs, splits=(("a", 500), ("b", 500)))
    assert fifty.select("split").distinct().count() == 2
    with pytest.raises(AssertionError, match="per-mille"):
        assign_splits(corpus, pairs, splits=(("a", 500), ("b", 400)))
