"""Pipeline compositions: cluster/survivor selection, training-set
selection, sessionization."""

from pyspark.sql import functions as F

from xjs.pipeline import clusters, select, sessions
from xjs.pipeline.dedup import dedup_corpus, verified_near_duplicates


def test_clusters_group_injected_duplicates(spark, sf_dir):
    corpus = dedup_corpus(spark, sf_dir)
    pairs = verified_near_duplicates(corpus)
    cc = {r["doc_id"]: r["cluster"] for r in clusters.connected_components(pairs).collect()}
    # doc 0, its exact copy (2M) and near copy (1M) form one cluster
    # rooted at 0
    assert cc[0] == cc[1_000_000] == cc[2_000_000] == 0
    # survivors: exactly one keep per cluster
    surv = clusters.dedup_survivors(corpus, pairs).collect()
    by_cluster = {}
    for r in surv:
        by_cluster.setdefault(r["cluster"], []).append(r["keep"])
    for c, keeps in by_cluster.items():
        assert sum(keeps) == 1


def test_select_training_gates(spark, sf_dir):
    out = select.q_select_training(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_tokens"] >= select.MIN_TOKENS
        assert r["stopword_ratio"] >= select.MIN_STOPWORD_RATIO
    # exact-dup survivors only: no doc_id from the +2M replica range
    assert all(r["doc_id"] < 2_000_000 for r in out)


def test_sessionize(spark, sf_dir):
    out = sessions.q_sessionize_events(spark, sf_dir)
    rows = out.collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        assert r["session_start"] <= r["session_end"]
    # session ids are dense per user starting at 0
    first = min(r["session_id"] for r in rows)
    assert first == 0


def test_connected_components_long_chain(spark):
    """Diameter > MAX_ITERS: pointer jumping must converge in O(log d)
    rounds where plain min-propagation needs O(d) (round-1 verdict #5:
    the old loop silently returned non-converged labels here)."""
    n = 40  # path graph 0-1-2-...-39, diameter 39 > MAX_ITERS=20
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    cc = {r["doc_id"]: r["cluster"] for r in clusters.connected_components(pairs).collect()}
    assert cc == {i: 0 for i in range(n)}


def test_connected_components_nonconvergence_raises(spark):
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        clusters.connected_components(pairs, max_iters=2)


def test_curate_corpus_is_subset_with_gates(spark, sf_dir):
    """The full funnel keeps only exact-survivors that are neither
    substring-duplicates nor contaminated nor low-quality."""
    from pyspark.sql import functions as F

    from xjs.pipeline import select
    from xjs.pipeline.decontam import BENCH_RESIDUE
    from xjs.pipeline.dedup import dedup_corpus, substring_duplicates

    out = select.q_curate_corpus(spark, sf_dir)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept, "funnel must keep something"
    # subset of the quality-only selection
    base = {r["doc_id"] for r in select.q_select_training(spark, sf_dir).collect()}
    assert kept <= base
    # no benchmark docs, no substring duplicates
    assert not any(d % BENCH_RESIDUE == 0 for d in kept)
    corpus = dedup_corpus(spark, sf_dir)
    survivors = corpus.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    dup_ids = {r["doc_id"] for r in substring_duplicates(
        corpus.join(survivors.select("doc_id"), "doc_id")).select("doc_id").collect()}
    assert kept.isdisjoint(dup_ids)
