"""Engine constraint classes over the sf0.001 fixtures (full SQL-oracle
equivalence is exercised by scripts/check_oracles.py; these pin the
known injected-violation counts and structural invariants)."""

from pyspark.sql import functions as F

from xjs.checks import drift, monotonicity, referential, stats, uniqueness
from xjs.sources.webpages import webpages


def test_stats_single_pass_shape(spark, sf_dir):
    df = stats.webpages_stats(spark, sf_dir, mode="exact")
    rows = df.collect()
    assert len(rows) == 16  # N_PARTITIONS
    total = sum(r["n_rows"] for r in rows)
    assert total == 500
    for r in rows:
        assert r["text_len_min"] is not None
        assert r["lang_distinct"] >= 1
        assert r["warc_ts_min"] <= r["warc_ts_max"]


def test_stats_is_single_shuffle(spark, sf_dir):
    df = stats.webpages_stats(spark, sf_dir, mode="approx")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # exactly one shuffle: the groupBy


def test_uniqueness_finds_hot_urls(spark, sf_dir):
    dup = uniqueness.webpages_duplicate_urls(spark, sf_dir).collect()
    # doc_id%50==0 -> 'dup' path; sources alternate src0/src10 -> 2 hot urls
    assert len(dup) == 2
    assert {r["url"] for r in dup} == {
        "https://src0.example.com/doc/dup",
        "https://src10.example.com/doc/dup",
    }
    # 10 docs hit %50==0, but doc 0 also hits %97==0 (htp:// scheme) so
    # its url differs -> 9 rows across the two https dup-urls
    assert sum(r["n_rows"] for r in dup) == 9
    # salt-invariance: different salt counts give identical results
    wp = webpages(spark, sf_dir)
    alt = uniqueness.duplicate_url_sample(wp, "url", n_salts=7).collect()
    assert sorted((r["url"], r["n_rows"]) for r in alt) == sorted(
        (r["url"], r["n_rows"]) for r in dup
    )


def test_referential_broadcast(spark, sf_dir):
    v = referential.webpages_referential_violations(spark, sf_dir)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    rows = v.collect()
    # sources src17/18/19 are denylisted: 25 docs each at sf0.001
    assert len(rows) == 75
    assert {r["domain"] for r in rows} == {
        "src17.example.com", "src18.example.com", "src19.example.com"
    }


def test_drift_psi_self_is_small(spark, sf_dir):
    p = drift.webpages_drift_psi(spark, sf_dir).collect()
    assert len(p) == 16
    # partitions are residue classes of doc_id -> text_len distribution
    # matches the global one up to small-sample noise (~31 docs/partition
    # at sf0.001, so the noise floor is substantial)
    assert all(0 <= r["psi"] < 1.5 for r in p)


def test_drift_detects_shift(spark, sf_dir):
    """Shift one partition's lengths by +300: PSI must single it out."""
    wp = webpages(spark, sf_dir)
    shifted = wp.withColumn(
        "text",
        F.when(F.col("partition_id") == 3, F.concat(F.col("text"), F.lit("x" * 300)))
        .otherwise(F.col("text")),
    )
    h = drift.histogram(shifted, F.length("text"), "partition_id",
                        drift.TEXT_LEN_LO, drift.TEXT_LEN_HI, drift.N_BUCKETS)
    base = drift.webpages_drift_histogram(spark, sf_dir).groupBy("bucket").agg(
        F.sum("n").alias("n")
    )
    p = {r["partition_id"]: r["psi"] for r in drift.psi(h, base, "partition_id", drift.N_BUCKETS).collect()}
    others = [v for k, v in p.items() if k != 3]
    assert p[3] > 1.5
    assert p[3] > 2 * max(others)


def test_ks_bounds(spark, sf_dir):
    h = drift.webpages_drift_histogram(spark, sf_dir)
    base = h.groupBy("bucket").agg(F.sum("n").alias("n"))
    k = drift.ks(h, base, "partition_id", drift.N_BUCKETS).collect()
    assert len(k) == 16
    assert all(0 <= r["ks"] <= 1 for r in k)


def test_monotonicity_counts(spark, sf_dir):
    rows = monotonicity.webpages_ts_monotonicity(spark, sf_dir).collect()
    # doc_id%89==0, doc_id>0: 89,178,267,356,445 -> sources src9,src18,src7,src16,src5
    assert sum(r["n_out_of_order"] for r in rows) == 5
    assert len(rows) == 5
