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


def test_evidence_two_stage_cap_hot_key(spark):
    """Round-1 verdict #4: a single Window.partitionBy(key) ships ALL
    rows of a hot key to one reducer before the rn cap.  The two-stage
    version must (a) return the same evidence as the naive window and
    (b) bound the per-(key, salt) bucket at per_key rows."""
    from pyspark.sql.window import Window

    from xjs.checks import uniqueness

    hot = spark.range(20_000).select(
        F.lit("hot").alias("url"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("int").alias("partition_id"),
    )
    normal = spark.createDataFrame(
        [("b", 100_000, 1), ("b", 100_001, 2), ("c", 100_002, 3)],
        "url string, doc_id long, partition_id int",
    )
    df = hot.unionAll(normal)

    out = uniqueness.duplicate_key_evidence(df, "url", "doc_id").collect()
    got = {(r["url"], r["doc_id"], r["n_rows"], r["partition_id"]) for r in out}
    # naive oracle: plain window over the same join
    dups = uniqueness.duplicate_keys(df, "url")
    w = Window.partitionBy("url").orderBy("doc_id")
    naive = {
        (r["url"], r["doc_id"], r["n_rows"], r["partition_id"])
        for r in df.join(dups, "url")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
        .select("url", "n_rows", "doc_id", "partition_id")
        .collect()
    }
    assert got == naive
    assert {(u, d) for u, d, _, _ in got} == {
        ("hot", 0), ("hot", 1), ("hot", 2),
        ("b", 100_000), ("b", 100_001),
    }

    # skew bound: stage 1 never keeps more than per_key rows per
    # (key, salt), so no reducer state exceeds per_key regardless of
    # the hot key's true count
    capped = uniqueness._evidence_stage1(df, "url", "doc_id", per_key=3, n_salts=64)
    max_bucket = (
        capped.groupBy("url", "_salt").count().agg(F.max("count")).first()[0]
    )
    assert max_bucket <= 3
    per_key_rows = capped.groupBy("url").count().agg(F.max("count")).first()[0]
    assert per_key_rows <= 3 * 64


def test_quarantine_partitions_the_input(spark, sf_dir):
    """clean + dirty is a disjoint exact cover of the input; clean
    keeps the input schema; dirty carries sorted check names."""
    from xjs.flagship import compile_plan
    from xjs.runtime import quarantine
    from xjs.sources.webpages import webpages

    wp = webpages(spark, sf_dir)
    clean, dirty = quarantine(wp, compile_plan(wp))
    assert clean.schema == wp.schema
    n = wp.count()
    nc, nd = clean.count(), dirty.count()
    assert nc + nd == n and nd > 0
    clean_ids = {r["url"] for r in clean.select("url").collect()}
    dirty_ids = {r["id"] for r in dirty.select("id").collect()}
    # (dup urls exist: compare as sets of ids per side, no overlap of rows)
    for r in dirty.collect():
        names = r["failed_checks"].split(",")
        assert names == sorted(names) and len(names) == r["n_failed"]
    # a row failing the lang enum is quarantined with that check named
    assert any("lang.enum" in r["failed_checks"] for r in dirty.collect())
    # no id appears on both sides unless the duplicate-url fixture put
    # distinct rows of the same url in different verdict classes
    both = clean_ids & dirty_ids
    dup_urls = {u for (u,) in wp.groupBy("url").count().filter("count > 1")
                .select("url").collect()}
    assert both <= dup_urls


def test_freshness_and_row_count_anomaly(spark, sf_dir):
    from xjs.checks import freshness as fr

    f = {r["partition_id"]: r for r in fr.q_freshness(spark, sf_dir).collect()}
    assert len(f) == 16
    # warc_ts = EPOCH + doc_id seconds; partitions are doc_id % 16, so
    # every partition's max ts is near the corpus max — with as_of at
    # EPOCH+1h and 500 docs (~8 min span) ALL partitions are stale at
    # sf0.001... verify internal consistency instead of absolutes
    for r in f.values():
        assert r["stale"] == (r["lag_seconds"] > fr.MAX_LAG_S)
        assert r["lag_seconds"] >= 0

    rc = {r["partition_id"]: r for r in fr.q_row_count_anomaly(spark, sf_dir).collect()}
    assert len(rc) == 16
    total = sum(r["n_rows"] for r in rc.values())
    for r in rc.values():
        assert abs(r["expected"] - total / 16) < 1e-6
        assert r["anomalous"] == (abs(r["ratio"] - 1) > fr.REL_TOL)
