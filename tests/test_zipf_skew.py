"""Zipf-skew fixture: the claimed skew defenses must actually ENGAGE
on a realistically skewed corpus (plan-level evidence), and engaging
them must not change answers (skewed run == unskewed-oracle run).
VERDICT r4 #5."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from xjs.sources.zipf import zipf_webpages

N_DOCS = 60_000


@pytest.fixture(scope="module")
def zipf_df(spark):
    df = zipf_webpages(spark, N_DOCS, n_domains=500, s=1.1, seed=7)
    df = df.localCheckpoint()  # freeze: one generation, many consumers
    return df


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fixture_zipf_head_and_determinism(spark, zipf_df):
    n = zipf_df.count()
    assert n == N_DOCS
    top = (
        zipf_df.groupBy("domain").count().orderBy(F.desc("count")).first()
    )
    # Zipf(1.1) over 500 ranks: head share = w1/sum(w) ~ 0.147
    assert top["domain"] == "d1.example.com"
    assert 0.10 < top["count"] / n < 0.20
    # deterministic rebuild: row-identical
    again = zipf_webpages(spark, N_DOCS, n_domains=500, s=1.1, seed=7)
    assert zipf_df.exceptAll(again).count() == 0
    assert again.exceptAll(zipf_df).count() == 0
    # a different seed moves docs between domains
    other = zipf_webpages(spark, N_DOCS, n_domains=500, s=1.1, seed=8)
    assert other.exceptAll(zipf_df).count() > 0


def test_aqe_skew_split_engages_on_substring_owner_join(spark, zipf_df):
    """Writing this test surfaced that the owner join's claimed AQE
    cover could never fire: OptimizeSkewedJoin requires BOTH sort-merge
    children to be re-readable ENSURE_REQUIREMENTS shuffle stages, and
    the owner side was Sort←Aggregate←Shuffle.  ``skew_split=True``
    (materialized owner table — the production shape, where owners are
    persisted dedup state) restores eligibility; this test pins, at
    plan level, that on a Zipf corpus whose hot-domain boilerplate
    windows dominate the gram key the split actually happens — and
    that the split answer equals the same query with skew-join
    disabled."""
    from xjs.pipeline.dedup import substring_duplicates

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    # boilerplate-dominated docs: 2 unique tokens + the 24-token domain
    # tail, so the hot domain's shared windows dominate the gram key
    # the way site boilerplate does on a real crawl
    toks = F.split("text", " ")
    docs = zipf_df.select(
        "doc_id",
        F.concat_ws(
            " ", F.element_at(toks, 1), F.element_at(toks, 2),
            F.substring_index("text", " ", -24),
        ).alias("text"),
    ).localCheckpoint()
    try:
        # force the sort-merge path (the 100 TB regime: neither gram
        # side is broadcastable) and lower the skew thresholds to
        # test-corpus scale — production defaults fire at 256 MB
        conf.set("spark.sql.shuffle.partitions", "32")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        flagged = substring_duplicates(docs, w=8, skew_split=True)
        with_skew = flagged.collect()
        plan = _executed_plan(flagged)
        assert "skewed" in plan, f"no skew-split in executed plan:\n{plan}"

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        baseline = substring_duplicates(docs, w=8)
        without = baseline.collect()
        plan_off = _executed_plan(baseline)
        assert "skewed" not in plan_off
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    assert sorted(map(tuple, with_skew)) == sorted(map(tuple, without))
    assert len(with_skew) > 0


def test_minhash_bucket_cap_engages_on_zipf_boilerplate(spark, zipf_df):
    """Head-domain boilerplate makes LSH band buckets genuinely hot;
    the grouped cap must (a) fire — at least one bucket above cap —
    and (b) leave pairs from within-cap buckets untouched vs the
    uncapped run (the cap's documented semantics: drop only oversized
    buckets, never rewrite survivors)."""
    from xjs.pipeline.dedup import (
        band_keys,
        minhash_candidate_pairs,
        minhash_signature,
    )

    # boilerplate-dominated variant on a slice (uncapped pair
    # enumeration below is quadratic in the hot bucket — the very
    # failure mode the cap exists for): near-dup banding keys
    # concentrate on the shared domain tail
    docs = zipf_df.where(F.col("doc_id") < 3000).select(
        "doc_id",
        F.concat_ws(
            " ", F.element_at(F.split("text", " "), 1),
            F.substring_index("text", " ", -24),
        ).alias("text"),
    )
    cap = 32
    sig = docs.select(
        "doc_id",
        F.posexplode(band_keys(minhash_signature(F.col("text")))).alias(
            "band", "key"
        ),
    ).filter(F.col("key") != "")
    sizes = sig.groupBy("band", "key").count()
    assert sizes.where(F.col("count") > cap).count() > 0, (
        "fixture failed to produce an over-cap bucket"
    )
    capped = minhash_candidate_pairs(docs, max_bucket=cap)
    uncapped = minhash_candidate_pairs(docs, max_bucket=None)
    cap_pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    all_pairs = {(r["doc_a"], r["doc_b"]) for r in uncapped.collect()}
    assert cap_pairs < all_pairs  # strictly: hot-bucket pairs dropped
    # independent formulation of the cap semantics (join-based, vs the
    # production collect_list path): pairs sharing >=1 within-cap bucket
    ok = sig.join(
        sizes.where((F.col("count") >= 2) & (F.col("count") <= cap)),
        ["band", "key"],
    )
    a, b = ok.alias("a"), ok.alias("b")
    want_df = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    want = {(r["doc_a"], r["doc_b"]) for r in want_df.collect()}
    assert cap_pairs == want


def test_stratified_salted_rank_dominant_stratum(spark, zipf_df):
    """Two-stage salted rank at a ~15%-of-corpus stratum: exact quota
    per group and byte-identical to the single-window unskewed oracle
    (which a skew-naive engine would compute)."""
    from xjs.pipeline.sampling import id_hash, stratified_quota

    quota = 50
    got = stratified_quota(zipf_df, "domain", "doc_id", quota)
    # single-window oracle: no salting, one reducer per group
    w = Window.partitionBy("domain").orderBy(id_hash(F.col("doc_id")), "doc_id")
    want = (
        zipf_df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    per_group = got.groupBy("domain").count()
    assert per_group.agg(F.max("count")).first()[0] <= quota
    # the dominant stratum really was dominant pre-sample
    assert (
        zipf_df.where(F.col("domain") == "d1.example.com").count()
        > N_DOCS // 10
    )


def test_salted_join_zipf_equals_plain(spark, zipf_df):
    """Salted fact⋈dim join on the Zipf domain key: identical rows to
    the plain equi-join (the unskewed oracle)."""
    from xjs.skew import salted_join

    dim = (
        zipf_df.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("tier", F.when(F.col("n_docs") > 1000, "hot").otherwise("cold"))
    )
    fact = zipf_df.select("doc_id", "domain", "url")
    got = salted_join(fact, dim, "domain", "domain", "doc_id")
    want = fact.join(dim, "domain")
    assert got.count() == want.count() == N_DOCS
    assert got.select(*want.columns).exceptAll(want).count() == 0
