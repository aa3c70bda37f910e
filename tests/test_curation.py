"""Curation ops added in round 2: deterministic sampling, benchmark
decontamination, repetition quality signals, URL canonicalization.

Exact-oracle equivalence runs in scripts/check_oracles.py; these pin
the semantics on handcrafted rows and the determinism / skew-shape
contracts that the oracle compare can't see."""

from pyspark.sql import Row, functions as F

from xjs.pipeline import decontam, sampling, text, urls


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def test_hash_sample_deterministic_across_partitioning(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r["doc_id"] for r in sampling.hash_sample(d, "doc_id", 3, 10).select("doc_id").collect()}
    b = {r["doc_id"] for r in sampling.hash_sample(d.repartition(7), "doc_id", 3, 10).select("doc_id").collect()}
    assert a == b
    n = d.count()
    # deterministic Bernoulli(0.3): residues 0..MOD-1 are near-uniform
    assert 0.15 * n <= len(a) <= 0.45 * n


def test_stratified_quota_bounds_and_determinism(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    out = sampling.stratified_quota(d, "lang", "doc_id", 10)
    per_group = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per_group.items():
        assert n == min(10, sizes[lang])
    # sample_rank is dense 1..k per group
    ranks = out.groupBy("lang").agg(F.sort_array(F.collect_list("sample_rank")).alias("r")).collect()
    for r in ranks:
        assert r["r"] == list(range(1, len(r["r"]) + 1))
    # invariant under input partitioning and salt count (salt-invariance
    # is what makes the two-stage cap a pure optimization)
    again = sampling.stratified_quota(d.repartition(13), "lang", "doc_id", 10, n_salts=5)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_stratified_quota_stage1_caps_hot_group(spark):
    """Skew contract: with one giant group, stage 1 must leave at most
    quota rows per (group, salt) — i.e. the stage-2 window never sees
    more than quota * n_salts rows of the hot group."""
    rows = [Row(g="hot", i=i) for i in range(1000)] + [Row(g="cold", i=i) for i in range(5)]
    df = spark.createDataFrame(rows)
    out = sampling.stratified_quota(df, "g", "i", 3, n_salts=4)
    assert out.filter(F.col("g") == "hot").count() == 3
    # the plan carries two Window nodes (stage-1 salted cap + stage-2 rank)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_decontam_flags_shared_ngrams(spark):
    bench = spark.createDataFrame([Row(doc_id=1, text="alpha beta gamma delta epsilon")])
    corpus = spark.createDataFrame([
        Row(doc_id=10, text="x alpha beta gamma delta y"),      # shares 2 distinct 4-grams? no: 1
        Row(doc_id=11, text="alpha beta gamma delta epsilon z"),  # shares 2
        Row(doc_id=12, text="zeta eta theta iota kappa"),       # clean
        Row(doc_id=13, text="beta gamma delta alpha beta"),     # reordered: no shared 4-gram
    ])
    hits = {r["doc_id"]: r["n_hit_grams"]
            for r in decontam.contaminated_docs(corpus, bench).collect()}
    assert hits == {10: 1, 11: 2}


def test_decontam_benchmark_excluded(spark, sf_dir):
    out = decontam.q_decontaminate(spark, sf_dir)
    assert out.filter(F.col("doc_id") % decontam.BENCH_RESIDUE == 0).count() == 0


def test_decontam_bench_side_is_broadcast(spark, sf_dir):
    plan = decontam.q_decontaminate(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------

def test_repetition_handcrafted(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="x x x x"),
        Row(doc_id=2, text="a b a b a"),
        Row(doc_id=3, text=""),
        Row(doc_id=4, text="p q r s"),
    ])
    out = {r["doc_id"]: r for r in text.repetition_features(df).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 4
    assert r1["dup_token_fraction"] == 0.75
    assert r1["top_bigram_fraction"] == 1.0   # "x x" is all 3 bigrams
    assert r1["max_token_run"] == 4
    r2 = out[2]
    assert r2["dup_token_fraction"] == 0.6    # 1 - 2/5
    assert r2["top_bigram_fraction"] == 0.5   # "a b" twice of 4
    assert r2["max_token_run"] == 1
    r3 = out[3]
    assert (r3["n_tokens"], r3["dup_token_fraction"], r3["top_bigram_fraction"],
            r3["max_token_run"]) == (0, 0.0, 0.0, 0)
    r4 = out[4]
    assert r4["dup_token_fraction"] == 0.0
    assert r4["max_token_run"] == 1


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

def test_canonical_url_handcrafted(spark):
    cases = {
        "https://example.com/a/": "https://example.com/a",
        "HTTP://WWW.EXample.com:80/a?utm_campaign=z": "http://example.com/a",
        "https://example.com/a?fbclid=abc&q=1#frag": "https://example.com/a?q=1",
        "https://example.com:443/a?q=1&utm_source=x": "https://example.com/a?q=1",
        "https://example.com/a": "https://example.com/a",
        "no-scheme/path/": "no-scheme/path",
    }
    df = spark.createDataFrame([Row(u=k) for k in cases])
    got = {r["u"]: r["c"] for r in df.select("u", urls.canonical_url(F.col("u")).alias("c")).collect()}
    assert got == cases


def test_url_canonical_dedup_groups(spark, sf_dir):
    rows = urls.q_url_canonical_dedup(spark, sf_dir).collect()
    assert rows, "injected /doc/dup families must form canonical groups"
    for r in rows:
        assert r["n_rows"] >= 2
        assert "utm_" not in r["canonical_url"]
        assert "#" not in r["canonical_url"]
        assert "://www." not in r["canonical_url"]
    # at least one group exists where messy raw variants collapsed
    assert any(r["n_distinct_raw"] >= 2 for r in rows)


# ---------------------------------------------------------------------------
# domain reputation
# ---------------------------------------------------------------------------

def test_domain_profile_single_aggregation(spark, sf_dir):
    from xjs.pipeline import domains

    out = domains.q_domain_reputation(spark, sf_dir)
    rows = out.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["clean_rate"] <= 1.0
        assert r["n_urls"] <= r["n_docs"]
        assert r["reputable"] == (
            r["clean_rate"] >= domains.MIN_CLEAN_RATE
            and r["mean_quality"] >= domains.MIN_MEAN_QUALITY
        )
    # both verdict classes exist on the injected fixture corpus
    assert {r["reputable"] for r in rows} == {True, False}
    # one aggregate pass: a single shuffle round for the main agg
    # (countDistinct adds the expand two-phase, still one logical agg)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan and "SortMergeJoin" not in plan


def test_bpe_token_count_vs_whitespace(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="Hello, world! It's 42."),
        Row(doc_id=2, text="plain words only here"),
        Row(doc_id=3, text=""),
    ])
    got = {r["doc_id"]: (r["n_ws"], r["n_bpe"]) for r in df.select(
        "doc_id",
        text.token_count(F.col("text")).alias("n_ws"),
        text.token_count_bpe(F.col("text")).alias("n_bpe"),
    ).collect()}
    # "Hello , world ! It ' s 42 ." = 9 BPE-ish tokens vs 4 whitespace
    assert got[1] == (4, 9)
    assert got[2] == (4, 4)
    assert got[3] == (0, 0)


class TestSpanDecontamination:
    def _dfs(self, spark):
        # 5 benchmark tokens -> TWO 4-grams, so adjacent corpus hit
        # windows exist and must merge
        bench = spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                # benchmark 4-gram mid-text: exactly that span cut
                (1, "intro words here alpha beta gamma delta tail words"),
                # two overlapping hit windows merge into one span
                (2, "x alpha beta gamma delta epsilon y"),
                # no hits: text survives (space-normalized contract)
                (3, "totally unrelated content words"),
                # the whole doc is the benchmark text: everything cut
                (4, "alpha beta gamma delta"),
            ],
            "doc_id long, text string",
        )
        return corpus, bench

    def test_spans_and_removal(self, spark):
        from xjs.pipeline.decontam import (
            contaminated_docs,
            contaminated_spans,
            decontaminate_spans,
        )

        corpus, bench = self._dfs(spark)
        spans = {
            r.doc_id: (r.token_start, r.token_end)
            for r in contaminated_spans(corpus, bench).collect()
        }
        # doc 1: tokens 3..6 hit -> one window -> span [3, 7)
        assert spans[1] == (3, 7)
        # doc 2: windows at 1 and 2 merge -> [1, 6)
        assert spans[2] == (1, 6)
        assert 3 not in spans
        assert spans[4] == (0, 4)

        out = {r.doc_id: r.clean_text
               for r in decontaminate_spans(corpus, bench).collect()}
        assert out[1] == "intro words here tail words"
        assert out[2] == "x y"
        assert out[3] == "totally unrelated content words"
        assert out[4] == ""
        # span-flagged docs == doc-grain contaminated docs (consistency)
        hit_docs = {r.doc_id
                    for r in contaminated_docs(corpus, bench).collect()}
        assert hit_docs == set(spans)
