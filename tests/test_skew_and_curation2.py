"""Salted join equality + spread, weighted sampling statistics,
boilerplate-gram detection on handcrafted groups."""

from pyspark.sql import functions as F

from xjs.pipeline.boilerplate import boilerplate_grams
from xjs.pipeline.sampling import weighted_sample
from xjs.skew import salted_join


def test_salted_join_equals_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    salted = salted_join(orders, customer, "o_custkey", "c_custkey", "o_orderkey")
    plain = orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
    cols = ["o_orderkey", "o_custkey", "c_name"]
    assert salted.select(cols).exceptAll(plain.select(cols)).count() == 0
    assert plain.select(cols).exceptAll(salted.select(cols)).count() == 0


def test_salted_join_spreads_hot_key(spark):
    """A single hot key must land on every salt bucket, not one."""
    fact = spark.range(10_000).select(
        F.lit(7).alias("k"), F.col("id").alias("rid")
    )
    dim = spark.createDataFrame([(7, "hot")], "k bigint, name string")
    out = salted_join(fact, dim, "k", "k", "rid", n_salts=8)
    assert out.count() == 10_000
    n_buckets = (
        fact.withColumn("_s", F.pmod(F.xxhash64("rid"), F.lit(8)))
        .select("_s").distinct().count()
    )
    assert n_buckets == 8  # the hot key's rows scatter across all salts


def test_weighted_sample_rate_tracks_weight(spark):
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    for w, tol in [(0.1, 0.03), (0.5, 0.05), (0.9, 0.05)]:
        kept = weighted_sample(df, "doc_id", F.lit(w)).count() / 20_000
        assert abs(kept - w) < tol, (w, kept)
    # weight 0 keeps nothing; weight 1 keeps everything
    assert weighted_sample(df, "doc_id", F.lit(0.0)).count() == 0
    assert weighted_sample(df, "doc_id", F.lit(1.0)).count() == 20_000


def test_boilerplate_remove_semantics(spark):
    """Flagged grams are stripped literally in ascending gram order;
    docs in groups with no flagged grams pass through unchanged; the
    gram side must broadcast."""
    from pyspark.sql import functions as F2

    from xjs.pipeline.boilerplate import boilerplate_remove

    docs = spark.createDataFrame(
        [
            (1, "s1", "alpha foo bar beta"),
            (2, "s1", "foo bar"),
            (3, "s2", "foo bar untouched"),
        ],
        "doc_id bigint, source string, text string",
    )
    flagged = spark.createDataFrame(
        [("s1", "foo bar")], "source string, gram string"
    )
    out = boilerplate_remove(docs, flagged, "source")
    got = {r["doc_id"]: r["clean_text"] for r in out.collect()}
    assert got == {1: "alpha  beta", 2: "", 3: "foo bar untouched"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_boilerplate_grams_handcrafted(spark):
    footer = "subscribe to our newsletter today"
    rows = (
        [(i, "a", f"unique words number {i} only here " + footer) for i in range(6)]
        + [(9, "a", "no footer in this one document at all")]
        + [(i, "b", f"other group text {i} entirely") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = boilerplate_grams(df, "source", n=5)
    got = {(r["source"], r["gram"]) for r in out.collect()}
    assert ("a", footer) in got  # 6/7 docs >= 25%
    assert not any(s == "b" for s, _ in got)  # no recurring gram in b
    # per-group totals are right
    row = [r for r in out.collect() if r["gram"] == footer][0]
    assert (row["n_docs_with"], row["n_docs"]) == (6, 7)


def test_revenue_star_join_broadcasts(spark, sf_dir):
    from xjs.reports import revenue_by_nation

    df = revenue_by_nation(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2  # both dims broadcast
    assert "SortMergeJoin" not in plan  # fact table never shuffles for joins
    assert df.count() == 25


def test_boilerplate_totals_broadcast(spark, sf_dir):
    from xjs.pipeline.boilerplate import q_boilerplate_grams

    plan = (
        q_boilerplate_grams(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    # gram-side aggregation shuffles; the per-group totals join must not
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_boilerplate_edges_variant(spark):
    """Edge-window variant: identical to the full operator on short
    docs; on long docs it sees edge grams and skips middle grams."""
    from xjs.pipeline.boilerplate import (
        boilerplate_grams,
        boilerplate_grams_edges,
        edge_grams,
    )

    footer = "subscribe to our newsletter today"
    rows = [
        (i, "a", f"unique words number {i} only here " + footer) for i in range(6)
    ] + [(9, "a", "no footer in this one document at all")]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    full = {(r["source"], r["gram"]) for r in boilerplate_grams(df, "source").collect()}
    edge = {
        (r["source"], r["gram"])
        for r in boilerplate_grams_edges(df, "source").collect()
    }
    assert full == edge  # short docs: exact equality

    # long doc: middle grams invisible, edge grams visible
    middle = " ".join(f"m{i}" for i in range(200))
    long_doc = spark.createDataFrame(
        [(1, "x", f"head one two three four {middle} tail five six seven eight")],
        "doc_id bigint, source string, text string",
    )
    grams = long_doc.select(
        F.explode(edge_grams(F.col("text"), 5, 8)).alias("g")
    ).collect()
    gs = {r["g"] for r in grams}
    assert "head one two three four" in gs
    assert "five six seven eight" in " ".join(gs)
    assert not any(g.startswith("m50 ") for g in gs)  # middle skipped


# ---------------------------------------------------------------------------
# fixed-k global sample
# ---------------------------------------------------------------------------


def test_fixed_k_sample_exact_deterministic_partition_invariant(spark, sf_dir):
    from pyspark.sql import functions as F

    from xjs.pipeline.sampling import fixed_k_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang")
    a = fixed_k_sample(d.coalesce(1), "doc_id", 37)
    b = fixed_k_sample(d.repartition(16), "doc_id", 37)
    assert a.count() == b.count() == 37
    assert a.exceptAll(b).count() == 0
    # ranks are 1..k by variate order
    assert sorted(r.sample_rank for r in a.collect()) == list(range(1, 38))
    # k >= N degenerates to the whole table
    n = d.count()
    assert fixed_k_sample(d, "doc_id", n + 50).count() == n
    # different seeds give different samples (same size)
    c = fixed_k_sample(d, "doc_id", 37, seed="other")
    assert c.count() == 37
    assert c.select("doc_id").exceptAll(a.select("doc_id")).count() > 0


def test_fixed_k_sample_plan_is_take_ordered(spark, sf_dir):
    """The scale contract: local k-heaps + bounded merge, never a
    global sort exchange of the corpus."""
    from xjs.pipeline.sampling import fixed_k_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    plan = (
        fixed_k_sample(d, "doc_id", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
