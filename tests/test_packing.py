"""Sequence packing semantics on handcrafted docs + invariants on the
real corpus."""

from pyspark.sql import functions as F

from xjs.pipeline.packing import pack_sequences


def test_packing_handcrafted(spark):
    # budget 10; per-stratum concat stream: doc1(4) doc2(8) doc3(3)
    rows = [
        (1, "en", "a b c d"),            # start 0  -> bin 0, offset 0
        (2, "en", "a a a a a a a a"),    # start 4  -> bin 0, offset 4 (straddles)
        (3, "en", "x y z"),              # start 12 -> bin 1, offset 2
        (4, "de", "nur zwei wörter ja"), # own stratum: start 0
        (5, "en", ""),                   # 0 tokens: same start as next doc
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = {
        r["doc_id"]: r
        for r in pack_sequences(df, "lang", "doc_id", budget=10).collect()
    }
    assert (out[1]["bin_id"], out[1]["bin_offset"]) == (0, 0)
    assert (out[2]["bin_id"], out[2]["bin_offset"]) == (0, 4)
    assert (out[3]["bin_id"], out[3]["bin_offset"]) == (1, 2)
    assert (out[4]["bin_id"], out[4]["bin_offset"]) == (0, 0)
    assert out[5]["n_tokens"] == 0


def test_packing_invariants(spark, sf_dir):
    from xjs.pipeline.packing import BUDGET, q_pack_sequences

    out = q_pack_sequences(spark, sf_dir)
    n_docs = out.count()
    assert out.where((F.col("bin_offset") < 0) | (F.col("bin_offset") >= BUDGET)).count() == 0
    # bins are dense per stratum: max bin_id == floor(total_tokens/budget) for
    # the stream start of the last doc
    agg = out.groupBy("lang").agg(
        F.sum("n_tokens").alias("tot"), F.max("bin_id").alias("maxbin")
    )
    for r in agg.collect():
        assert r["maxbin"] <= r["tot"] // BUDGET
    assert n_docs == out.select("doc_id").distinct().count()


def test_packing_single_shuffle(spark, sf_dir):
    from xjs.pipeline.packing import q_pack_sequences

    plan = q_pack_sequences(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1  # one stratum shuffle


def test_packing_global_equals_window_form(spark, sf_dir):
    """The chunked two-stage prefix sum must reproduce the single
    global window exactly — including across chunk boundaries (chunk=16
    forces ~30 boundaries on the 500-doc corpus)."""
    from pyspark.sql import Window

    from xjs.pipeline.packing import BUDGET, pack_sequences_global
    from xjs.pipeline.text import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = pack_sequences_global(docs, "doc_id", chunk=16)

    w = Window.orderBy("doc_id")
    n_tok = token_count(F.col("text")).cast("long")
    start = (F.sum(n_tok).over(w) - n_tok).cast("long")
    want = docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.floor(start / BUDGET).alias("bin_id"),
        (start % BUDGET).alias("bin_offset"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_packing_global_parallel_local_stage(spark, sf_dir):
    """The row-grain local-cumsum window must be partitioned by chunk
    (parallel), never a global single-partition window over the docs."""
    from xjs.pipeline.packing import pack_sequences_global

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        pack_sequences_global(docs, "doc_id", chunk=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only SinglePartition exchange feeds the chunk-grain offsets
    # window (tiny), and the doc-grain window keys on _chunk
    assert "hashpartitioning(_chunk" in plan
