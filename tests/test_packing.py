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
