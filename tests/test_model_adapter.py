"""Pluggable text-model hook: the mapInPandas adapter contract
(fn: pd.Series -> pd.Series) that real langid/tokenizer models drop
into (VERDICT r2 next-round #7)."""

from pyspark.sql import functions as F

from xjs.pipeline.text import (
    langid,
    langid_with_model,
    text_model_adapter,
)


def test_adapter_accepts_fake_model(spark):
    """A swapped-in model function is applied batch-vectorized and its
    outputs land under the declared column/type."""
    rows = [(1, "the cat sat"), (2, "der hund lief"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    def fake_model(texts):
        return texts.map(lambda t: "model:" + (t.split()[0] if t else "none"))

    out = {
        r["doc_id"]: r["lang_pred"]
        for r in langid_with_model(df, fake_model).collect()
    }
    assert out == {1: "model:the", 2: "model:der", 3: "model:none"}


def test_adapter_default_matches_catalyst_langid(spark, sf_dir):
    """The default stopword model through the adapter equals the pure
    Catalyst langid() column — the same equality the driver's
    text_langid_model oracle row asserts at sf0.01."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = langid_with_model(d)
    want = d.select("doc_id", langid(F.col("text")).alias("lang_pred"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_adapter_default_nbsp_parity(spark):
    """The default model must tokenize with the Java ASCII \\s class,
    not python's unicode-aware split — 'the\\xa0cat' is ONE token in
    both engines (NBSP is not Java whitespace), so it must not count
    as the stopword 'the'."""
    rows = [
        (1, "the\xa0and\xa0of\xa0to"),      # zero real stopword tokens -> und
        (2, "the and der die und das"),      # de beats en 4:2
        (3, "\tthe is \x0b of"),             # ASCII ws members split fine
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = langid_with_model(df)
    want = df.select("doc_id", langid(F.col("text")).alias("lang_pred"))
    assert {(r["doc_id"], r["lang_pred"]) for r in got.collect()} == {
        (r["doc_id"], r["lang_pred"]) for r in want.collect()
    }
    assert {r["lang_pred"] for r in got.collect() if r["doc_id"] == 1} == {"und"}


def test_adapter_generic_out_type(spark):
    """Non-string outputs (a tokenizer's count) flow through the
    declared out_type."""
    df = spark.createDataFrame([(1, "a b c"), (2, "")], "doc_id bigint, text string")

    def count_model(texts):
        return texts.map(lambda t: len(t.split()) if t else 0)

    out = {
        r["doc_id"]: r["n"]
        for r in text_model_adapter(df, "n", count_model, "bigint").collect()
    }
    assert out == {1: 3, 2: 0}
