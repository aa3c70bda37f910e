"""Bigram-LM perplexity scoring/filtering: pinned artifact retrain,
handcrafted integer scores, degenerate docs, gate semantics."""

import pickle

from pyspark.sql import functions as F

from xjs.pipeline.lm import DEFAULT_LM, lm_corpus, lm_filter, lm_score
from xjs.pipeline.model_artifact import load


def test_artifact_retrains_byte_identical():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "train_bigram_lm",
        Path(__file__).resolve().parent.parent / "scripts" / "train_bigram_lm.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    retrained = pickle.dumps(mod.train(), protocol=4)
    committed_model = load(DEFAULT_LM)
    assert pickle.dumps(committed_model, protocol=4) == retrained


def test_handcrafted_integer_scores(spark):
    model = load(DEFAULT_LM)
    lp = {(p, w): v for p, w, v in model["bigrams"]}
    (p0, w0), v0 = next(iter(sorted(lp.items())))
    df = spark.createDataFrame(
        [
            (1, f"{p0} {w0}"),              # one known transition
            (2, f"{p0} {w0} zzzunseen"),    # known + OOV
            (3, "solo"),                    # no transitions
            (4, ""),                        # empty
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_transitions, r.lp_sum) for r in lm_score(df).collect()}
    assert got[1] == (1, v0)
    assert got[2] == (2, v0 + model["lp_oov"])
    assert got[3] == (0, 0)
    assert got[4] == (0, 0)


def test_filter_gate_integer_exact(spark):
    import math

    model = load(DEFAULT_LM)
    df = spark.createDataFrame(
        [(1, "zzz yyy xxx www")], "doc_id long, text string"
    )
    # all 3 transitions at the OOV floor: mean lp = lp_oov
    row = lm_filter(df, max_ppl=100.0).first()
    assert row.n_transitions == 3 and row.lp_sum == 3 * model["lp_oov"]
    # floor perplexity ~ e^6.92 >> 100 -> dropped
    assert row.keep is False
    assert math.exp(-model["lp_oov"] / 1e6) > 100
    # generous threshold keeps it
    assert lm_filter(df, max_ppl=1e9).first().keep is True


def test_corpus_gate_drops_exactly_the_noise(spark, sf_dir):
    out = lm_filter(lm_corpus(spark, sf_dir))
    dropped = {r.doc_id for r in out.filter(~F.col("keep")).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    noise = {r.doc_id for r in docs.filter(F.col("doc_id") % 9 == 0).collect()}
    assert dropped == noise and len(noise) > 0


def test_broadcast_lookup_plan(spark, sf_dir):
    plan = (
        lm_score(lm_corpus(spark, sf_dir))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # model table never shuffles the corpus
