"""BPE tokenizer artifact: property suite + retrain pin + Spark/
DuckDB-shape integration (r4 verdict gap #1).

The correctness architecture has three independent legs:
1. The shipped priority encoder vs an independently-written
   pass-order encoder (hypothesis, arbitrary byte strings) — this is
   the equivalence that makes the DuckDB recursive-CTE oracle (which
   applies merges in pass order) an exact mirror of the shipped
   encoder.
2. Structural invariants for arbitrary unicode text: round-trip
   (token bytes concat back to the word bytes), count bounds, and
   pre-tokenizer parity with the Catalyst regex.
3. The committed artifact is pinned: retraining from the seeded
   synthetic corpus reproduces it byte-for-byte.
"""

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xjs.pipeline import bpe
from xjs.pipeline.model_artifact import load

MODEL = load(bpe.DEFAULT_BPE)
RANKS = bpe.ranks_of(MODEL)


# ---------------------------------------------------------------------------
# 1. priority == pass-order (the oracle-soundness equivalence)
# ---------------------------------------------------------------------------


@given(st.binary(min_size=1, max_size=24))
@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_priority_equals_pass_order(word):
    assert bpe.encode_word(word, RANKS) == bpe.encode_word_by_passes(
        word, MODEL["merges"]
    )


def test_priority_equals_pass_order_bulk():
    """Dense seeded sweep beyond hypothesis' budget: 5000 random byte
    strings over the full byte range."""
    rng = random.Random(1234)
    for _ in range(5000):
        w = bytes(rng.randrange(0, 256) for _ in range(rng.randrange(1, 20)))
        assert bpe.encode_word(w, RANKS) == bpe.encode_word_by_passes(
            w, MODEL["merges"]
        )


# ---------------------------------------------------------------------------
# 2. structural invariants on arbitrary unicode
# ---------------------------------------------------------------------------


@given(st.text(max_size=120))
@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_roundtrip_and_bounds(text):
    toks = bpe.encode_text(text, RANKS)
    words = bpe.pre_tokens(text)
    # round-trip: token bytes concat to exactly the pre-token stream
    assert b"".join(toks) == b"".join(w.encode("utf-8") for w in words)
    # bounds: one token per pre-token at least, one per byte at most
    n_bytes = sum(len(w.encode("utf-8")) for w in words)
    assert len(words) <= len(toks) <= n_bytes or (not words and not toks)
    # every token is a learned symbol: a single byte or a merge result
    vocab = {a + b for a, b in MODEL["merges"]}
    for t in toks:
        assert len(t) == 1 or t in vocab


@given(st.text(max_size=120))
@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_pretokenizer_drops_only_whitespace(text):
    """The pre-token stream is the input minus ASCII whitespace —
    nothing else is lost (so token billing can't silently drop
    content)."""
    kept = "".join(bpe.pre_tokens(text))
    expect = "".join(c for c in text if c not in " \t\n\x0b\f\r")
    assert kept == expect


def test_count_fn_caches_and_counts():
    fn = bpe.token_count_fn()
    import pandas as pd

    s = pd.Series(["the house market.", "", None, "the the the"])
    out = fn(s)
    assert out.tolist()[0] == len(bpe.encode_text("the house market.", RANKS))
    assert out.tolist()[1] == 0 and out.tolist()[2] == 0
    assert out.dtype == "int64"


# ---------------------------------------------------------------------------
# 3. deterministic retrain pin
# ---------------------------------------------------------------------------


def test_artifact_retrains_identically():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "train_bpe_artifact",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "train_bpe_artifact.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    retrained = bpe.train_bpe(mod.synth_corpus(), n_merges=1000)
    assert retrained["merges"] == MODEL["merges"]
    assert retrained["version"] == MODEL["version"]


def test_trainer_ties_break_lexicographically():
    """The determinism contract: equal-count pairs pick the smallest
    (bytes, bytes) pair, so training is reproducible across python
    hash randomization."""
    m = bpe.train_bpe(["ab cd ab cd"], n_merges=2)
    assert m["merges"][0] == (b"a", b"b")  # tie with (c,d): smallest wins
    assert m["merges"][1] == (b"c", b"d")


# ---------------------------------------------------------------------------
# Spark integration: adapter path + pack twin
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_token_count_real_matches_python(spark, docs):
    got = {
        r.doc_id: r.n_tokens_real
        for r in bpe.token_count_real(docs.limit(60)).collect()
    }
    want = {
        r.doc_id: len(bpe.encode_text(r.text or "", RANKS))
        for r in docs.limit(60).collect()
    }
    assert got == want


def test_pack_bpe_bins_match_counts(spark, docs):
    """pack_sequences_bpe == pack_counts applied to token_count_real
    output: the bin assignment is the proven prefix-sum machinery."""
    from pyspark.sql import functions as F

    from xjs.pipeline.packing import BUDGET, pack_counts

    sub = docs.limit(80)
    got = bpe.pack_sequences_bpe(sub, "lang", "doc_id")
    counts = (
        bpe.token_count_real(sub)
        .withColumnRenamed("n_tokens_real", "n_tokens")
        .join(sub.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", F.col("n_tokens").cast("long").alias("n_tokens"))
    )
    want = pack_counts(counts, "lang", "doc_id", BUDGET)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
