"""Incremental (cross-run) twin of boilerplate detection: both state
tables are pure sums over disjoint-doc slices, so any fold order must
equal the single-pass batch aggregation exactly — and the threshold,
applied at read time, must see the same counts."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from xjs.pipeline.boilerplate import (
    boilerplate_from_state,
    boilerplate_grams_edges,
    boilerplate_remove,
    boilerplate_state_update,
    edge_regime_corpus,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def state_base():
    base = tempfile.mkdtemp(prefix="t-incr-bp-", dir=os.path.join(REPO, ".tmp"))
    yield base
    shutil.rmtree(base, ignore_errors=True)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return edge_regime_corpus(spark, sf_dir)


def _fold(spark, corpus, base, n_slices=3):
    prev = None
    for day in range(n_slices):
        out = os.path.join(base, f"day{day}")
        boilerplate_state_update(
            spark, corpus.filter(F.col("doc_id") % n_slices == day), out, prev
        )
        prev = out
    return prev


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_fold_equals_batch_detection(spark, corpus, state_base):
    final = _fold(spark, corpus, state_base)
    got = boilerplate_from_state(spark, final)
    want = boilerplate_grams_edges(corpus, "source")
    assert _canon(got) == _canon(want)
    assert got.count() > 0


def test_threshold_applies_at_read_time(spark, corpus, state_base):
    """One state serves any tau: a stricter threshold read from the
    same fold equals the batch answer at that threshold (counts in
    state are raw — a baked-in threshold could never fold exactly,
    since a gram can cross tau only after later slices)."""
    final = _fold(spark, corpus, state_base)
    got = boilerplate_from_state(spark, final, thresh_num=9, thresh_den=10)
    want = boilerplate_grams_edges(
        corpus, "source", thresh_num=9, thresh_den=10
    )
    assert _canon(got) == _canon(want)


def test_removal_from_state_equals_batch_removal(spark, corpus, state_base):
    """The state answer is a drop-in for the batch detection snapshot:
    cleaning against it yields byte-identical text."""
    final = _fold(spark, corpus, state_base)
    flagged = boilerplate_from_state(spark, final).select("source", "gram")
    batch_fl = boilerplate_grams_edges(corpus, "source").select("source", "gram")
    a = boilerplate_remove(corpus, flagged, "source")
    b = boilerplate_remove(corpus, batch_fl, "source")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_replay_is_idempotent(spark, corpus, state_base):
    out = os.path.join(state_base, "day0")
    boilerplate_state_update(
        spark, corpus.filter(F.col("doc_id") % 3 == 0), out
    )
    before = _canon(spark.read.parquet(os.path.join(out, "grams")))
    poisoned = spark.createDataFrame(
        [(9_999_999, "srcX", "alpha beta gamma delta epsilon zeta")],
        "doc_id long, source string, text string",
    )
    boilerplate_state_update(spark, poisoned, out)
    assert _canon(spark.read.parquet(os.path.join(out, "grams"))) == before


def test_gram_crossing_threshold_only_after_later_slice(spark, state_base):
    """A gram below tau after slice 1 must flag once slice 2's docs
    push it over — the raw-counts-in-state property, end to end."""
    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    shared = "one two three four five"
    s1 = mk([(1, "s", shared), (2, "s", "a b c d e"), (3, "s", "f g h i j"),
             (4, "s", "k l m n o"), (5, "s", "p q r s t")])  # 1/5 < tau? 1/5 < 1/4
    s2 = mk([(6, "s", shared), (7, "s", shared)])            # now 3/7 >= 1/4
    p1 = os.path.join(state_base, "s1")
    p2 = os.path.join(state_base, "s2")
    boilerplate_state_update(spark, s1, p1)
    after1 = boilerplate_from_state(spark, p1)
    assert after1.filter(F.col("gram") == shared).count() == 0
    boilerplate_state_update(spark, s2, p2, p1)
    after2 = boilerplate_from_state(spark, p2)
    assert after2.filter(F.col("gram") == shared).count() == 1
