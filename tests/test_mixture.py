"""Mixture sampling: epoch accounting, determinism, replica indexing,
partitioning invariance."""

from collections import Counter

from pyspark.sql import functions as F

from xjs.pipeline.mixture import mixture_sample


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )


def test_integer_epochs_are_exact(spark, sf_dir):
    d = _docs(spark, sf_dir)
    per = Counter(r.source for r in d.collect())
    out = mixture_sample(d, {"src0": 3.0, "src1": 0.0}, default=1.0)
    got = Counter(r.source for r in out.collect())
    assert got["src0"] == 3 * per["src0"]
    assert got["src1"] == 0
    assert got["src2"] == per["src2"]  # default: exactly once


def test_fractional_epochs_expectation(spark, sf_dir):
    d = _docs(spark, sf_dir)
    n = d.filter(F.col("source") == "src0").count()
    got = (
        mixture_sample(d, {"src0": 2.5})
        .filter(F.col("source") == "src0")
        .count()
    )
    mean, sigma = 2.5 * n, (n * 0.25) ** 0.5
    assert abs(got - mean) < 6 * sigma


def test_deterministic_and_partitioning_invariant(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = sorted(mixture_sample(d, {"src0": 1.5, "src1": 0.5}).collect())
    b = sorted(mixture_sample(d, {"src0": 1.5, "src1": 0.5}).collect())
    c = sorted(
        mixture_sample(d.repartition(13), {"src0": 1.5, "src1": 0.5}).collect()
    )
    assert a == b == c


def test_rep_indices_contiguous(spark, sf_dir):
    d = _docs(spark, sf_dir)
    rows = mixture_sample(d, {"src0": 2.5, "src2": 0.5}).collect()
    per = {}
    for r in rows:
        per.setdefault(r.doc_id, []).append(r.rep)
    for doc, reps in per.items():
        assert sorted(reps) == list(range(len(reps))), doc


def test_seed_changes_fractional_picks_only(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = {(r.doc_id, r.rep) for r in mixture_sample(d, {"src0": 2.5}, seed=1).collect()}
    b = {(r.doc_id, r.rep) for r in mixture_sample(d, {"src0": 2.5}, seed=2).collect()}
    # floor copies identical across seeds; only the Bernoulli extras move
    assert a != b
    floor_part = {(i, r) for i, r in a if r < 2}
    assert floor_part == {(i, r) for i, r in b if r < 2}


def test_zero_shuffle_plan(spark, sf_dir):
    d = _docs(spark, sf_dir)
    plan = (
        mixture_sample(d, {"src0": 2.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # narrow: lookup + explode fused into scan
