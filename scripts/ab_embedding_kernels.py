#!/usr/bin/env python3
"""A/B the embedding-family builders (r4 verdict #1) at the
factor-scaled table (default 1M x 64-d distinct vectors):

- 'hof'   = pure-Catalyst higher-order-function fold (the form the
            DuckDB oracles mirror literally; interpreted per element)
- 'pairs' = explicit pairwise shape with the Arrow cosine kernel
            (brute force only: crossJoin then kernel per pair)
- 'arrow' = shipped default: Arrow/numpy kernels; for brute force the
            map-side-combine form (broadcast query set, one corpus
            pass, per-batch local top-k)

All builders are bit-identical (tests/test_similarity_kernels.py), so
this measures constant factor only.  Measurement tool — results are
recorded in BENCH/ab_embedding_r5.json and ROUND5.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def timed(make, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        make().count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main():
    from bench import materialize_embeddings
    from xjs.pipeline import similarity as sim
    from xjs.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    factor = int(os.environ.get("XJS_BENCH_EMB_FACTOR", "500"))
    spark = get_spark(app_name="ab-emb", cores=cpus, shuffle_partitions=max(cpus, 8))
    path = materialize_embeddings(spark, sf_dir, factor)

    def emb():
        return sim.cast_embeddings(spark.read.parquet(path))

    n = emb().count()
    results: dict = {"n_vectors": n, "dim": sim.DIM, "cpus": cpus, "rows": {}}

    def row(name, builders):
        results["rows"][name] = {}
        for b, make in builders.items():
            results["rows"][name][b] = timed(make)
            print(f"{name:24s} {b:6s} {results['rows'][name][b]:8.2f}s", flush=True)

    row("lsh_bucket_16p", {
        "arrow": lambda: emb().select(
            "vec_id", sim._bucket(F.col("emb"), "arrow", 16).alias("b")),
        "hof": lambda: emb().select(
            "vec_id", sim._bucket(F.col("emb"), "hof", 16).alias("b")),
    })
    row("embedding_quality", {
        "arrow": lambda: sim.embedding_quality(
            spark.read.parquet(path), builder="arrow"),
        "hof": lambda: sim.embedding_quality(
            spark.read.parquet(path), builder="hof"),
    })
    row("brute_force_topk", {
        "arrow": lambda: sim.brute_force_topk_df(emb(), "arrow"),
        "pairs": lambda: sim.brute_force_topk_df(emb(), "pairs"),
        "hof": lambda: sim.brute_force_topk_df(emb(), "hof"),
    })
    row("neardup_cap16_16p", {
        "arrow": lambda: sim.embedding_near_duplicates(
            emb(), max_bucket=16, n_planes=16, builder="arrow"),
        "hof": lambda: sim.embedding_near_duplicates(
            emb(), max_bucket=16, n_planes=16, builder="hof"),
    })
    # IVF assign on a slice: one broadcast-assign pass (the kernel
    # under test) without paying full Lloyd iterations at 1M x 3 forms
    def assign(builder):
        e = emb().limit(200_000)
        cent = e.filter(F.col("vec_id") < sim.N_CELLS).select(
            F.col("vec_id").cast("int").alias("cluster"),
            F.col("emb").alias("centroid"),
        )
        return sim._assign(e, cent, builder)

    row("ivf_assign_200k", {
        "arrow": lambda: assign("arrow"),
        "hof": lambda: assign("hof"),
    })

    for name, r in results["rows"].items():
        if "hof" in r and "arrow" in r and r["arrow"] > 0:
            r["speedup_arrow_vs_hof"] = round(r["hof"] / r["arrow"], 2)
    out = os.path.join(REPO, "BENCH", "ab_embedding_r5.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
