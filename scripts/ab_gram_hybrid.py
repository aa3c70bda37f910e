#!/usr/bin/env python3
"""Interleaved A/B for the EDGE-window cutter shapes only: 'hybrid'
(python bounded extraction + Arrow/numpy windowing) vs 'python' (the
r3/r4 per-doc loop, previous edge winner) vs 'native' (full C++ cut,
loses on page docs because Arrow has no bounded split).  Same
min-of-reps interleaving protocol as scripts/ab_gram_native.py.

Writes BENCH/ab_gram_hybrid_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    factor = int(os.environ.get("XJS_BENCH_FACTOR", "200"))
    reps = int(os.environ.get("XJS_AB_REPS", "3"))

    from bench import materialize
    from xjs.pipeline import boilerplate
    from xjs.pipeline.grams import ngram_count_rows, ngram_rows
    from xjs.session import get_spark

    spark = get_spark(
        app_name="xjs-ab-hybrid", cores=cpus, shuffle_partitions=max(cpus, 8)
    )
    wp_path = materialize(spark, sf_dir, factor)
    edge_path = (
        f"{wp_path}-edges-r{boilerplate.EDGE_REPEAT}"
        f"v{boilerplate.EDGE_INJECT_VERSION}"
    )
    if not os.path.exists(os.path.join(edge_path, "_SUCCESS")):
        boilerplate.edge_regime_transform(
            spark.read.parquet(wp_path)
        ).write.mode("overwrite").parquet(edge_path)

    edge = spark.read.parquet(edge_path).select("doc_id", "source", "text")
    impls = ("hybrid", "python", "native")

    def detect_edges(impl):
        return lambda: (
            ngram_count_rows(edge, ["source"], "text", 5, 32, impl=impl)
            .groupBy("source", "gram")
            .agg(F.sum("cnt").alias("n"))
            .count()
        )

    def distinct_rows(impl):
        return lambda: (
            ngram_rows(edge, ["doc_id", "source"], "text", 5, 32, impl=impl)
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("n"))
            .count()
        )

    shapes = {
        "detect_edges_1M_pages": detect_edges,
        "distinct_rows_1M_pages": distinct_rows,
    }

    for impl in impls:  # warm-up
        detect_edges(impl)()

    results: dict[str, dict] = {}
    for name, make in shapes.items():
        samples = {i: [] for i in impls}
        for _ in range(reps):
            for impl in impls:
                t0 = time.perf_counter()
                make(impl)()
                samples[impl].append(round(time.perf_counter() - t0, 3))
        mins = {i: min(samples[i]) for i in impls}
        results[name] = {
            **{f"{i}_min": mins[i] for i in impls},
            "hybrid_vs_python": round(mins["python"] / mins["hybrid"], 2),
            "samples": samples,
        }
        print(name, mins, flush=True)

    out = {
        "protocol": f"interleaved, min of {reps} reps per impl",
        "sf": sf_dir, "factor": factor, "cpus": cpus,
        "results": results,
    }
    with open(os.path.join(REPO, "BENCH", "ab_gram_hybrid_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(
        {k: v["hybrid_vs_python"] for k, v in results.items()}
    ))


if __name__ == "__main__":
    main()
