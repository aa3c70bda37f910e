#!/usr/bin/env python3
"""Interleaved A/B: native (Arrow C++/numpy) gram cutter vs the r3/r4
per-doc Python loop, on the bench corpora (factor-scaled web pages +
page-length edge corpus).  Interleaving absorbs the shared host's load
swings: each rep times both impls back-to-back, and the per-impl number
of record is the min across reps (the same protocol as
scripts/ab_embedding_kernels.py / BENCH session minima).

Writes BENCH/ab_gram_native_r5.json.
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
    from xjs.pipeline.grams import ngram_count_rows, ngram_pos_rows, ngram_rows
    from xjs.session import get_spark

    spark = get_spark(app_name="xjs-ab-grams", cores=cpus, shuffle_partitions=max(cpus, 8))
    wp_path = materialize(spark, sf_dir, factor)
    edge_path = (
        f"{wp_path}-edges-r{boilerplate.EDGE_REPEAT}"
        f"v{boilerplate.EDGE_INJECT_VERSION}"
    )
    if not os.path.exists(os.path.join(edge_path, "_SUCCESS")):
        boilerplate.edge_regime_transform(
            spark.read.parquet(wp_path)
        ).write.mode("overwrite").parquet(edge_path)

    wp = spark.read.parquet(wp_path).select("doc_id", "source", "text")
    edge = spark.read.parquet(edge_path).select("doc_id", "source", "text")

    def detect_edges(impl):
        # the boilerplate_edges detection shape: combine-in-cutter +
        # partial-agg document frequency
        return lambda: (
            ngram_count_rows(edge, ["source"], "text", 5, 32, impl=impl)
            .groupBy("source", "gram")
            .agg(F.sum("cnt").alias("n"))
            .count()
        )

    def detect_full(impl):
        # the boilerplate_grams shape over ~50-token docs
        return lambda: (
            ngram_count_rows(wp, ["source"], "text", 5, None, impl=impl)
            .groupBy("source", "gram")
            .agg(F.sum("cnt").alias("n"))
            .count()
        )

    def pos_cut(impl):
        # the substring-span cutter shape (positions, not distinct);
        # aggregate by gram so the count can't prune the cutter
        return lambda: (
            ngram_pos_rows(wp, ["doc_id"], "text", 8, impl=impl)
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("n"))
            .count()
        )

    def distinct_rows(impl):
        # the decontamination / flag_and_clean cutter shape
        return lambda: (
            ngram_rows(edge, ["doc_id", "source"], "text", 5, 32, impl=impl)
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("n"))
            .count()
        )

    shapes = {
        "detect_edges_1M_pages": detect_edges,
        "detect_full_1M_docs": detect_full,
        "pos_cut_1M_docs": pos_cut,
        "distinct_rows_1M_pages": distinct_rows,
    }

    # warm-up both paths once (JIT + file listing)
    detect_edges("native")()
    detect_edges("python")()

    results: dict[str, dict] = {}
    for name, make in shapes.items():
        samples = {"native": [], "python": []}
        for _ in range(reps):
            for impl in ("native", "python"):
                t0 = time.perf_counter()
                make(impl)()
                samples[impl].append(round(time.perf_counter() - t0, 3))
        results[name] = {
            "native_min": min(samples["native"]),
            "python_min": min(samples["python"]),
            "speedup": round(min(samples["python"]) / min(samples["native"]), 2),
            "samples": samples,
        }
        print(name, results[name]["native_min"], "vs", results[name]["python_min"],
              f'({results[name]["speedup"]}x)', flush=True)

    out = {
        "protocol": f"interleaved, min of {reps} reps per impl",
        "sf": sf_dir, "factor": factor, "cpus": cpus,
        "results": results,
    }
    with open(os.path.join(REPO, "BENCH", "ab_gram_native_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["speedup"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
