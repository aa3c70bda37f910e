#!/usr/bin/env python3
"""Interleaved A/B: gopher_features impl='native' (scan-fused
regexp_count/rlike, no array ever materializes) vs impl='hof' (the
split + higher-order-filter reference form), on the 1M-page multi-line
bench corpus (the line-dedup page transform — the shape whose
line/word features cost something).

Interleaving absorbs host load swings: each rep times both impls
back-to-back; the per-impl number of record is the min across reps
(the BENCH session-minima protocol).  Writes BENCH/ab_gopher_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    factor = int(os.environ.get("XJS_BENCH_FACTOR", "200"))
    reps = int(os.environ.get("XJS_AB_REPS", "3"))

    from bench import force, materialize
    from xjs.pipeline import lines as lines_mod
    from xjs.pipeline.heuristics import gopher_features
    from xjs.session import get_spark

    spark = get_spark(app_name="xjs-ab-gopher", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    wp_path = materialize(spark, sf_dir, factor)
    line_path = f"{wp_path}-lines-v{lines_mod.LINE_SCALE_VERSION}"
    if not os.path.exists(os.path.join(line_path, "_SUCCESS")):
        lines_mod.line_page_transform(
            spark.read.parquet(wp_path).select("doc_id", "text")
        ).write.mode("overwrite").parquet(line_path)
    pages = spark.read.parquet(line_path)
    n = pages.count()

    def run(impl: str) -> float:
        t0 = time.time()
        force(gopher_features(pages, impl=impl)).count()
        return round(time.time() - t0, 3)

    impls = ("arrow", "native", "hof")
    samples: dict[str, list[float]] = {i: [] for i in impls}
    for _ in range(reps):
        for impl in impls:
            samples[impl].append(run(impl))

    # equivalence spot-check rides along (full pin is in tests).  ONE
    # materialized deterministic sample for every impl — an unordered
    # limit() is not guaranteed to pick the same rows across separate
    # evaluations (ADVICE r5)
    sample = pages.orderBy("doc_id").limit(2000).cache()
    sample.count()
    ref = gopher_features(sample, impl="hof")
    same = all(
        gopher_features(sample, impl=i).exceptAll(ref).isEmpty()
        and ref.exceptAll(gopher_features(sample, impl=i)).isEmpty()
        for i in ("arrow", "native")
    )

    mins = {k: min(v) for k, v in samples.items()}
    out = {
        "corpus": {"path": line_path, "n_docs": n},
        "reps": reps,
        "samples": samples,
        "min": mins,
        "speedup_vs_hof": {
            k: round(mins["hof"] / mins[k], 2) for k in impls
        },
        "rows_identical_2000": bool(same),
    }
    path = os.path.join(REPO, "BENCH", "ab_gopher_r5.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["min"]), "speedup", out["speedup_vs_hof"],
          "identical", same)


if __name__ == "__main__":
    main()
