#!/usr/bin/env python3
"""Round-6 measurement harness (bench.py is FROZEN; this file carries
the extra instrumentation the optimization guide §1 asks for).

For each named bench query it:
  - captures ``explain("formatted")`` to plans/r06/<name>_<tag>.txt
  - times it exactly like bench.py (make().count(), best of N)

Usage:
    python3 bench_extra.py [--tag before|after] [--reps 2] [--no-plan] name...
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument(
        "--noop", action="store_true",
        help="time with the noop sink (guide §1.4: every column of every "
        "row computed and discarded) instead of bench.py's count() — for "
        "isolating computation cost from the count path",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    factor = int(os.environ.get("XJS_BENCH_FACTOR", "200"))

    from xjs.session import get_spark

    spark = get_spark(app_name="xjs-bench-extra", cores=cpus,
                      shuffle_partitions=max(cpus, 8))

    import bench

    queries = bench.build_queries(spark, sf_dir, factor)
    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)

    out = {}
    for name in args.names:
        make = queries[name]
        if not args.no_plan:
            df = make()
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            p = os.path.join(REPO, "plans", "r06", f"{name}_{args.tag}.txt")
            with open(p, "w") as fh:
                fh.write(buf.getvalue())
            print(f"# plan -> {p}", file=sys.stderr)
        if args.no_time:
            continue
        samples = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            if args.noop:
                make().write.format("noop").mode("overwrite").save()
            else:
                make().count()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
