#!/usr/bin/env python3
"""A/B: file-grain vs split-within-shard WARC reading on OVERSIZED
shards — the scenario the splitter exists for.

The bench's warc_ingest row uses 64 shards for 1M pages, so file-grain
tasks already saturate local[32].  Here the SAME 1M pages are packed
into N_BIG (default 2) shards: file-grain parallelism collapses to 2
tasks while the splitter keeps ~8 MB byte-range tasks.  Interleaved
reps; equality asserted via count + order-insensitive row hash.

Writes BENCH/ab_warc_split_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

N_BIG = int(os.environ.get("XJS_AB_BIG_SHARDS", "2"))
SPLIT_BYTES = int(os.environ.get("XJS_AB_SPLIT_BYTES", str(8 << 20)))
REPS = int(os.environ.get("XJS_AB_REPS", "3"))


def checksum(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                      for c in df.columns])).cast("decimal(38,0)")
              ).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h)


def main() -> None:
    from bench import materialize
    from xjs.session import get_spark
    from xjs.sources.warc import (
        plan_warc_splits, read_warc_wet, read_warc_wet_split,
        write_warc_fixture,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    factor = int(os.environ.get("XJS_BENCH_FACTOR", "200"))
    spark = get_spark(app_name="ab-warc-split", cores=int(cpus),
                      shuffle_partitions=int(cpus))
    wp_path = materialize(spark, sf_dir, factor)
    big_path = wp_path + f"-warcbig{N_BIG}-v1"
    write_warc_fixture(
        spark, sf_dir, big_path, compress=True,
        df=spark.read.parquet(wp_path).select(
            "doc_id", "source", "text", "lang"),
        n_shards=N_BIG,
    )
    sizes = [os.path.getsize(os.path.join(big_path, f))
             for f in os.listdir(big_path) if f.endswith(".warc.gz")]
    n_ranges = len(plan_warc_splits(spark, big_path, SPLIT_BYTES))
    print(f"shards: {len(sizes)} x ~{sum(sizes)//max(1,len(sizes))//2**20} "
          f"MiB gz; split plan: {n_ranges} ranges", file=sys.stderr)

    variants = {
        "file_grain": lambda: read_warc_wet(spark, big_path),
        "split": lambda: read_warc_wet_split(spark, big_path, SPLIT_BYTES),
    }
    sums = {}
    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(REPS):
        for name, make in variants.items():
            t0 = time.monotonic()
            sums[name] = checksum(make())
            times[name].append(round(time.monotonic() - t0, 3))
    assert sums["file_grain"] == sums["split"], sums
    out = {
        "what": "file-grain vs split-within-shard WARC read, "
                f"1M pages in {N_BIG} gzip shards, local[{cpus}]",
        "shard_bytes_gz": sizes,
        "split_target_bytes": SPLIT_BYTES,
        "n_ranges": n_ranges,
        "times_sec": times,
        "min_sec": {k: min(v) for k, v in times.items()},
        "speedup_min": round(min(times["file_grain"]) /
                             min(times["split"]), 2),
        "rows_and_hash_equal": True,
        "n_records": sums["split"][0],
    }
    with open(os.path.join(REPO, "BENCH", "ab_warc_split_r5.json"),
              "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
