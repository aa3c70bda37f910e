#!/usr/bin/env python3
"""A/B: multi-member gunzip strategies on a real WET shard.

``gzip.decompress`` — and a naive ``decompressobj``/``unused_data``
loop — copy the whole remaining buffer once PER MEMBER, which is
O(n²) in member count.  The shipped chunk-fed loop
(xjs.sources.warc._decompress) bounds every ``unused_data`` copy by
the feed-chunk size.  Writes BENCH/ab_gunzip_r5.json.

Usage: python3 scripts/ab_member_gunzip.py [shard.warc.gz]
(default: the largest cached bench shard, else builds one at sf0.01)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xjs.sources.warc import _decompress  # noqa: E402


def naive_unused_data_loop(data: bytes) -> bytes:
    out = []
    while data:
        d = zlib.decompressobj(31)
        out.append(d.decompress(data))
        data = d.unused_data  # copies the whole remainder per member
    return b"".join(out)


def main() -> None:
    if len(sys.argv) > 1:
        shard = sys.argv[1]
    else:
        cands = sorted(
            glob.glob(os.path.join(REPO, ".tmp", "*warc*", "*.warc.gz")),
            key=os.path.getsize,
        )
        if not cands:
            from xjs.session import get_spark
            from xjs.sources.warc import write_warc_fixture

            spark = get_spark(app_name="ab-gunzip", cores=4,
                              shuffle_partitions=8)
            path = write_warc_fixture(
                spark, "/root/testdata/sf0.01",
                os.path.join(REPO, ".tmp", "ab-gunzip-shards"),
                compress=True)
            spark.stop()
            cands = sorted(glob.glob(os.path.join(path, "*.warc.gz")),
                           key=os.path.getsize)
        shard = cands[-1]

    with open(shard, "rb") as fh:
        blob = fh.read()
    n_members = blob.count(b"\x1f\x8b\x08")  # close enough for reporting

    rows = {}
    want = None
    for name, fn in [("gzip.decompress", gzip.decompress),
                     ("naive_unused_data_loop", naive_unused_data_loop),
                     ("chunked_zlib (shipped)", _decompress)]:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(blob)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        if want is None:
            want = out
        assert out == want, f"{name} output mismatch"
        rows[name] = round(best, 4)

    result = {
        "shard": shard,
        "compressed_mb": round(len(blob) / 1e6, 2),
        "decompressed_mb": round(len(want) / 1e6, 2),
        "approx_members": n_members,
        "best_of_3_sec": rows,
        "speedup_vs_gzip": round(
            rows["gzip.decompress"] / rows["chunked_zlib (shipped)"], 1),
        "note": "all three byte-identical; gzip.decompress and the "
                "naive loop are O(n^2) in member count (whole-remainder "
                "copy per member)",
    }
    out_path = os.path.join(REPO, "BENCH", "ab_gunzip_r5.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
