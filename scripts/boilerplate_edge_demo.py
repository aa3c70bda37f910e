#!/usr/bin/env python3
"""Measures the edge-window boilerplate variant on page-length
documents (where it matters).  The bench corpus' ~50-token docs sit
below the edge-window regime, so this demo builds realistic long docs
by concatenating K base texts, then times full-document vs
edge-window gram detection on the same table.

Prints one JSON line; the headline ratio is recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

K = 20            # base docs concatenated per long doc
FACTOR = 40       # replication of the base table before grouping
EDGE_TOKENS = 32


def main() -> None:
    from xjs.pipeline.boilerplate import boilerplate_grams, boilerplate_grams_edges
    from xjs.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bp-edge-demo")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = base.count()
    ids = spark.range(n_base * FACTOR, numPartitions=64).select(
        (F.col("id") % n_base).alias("doc_id"), (F.col("id") / K).cast("long").alias("gid")
    )
    docs = (
        ids.join(F.broadcast(base.select("doc_id", "text", "source")), "doc_id")
        .groupBy("gid")
        .agg(
            F.min("source").alias("source"),
            F.concat_ws(" ", F.collect_list("text")).alias("text"),
        )
    ).persist()
    n_docs = docs.count()
    avg_tokens = docs.select(F.avg(F.size(F.split(F.trim("text"), "\\s+")))).first()[0]

    timings = {}
    for name, q in [
        ("full", boilerplate_grams(docs, "source")),
        ("edges", boilerplate_grams_edges(docs, "source", edge_tokens=EDGE_TOKENS)),
    ]:
        q.count()  # warm
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            q.count()
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
        timings[name] = round(best, 2)

    print(
        json.dumps(
            {
                "n_long_docs": n_docs,
                "avg_tokens_per_doc": round(avg_tokens, 1),
                "edge_tokens": EDGE_TOKENS,
                "sec_full": timings["full"],
                "sec_edges": timings["edges"],
                "speedup": round(timings["full"] / timings["edges"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
