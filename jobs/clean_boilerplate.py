#!/usr/bin/env python3
"""spark-submit entrypoint: per-source boilerplate detection + removal.

The CCNet-style cleaning pass: find the token n-grams each source
repeats across >= 25% of its documents (site headers/footers, cookie
banners, newsletter plugs — searched in the head/tail edge windows
where boilerplate lives), then strip every occurrence from every
document and write the cleaned corpus plus the flagged-gram ledger:

    <out>/cleaned/  doc_id, source, clean_text
    <out>/grams/    source, gram, n_docs_with, n_docs

Example:

    spark-submit --master 'local[8]' --py-files dist/xjs.zip \
        jobs/clean_boilerplate.py --input /root/testdata/sf0.001 \
        --out /tmp/xjs-clean

Scale shape: detection is the Arrow gram cutter (narrow mapInPandas)
into one partial-agg shuffle + broadcast totals; removal broadcasts
the tiny flagged-gram arrays and rewrites text in a narrow map — the
corpus is shuffled zero times end-to-end.  Both operators are
oracle-checked (driver rows boilerplate_grams_edges /
boilerplate_remove); the job adds orchestration and one JSON summary
line.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf dir with documents.parquet")
    ap.add_argument("--out", required=True, help="output dir")
    ap.add_argument("--edge-tokens", type=int, default=32)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("xjs-clean-boilerplate").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from xjs.pipeline.boilerplate import (
        boilerplate_grams_edges,
        boilerplate_remove,
        edge_regime_corpus,
    )

    t0 = time.time()
    # the synthetic documents table has no natural boilerplate; the
    # edge-regime corpus (page-length bodies + injected header/footer)
    # is the deterministic stand-in — point this at a real table by
    # replacing the loader
    corpus = edge_regime_corpus(spark, args.input)

    flagged = boilerplate_grams_edges(
        corpus, "source", edge_tokens=args.edge_tokens
    )
    flagged.write.mode("overwrite").parquet(f"{args.out}/grams")

    flagged_small = spark.read.parquet(f"{args.out}/grams").select("source", "gram")
    cleaned = boilerplate_remove(corpus, flagged_small, "source")
    cleaned.write.mode("overwrite").parquet(f"{args.out}/cleaned")

    n_docs = spark.read.parquet(f"{args.out}/cleaned").count()
    n_grams = flagged_small.count()
    removed = (
        corpus.select(F.sum(F.length("text")).alias("b")).first()["b"]
        - spark.read.parquet(f"{args.out}/cleaned")
        .select(F.sum(F.length("clean_text")).alias("b"))
        .first()["b"]
    )
    print(
        json.dumps(
            {
                "job": "clean_boilerplate",
                "n_docs": n_docs,
                "n_flagged_grams": n_grams,
                "chars_removed": int(removed),
                "sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
