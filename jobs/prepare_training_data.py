#!/usr/bin/env python3
"""spark-submit entrypoint: the complete training-data PREPARATION
pipeline — everything between a curated crawl and the trainer's input
reader, in one deterministic job:

  1. line-grain dedup: detect corpus-wide duplicated lines, persist
     the duplicate table (production detection-then-clean shape),
     remove every non-owner occurrence, reassemble pages.
  2. exact dedup over the CLEANED text (line removal makes more docs
     byte-identical, so this runs after it).
  3. real-BPE token billing + per-language sequence packing
     (concat-and-chop bins for a fixed context window).
  4. deterministic shuffle-shard export with a written manifest.

Outputs:
    <out>/line_state/  line_md5, n_lines, n_docs, owner_doc, owner_line
    <out>/cleaned/     doc_id, lang, text          (lines removed)
    <out>/survivors/   doc_id, lang, text          (exact-dedup kept)
    <out>/packed/      doc_id, lang, n_tokens, bin_id, bin_offset
    <out>/shards/shard_id=N/ + <out>/manifest/     (survivor corpus)

Example:

    spark-submit --master 'local[8]' --py-files dist/xjs.zip \
        jobs/prepare_training_data.py --input /root/testdata/sf0.001 \
        --out /tmp/xjs-prep --n-shards 8

Scale shape: every stage is the oracle-checked operator it names —
line dedup never shuffles corpus text, exact dedup is one digest
groupBy, BPE billing is a narrow Arrow stage, packing windows carry
scalars only, sharding is one exchange.  The line-duplicate table and
the cleaned corpus are persisted between stages exactly as a 100 TB
run would persist them (each stage re-reads STORED output, so a
failed stage re-runs alone).
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
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("xjs-prepare-training-data").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from xjs.pipeline.bpe import pack_sequences_bpe
    from xjs.pipeline.export import write_manifest, write_shards
    from xjs.pipeline.lines import (
        duplicated_lines,
        line_dedup_remove,
        line_page_transform,
    )

    t0 = time.time()
    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    # the documents table has single-line texts; the page transform is
    # the deterministic multi-line stand-in (bench uses the same one) —
    # point this at a real crawl by replacing the loader
    corpus = line_page_transform(docs.select("doc_id", "text"))

    # 1. line dedup: persist detection output, clean against the STORED
    #    table (stage isolation — the 100 TB shape)
    duplicated_lines(corpus).write.mode("overwrite").parquet(
        f"{args.out}/line_state"
    )
    dups = spark.read.parquet(f"{args.out}/line_state")
    cleaned = line_dedup_remove(corpus, dups=dups).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    cleaned.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "lang", "text"
    ).write.mode("overwrite").parquet(f"{args.out}/cleaned")

    # 2. exact dedup over cleaned text — digest groupBy (32-char md5
    #    shuffles instead of full text, the dedup.exact_duplicates
    #    shape), survivors PERSISTED so stages 3 and 4 re-read stored
    #    output instead of re-running the aggregation
    cl = spark.read.parquet(f"{args.out}/cleaned")
    keep = cl.groupBy(F.md5("text").alias("_dig")).agg(
        F.min("doc_id").alias("doc_id")
    )
    cl.join(keep.select("doc_id"), "doc_id").write.mode("overwrite").parquet(
        f"{args.out}/survivors"
    )
    survivors = spark.read.parquet(f"{args.out}/survivors")

    # 3. real-BPE billing + per-language packing
    packed = pack_sequences_bpe(
        survivors.withColumn("lang", F.coalesce("lang", F.lit("xx"))),
        "lang", "doc_id",
    )
    packed.write.mode("overwrite").parquet(f"{args.out}/packed")

    # 4. shard export of the survivor corpus + manifest from the sink
    write_shards(survivors, f"{args.out}/shards", args.n_shards, args.seed)
    write_manifest(spark, f"{args.out}/shards", f"{args.out}/manifest",
                   args.n_shards)

    pk = spark.read.parquet(f"{args.out}/packed")
    stats = pk.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").alias("tok"),
    ).first()
    sizes = [
        r["n_docs"]
        for r in spark.read.parquet(f"{args.out}/manifest").collect()
    ]
    print(
        json.dumps(
            {
                "job": "prepare_training_data",
                "n_docs_in": docs.count(),
                "n_dup_lines": dups.count(),
                "n_survivors": int(stats["n"]),
                "total_bpe_tokens": int(stats["tok"] or 0),
                "n_shards": len(sizes),
                "min_shard": int(min(sizes or [0])),
                "max_shard": int(max(sizes or [0])),
                "sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
