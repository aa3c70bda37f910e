#!/usr/bin/env python3
"""spark-submit entrypoint: exact-substring span dedup — the full Lee
et al. 2022 pipeline (flag duplicated >=w-token spans against earlier
docs, CUT the spans, keep the rest; whole-doc dropping over-deletes).

    <out>/spans/    doc_id, token_start, token_end   (maximal spans)
    <out>/cleaned/  doc_id, clean_text               (every doc, spans cut)

Example:

    spark-submit --master 'local[8]' --py-files dist/xjs.zip \
        jobs/remove_substring_dups.py --input /root/testdata/sf0.001 \
        --out /tmp/xjs-spans

Scale shape: positioned grams are a narrow Arrow map
(xjs.pipeline.grams.ngram_pos_rows); the min-owner table is the same
linear groupBy+join as substring_duplicates; span merging is
gaps-and-islands under a doc-keyed window (partitions bounded by doc
length); removal joins the small per-doc span arrays on the unique id
and filters tokens in a narrow fold — the corpus text is never
shuffled.  Both operators are oracle-checked (driver rows
substring_spans / substring_remove); the job adds orchestration,
``--hash-mode native`` (8-byte gram keys) and one JSON summary line.
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
    ap.add_argument("--window", type=int, default=None,
                    help="token window width (default dedup.SUBSTR_W)")
    ap.add_argument("--hash-mode", default="native",
                    choices=["native", "portable"])
    args = ap.parse_args()

    spark = SparkSession.builder.appName("xjs-remove-substring-dups").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from xjs.pipeline.dedup import (
        SUBSTR_W,
        dedup_corpus,
        substring_remove,
        substring_spans,
    )

    w = args.window or SUBSTR_W
    t0 = time.time()
    # the documents table has no natural cross-doc repeats; the dedup
    # corpus (injected exact + near copies) is the deterministic
    # stand-in — point this at a real table by replacing the loader
    corpus = dedup_corpus(spark, args.input)

    spans = substring_spans(corpus, w=w, hash_mode=args.hash_mode)
    spans.write.mode("overwrite").parquet(f"{args.out}/spans")

    spans_small = spark.read.parquet(f"{args.out}/spans")
    cleaned = substring_remove(corpus, spans_small)
    cleaned.write.mode("overwrite").parquet(f"{args.out}/cleaned")

    n_docs = spark.read.parquet(f"{args.out}/cleaned").count()
    n_spans = spans_small.count()
    tokens_cut = spans_small.select(
        F.sum(F.col("token_end") - F.col("token_start")).alias("t")
    ).first()["t"] or 0
    print(
        json.dumps(
            {
                "job": "remove_substring_dups",
                "n_docs": n_docs,
                "n_spans": n_spans,
                "tokens_cut": int(tokens_cut),
                "window": w,
                "sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
