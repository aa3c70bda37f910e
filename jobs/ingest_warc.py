#!/usr/bin/env python3
"""spark-submit entrypoint: raw WARC/WET crawl shards -> a validated,
optionally novelty-gated day slice (the pipeline head in front of
jobs/daily_ingest.py).

    spark-submit --master 'local-cluster[4,4,3072]' \
        --py-files dist/xjs.zip \
        jobs/ingest_warc.py \
        --input /data/crawl/2024-01-01 --out /data/slices/day0 \
        [--history-urls /data/state/urls.parquet]

Stages (each its own stored artifact, so a failed stage re-runs alone):

  clean/        conversion records whose URI + WARC-Date parse
  quarantine/   reason-attributed rejects (missing_uri | bad_date)
  novel/        (only with --history-urls) clean rows whose url is
                ABSENT from the history table — bloom prefilter +
                exact anti-join verify of the survivors, so the
                row-bearing shuffle is proportional to the duplicate
                rate, not the crawl

Frame errors (shards whose WARC framing breaks mid-file) are counted
in the manifest and the job FAILS (exit 4) if any appear unless
``--tolerate-frame-errors`` — a framing break means part of a shard
was unreadable, which must be an operator decision, never a default.

The manifest (one JSON line on stdout, also stored) carries exact row
accounting: every parsed record lands in exactly one of the counted
classes.  A completed run (_DONE marker) replays as a no-op with the
stored manifest — the daily_ingest idempotence contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir of .warc/.warc.gz shards")
    ap.add_argument("--out", required=True, help="output slice dir")
    ap.add_argument("--history-urls", default=None,
                    help="parquet with a url column; gate clean rows to "
                         "the novel subset via bloom prefilter + exact "
                         "verify")
    ap.add_argument("--bloom-bits", type=int, default=1 << 23)
    ap.add_argument("--bloom-k", type=int, default=5)
    ap.add_argument("--history-out", default=None,
                    help="write the updated url registry (history ∪ this "
                         "slice's clean urls, distinct) for the NEXT day's "
                         "--history-urls — the cross-day novelty chain")
    ap.add_argument("--bloom-state-in", default=None,
                    help="prior day's folded bloom state: probe with it "
                         "instead of rebuilding the filter from the full "
                         "registry (history is never rescanned for the "
                         "probe; the exact verify join still reads "
                         "--history-urls)")
    ap.add_argument("--bloom-state-out", default=None,
                    help="fold this slice's clean urls into bloom state "
                         "for the NEXT day's --bloom-state-in")
    ap.add_argument("--retract-urls", default=None,
                    help="parquet of urls withdrawn from the registry "
                         "this day (takedowns): they come back NOVEL if "
                         "recrawled, leave --history-out, and fold out "
                         "of the counting state")
    ap.add_argument("--counting-state-in", default=None,
                    help="prior day's counting-bloom state: probe its "
                         "binarized form (supports retraction, unlike "
                         "the OR-folded bit state)")
    ap.add_argument("--counting-state-out", default=None,
                    help="fold this slice's novel urls (+ retractions) "
                         "into counting state for the NEXT day")
    ap.add_argument("--tolerate-frame-errors", action="store_true")
    args = ap.parse_args()

    done = os.path.join(args.out, "_DONE")
    if os.path.exists(done):
        with open(done) as fh:
            print(fh.read().strip())
        return

    spark = SparkSession.builder.appName("xjs-ingest-warc").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from xjs.pipeline.bloom import (
        bloom_from_state,
        bloom_state_update,
        novel_keys,
    )
    from xjs.sources.warc import read_warc_wet, split_clean_quarantine

    t0 = time.perf_counter()
    records = read_warc_wet(spark, args.input)
    # one parse, three consumers -> persist the record set
    records = records.persist()
    by_type = {r["warc_type"]: r["n"] for r in records.groupBy("warc_type")
               .agg(F.count(F.lit(1)).alias("n")).collect()}
    n_frame = by_type.get("__frame_error__", 0)
    if n_frame and not args.tolerate_frame_errors:
        print("XJS_FRAME_ERRORS " + json.dumps(
            {"n_frame_errors": n_frame, "by_type": by_type}))
        sys.exit(4)

    clean, quarantine = split_clean_quarantine(records)
    clean.write.mode("overwrite").parquet(os.path.join(args.out, "clean"))
    quarantine.write.mode("overwrite").parquet(
        os.path.join(args.out, "quarantine"))
    # re-read stored output: downstream counts come from what is ON
    # DISK, and a failed later stage re-runs without re-parsing
    clean_stored = spark.read.parquet(os.path.join(args.out, "clean"))
    n_clean = clean_stored.count()
    reasons = {
        r["reason"]: r["n"]
        for r in spark.read.parquet(os.path.join(args.out, "quarantine"))
        .groupBy("reason").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    # retractions apply to the OLD registry first; today's crawl then
    # re-adds anything it actually recrawled
    retract = None
    n_retracted = n_retract_unknown = None
    if args.retract_urls:
        retract = spark.read.parquet(
            args.retract_urls).select("url").distinct().persist()

    n_novel = None
    if args.history_urls:
        hist = spark.read.parquet(args.history_urls).select("url")
        if retract is not None:
            known = hist.join(retract, "url", "left_semi")
            n_retracted = known.count()  # retraction discipline audit:
            n_retract_unknown = retract.count() - n_retracted
            hist = hist.join(retract, "url", "left_anti")
        n_bits, k, blob = args.bloom_bits, args.bloom_k, None
        if args.counting_state_in:
            from xjs.pipeline.bloom import counting_from_state, counting_to_bits

            counters, n_bits, k = counting_from_state(args.counting_state_in)
            blob = counting_to_bits(counters)
        elif args.bloom_state_in:
            blob, n_bits, k = bloom_from_state(args.bloom_state_in)
        novel = novel_keys(clean_stored, hist, "url",
                           n_bits=n_bits, k=k, bloom=blob)
        novel.write.mode("overwrite").parquet(os.path.join(args.out, "novel"))
        n_novel = spark.read.parquet(os.path.join(args.out, "novel")).count()

    if args.bloom_state_out:
        bloom_state_update(
            spark, clean_stored.select("url"), "url",
            args.bloom_state_out, args.bloom_state_in,
            n_bits=args.bloom_bits, k=args.bloom_k)

    if args.counting_state_out:
        from xjs.pipeline.bloom import counting_state_update

        # adds = the NOVEL slice only (urls not already counted), so
        # the set-registry discipline holds: every live url is counted
        # exactly once and a retraction fully clears it.  removes =
        # retractions verified present in the old registry (unknown
        # retractions are reported, never folded — the underflow guard
        # stays meaningful)
        if args.history_urls:
            adds = spark.read.parquet(
                os.path.join(args.out, "novel")).select("url")
        else:
            adds = clean_stored.select("url")  # bootstrap day
        removes = None
        if retract is not None and args.history_urls:
            removes = spark.read.parquet(args.history_urls) \
                .select("url").join(retract, "url", "left_semi")
        counting_state_update(
            spark, adds, removes, "url",
            args.counting_state_out, args.counting_state_in,
            n_slots=args.bloom_bits, k=args.bloom_k)

    n_history = None
    if args.history_out:
        # registry = everything ever seen; the novel slice suffices on
        # top of old history (clean ∖ novel ⊆ history by definition),
        # but the distinct union is stated directly for auditability
        old = None
        if args.history_urls:
            old = spark.read.parquet(args.history_urls).select("url")
            if retract is not None:
                old = old.join(retract, "url", "left_anti")
        urls = clean_stored.select("url")
        if old is not None:
            urls = urls.unionByName(old)
        urls.distinct().write.mode("overwrite").parquet(args.history_out)
        n_history = spark.read.parquet(args.history_out).count()

    records.unpersist()
    manifest = {
        "job": "ingest_warc",
        "input": args.input,
        "out": args.out,
        "by_type": by_type,
        "n_frame_errors": n_frame,
        "n_clean": n_clean,
        "quarantine": reasons,
        **({"n_novel": n_novel, "history_urls": args.history_urls}
           if args.history_urls else {}),
        **({"n_history_urls": n_history, "history_out": args.history_out}
           if args.history_out else {}),
        **({"bloom_state_out": args.bloom_state_out}
           if args.bloom_state_out else {}),
        **({"n_retracted": n_retracted,
            "n_retract_unknown": n_retract_unknown}
           if args.retract_urls else {}),
        **({"counting_state_out": args.counting_state_out}
           if args.counting_state_out else {}),
        "wall_sec": round(time.perf_counter() - t0, 2),
    }
    line = json.dumps(manifest)
    with open(done, "w") as fh:
        fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
