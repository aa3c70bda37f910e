#!/usr/bin/env python3
"""spark-submit entrypoint: the training-data curation job.

Runs the full curation funnel over the documents table and writes a
training-ready corpus plus a reject ledger that says WHY each dropped
document fell out — the artifact a data-quality review actually needs:

    <out>/corpus/   doc_id, lang, source, text (PII-redacted),
                    n_tokens, quality_score
    <out>/rejects/  doc_id, reason in {exact_duplicate,
                    substring_duplicate, contaminated, benchmark,
                    low_quality}

Example:

    spark-submit --master 'local[8]' --py-files dist/xjs.zip \
        jobs/curate_corpus.py --input /root/testdata/sf0.001 \
        --out /tmp/xjs-curate

The funnel gates are the oracle-checked operators (exact-dup
survivors, substring dedup, decontamination, quality thresholds); the
job adds reason attribution and the redaction pass, prints one JSON
summary line, and is deterministic end-to-end.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf dir with documents.parquet")
    ap.add_argument("--out", required=True, help="output dir")
    ap.add_argument(
        "--gopher-gate", action="store_true",
        help="apply the Gopher quality rules (Rae et al. 2021) after "
             "the generic quality gate; rejects carry "
             "'gopher:<first-failing-rule>'",
    )
    ap.add_argument(
        "--c4-clean", action="store_true",
        help="apply the C4 line rules (Raffel et al. 2020) to surviving "
             "docs: retained lines replace the text, page-rule drops "
             "carry 'c4:<reason>'",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("xjs-curate-corpus").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from xjs.pipeline.decontam import BENCH_RESIDUE, contaminated_docs
    from xjs.pipeline.dedup import substring_duplicates
    from xjs.pipeline.pii import redact
    from xjs.pipeline.select import MIN_STOPWORD_RATIO, MIN_TOKENS
    from xjs.pipeline.text import quality_features

    t0 = time.time()
    docs = spark.read.parquet(f"{args.input}/documents.parquet")

    # funnel with reason attribution (first failing gate wins)
    survivors = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    base = docs.join(survivors.select("doc_id"), "doc_id")
    exact_rej = docs.join(survivors.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", F.lit("exact_duplicate").alias("reason")
    )

    substr_ids = substring_duplicates(base).select("doc_id")
    bench_rej = base.filter(F.col("doc_id") % BENCH_RESIDUE == 0).join(
        substr_ids, "doc_id", "left_anti"
    ).select("doc_id", F.lit("benchmark").alias("reason"))
    substr_rej = substr_ids.select("doc_id", F.lit("substring_duplicate").alias("reason"))

    bench = base.filter(F.col("doc_id") % BENCH_RESIDUE == 0)
    corpus = base.filter(F.col("doc_id") % BENCH_RESIDUE != 0).join(
        substr_ids, "doc_id", "left_anti"
    )
    contam_ids = contaminated_docs(corpus, bench).select("doc_id")
    contam_rej = contam_ids.select("doc_id", F.lit("contaminated").alias("reason"))

    gated = corpus.join(contam_ids, "doc_id", "left_anti")
    feats = quality_features(gated)
    quality_ok = (F.col("n_tokens") >= MIN_TOKENS) & (
        F.col("stopword_ratio") >= MIN_STOPWORD_RATIO
    )
    low_q_rej = feats.filter(~quality_ok).select(
        "doc_id", F.lit("low_quality").alias("reason")
    )
    kept_ids = feats.filter(quality_ok).select("doc_id", "n_tokens", "quality_score")

    rejects = exact_rej.unionByName(substr_rej).unionByName(bench_rej).unionByName(
        contam_rej
    ).unionByName(low_q_rej)

    kept_docs = docs.join(kept_ids, "doc_id")
    if args.gopher_gate:
        from xjs.pipeline.heuristics import gopher_features

        gf = gopher_features(kept_docs.select("doc_id", "text"))
        # null text -> NULL keep (features propagate null); coalesce so
        # such rows are REJECTED with an explicit reason instead of
        # vanishing from the exact accounting
        keep_b = F.coalesce(F.col("keep"), F.lit(False))
        first_fail = F.when(
            F.col("fail_rules") == "", F.lit("null_text")
        ).otherwise(F.split("fail_rules", ",")[0])
        rejects = rejects.unionByName(
            gf.filter(~keep_b).select(
                "doc_id",
                F.concat(F.lit("gopher:"), first_fail).alias("reason"),
            )
        )
        kept_docs = kept_docs.join(
            gf.filter(keep_b).select("doc_id"), "doc_id"
        )
    if args.c4_clean:
        from xjs.pipeline.heuristics import c4_stats

        cs = c4_stats(kept_docs.select("doc_id", "text"))
        rejects = rejects.unionByName(
            cs.filter(~F.col("keep")).select(
                "doc_id",
                F.concat(F.lit("c4:"), F.col("reason")).alias("reason"),
            )
        )
        kept_docs = (
            kept_docs.drop("text")
            .join(
                cs.filter("keep").select(
                    "doc_id", F.col("clean_text").alias("text")
                ),
                "doc_id",
            )
        )

    kept = kept_docs.select(
        "doc_id",
        "lang",
        "source",
        redact(F.col("text")).alias("text"),
        "n_tokens",
        "quality_score",
    )

    kept.write.mode("overwrite").parquet(f"{args.out}/corpus")
    rejects.write.mode("overwrite").parquet(f"{args.out}/rejects")

    reject_counts = {
        r["reason"]: r["n"]
        for r in spark.read.parquet(f"{args.out}/rejects")
        .groupBy("reason").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_kept = spark.read.parquet(f"{args.out}/corpus").count()
    n_in = docs.count()
    summary = {
        "job": "curate_corpus",
        "gates": {"gopher": args.gopher_gate, "c4": args.c4_clean},
        "input_docs": n_in,
        "kept": n_kept,
        "rejects": reject_counts,
        "accounted": n_kept + sum(reject_counts.values()) == n_in,
        "sec": round(time.time() - t0, 2),
    }
    print(json.dumps(summary))
    if not summary["accounted"]:
        sys.exit(2)


if __name__ == "__main__":
    main()
