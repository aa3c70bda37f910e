#!/usr/bin/env python3
"""A/B the minhash bucket-cap forms (r3 verdict #1) on the bench
corpus at sf0.1 factor 200: 'window' = COUNT(*) OVER sort-shuffle cap,
'agg' = groupBy count + broadcast anti-join (the verdict's suggestion;
loses — the probe branch recomputes signatures), 'grouped' =
collect_list + local pair explosion (wins; shipped as
dedup.bucket_pairs), 'uncapped' = plain self-join.  Measurement tool
only — results recorded in ROUND4.md / the dedup.py docstring."""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main():
    from bench import materialize
    from xjs.pipeline.dedup import (
        band_keys,
        minhash_signature,
        verified_near_duplicates,
    )
    from xjs.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    factor = int(os.environ.get("XJS_BENCH_FACTOR", "200"))
    spark = get_spark(app_name="ab-minhash", cores=cpus, shuffle_partitions=max(cpus, 8))
    wp_path = materialize(spark, sf_dir, factor)

    def corpus():
        w = spark.read.parquet(wp_path)
        return w.select(F.col("doc_id"), F.col("text"))

    def pipeline(cap_form: str):
        df = corpus()
        survivors = (
            df.groupBy("text")
            .agg(F.min("doc_id").alias("doc_id"))
            .repartition(spark.sparkContext.defaultParallelism)
        )
        sig = survivors.select(
            "doc_id",
            F.posexplode(
                band_keys(minhash_signature(F.col("text"), "native"))
            ).alias("band", "key"),
        ).filter(F.col("key") != "")
        if cap_form == "grouped":
            grouped = (
                sig.groupBy("band", "key")
                .agg(F.collect_list("doc_id").alias("docs"))
                .filter((F.size("docs") >= 2) & (F.size("docs") <= 64))
            )
            docs = F.sort_array(F.col("docs"))
            pair_arr = F.flatten(
                F.transform(
                    docs,
                    lambda x, i: F.transform(
                        F.slice(docs, i + 2, F.size(docs)),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
            pairs = (
                grouped.select(F.explode(pair_arr).alias("p"))
                .select("p.doc_a", "p.doc_b")
                .distinct()
            )
        else:
            if cap_form == "window":
                from pyspark.sql.window import Window

                w = Window.partitionBy("band", "key")
                sig = (
                    sig.withColumn("_bsz", F.count(F.lit(1)).over(w))
                    .filter(F.col("_bsz") <= 64)
                    .drop("_bsz")
                )
            elif cap_form == "agg":
                over = (
                    sig.groupBy("band", "key")
                    .agg(F.count(F.lit(1)).alias("_bsz"))
                    .filter(F.col("_bsz") > 64)
                    .select("band", "key")
                )
                sig = sig.join(F.broadcast(over), ["band", "key"], "left_anti")
            a, b = sig.alias("a"), sig.alias("b")
            pairs = (
                a.join(
                    b,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.key") == F.col("b.key"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
                .distinct()
            )
        from xjs.pipeline.dedup import _tokens, JACCARD_T

        toksets = df.select("doc_id", F.array_distinct(_tokens(F.col("text"))).alias("toks"))
        j = (
            pairs.join(toksets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("toks", "toks_a"), "doc_a")
            .join(toksets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("toks", "toks_b"), "doc_b")
        )
        inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
        union = F.size(F.col("toks_a")) + F.size(F.col("toks_b")) - inter
        jac = F.round(inter.cast("double") / union, 4)
        return j.select("doc_a", "doc_b", jac.alias("jaccard")).filter(F.col("jaccard") >= JACCARD_T)

    # warm-up
    pipeline("agg").count()
    results = {}
    for form in ("window", "grouped", "uncapped") * 3:
        t0 = time.perf_counter()
        n = pipeline(form).count()
        dt = time.perf_counter() - t0
        results.setdefault(form, []).append(round(dt, 3))
        print(f"{form}: {dt:.3f}s rows={n}", flush=True)
    print({k: min(v) for k, v in results.items()})


if __name__ == "__main__":
    main()
