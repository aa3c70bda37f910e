#!/usr/bin/env python3
"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "docs_per_sec": ...}

The flagship validation runs over a deterministically scaled web-pages
table (XJS_BENCH_FACTOR x the documents base, default 200) so the
numbers measure sustained per-doc validation throughput, not Spark
fixed overhead.  Engine checks run at the same scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def materialize(spark, sf_dir: str, factor: int) -> str:
    """Write the scaled web-pages table to parquet once (cached across
    bench runs) so every query measures scan + compute — the
    production shape — instead of re-deriving the table inline."""
    import re

    from xjs.sources.webpages import webpages_scaled

    tag = re.sub(r"\W+", "_", sf_dir.strip("/").split("/")[-1])
    path = os.path.join(REPO, ".tmp", f"bench-wp-{tag}-f{factor}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        webpages_scaled(spark, sf_dir, factor).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def materialize_embeddings(spark, sf_dir: str, factor: int) -> str:
    """Write the factor-scaled embeddings table to parquet once (r4
    verdict #1: the base fixture is 2000 vectors — similarity rows
    measured fixture size, not operator cost; at the default factor
    500 the scaled table is 1M distinct 64-d vectors)."""
    import re

    from xjs.pipeline.similarity import EMB_SCALE_VERSION, embeddings_scaled

    tag = re.sub(r"\W+", "_", sf_dir.strip("/").split("/")[-1])
    path = os.path.join(
        REPO, ".tmp", f"bench-emb-{tag}-f{factor}v{EMB_SCALE_VERSION}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        embeddings_scaled(spark, sf_dir, factor).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def force(df):
    """Defeat count()-pruning (r4 honesty fix): for a query ending in
    a pure projection, ``df.count()`` lets Catalyst prune every
    column — the executed plan reads ``struct<>`` straight from
    parquet metadata and the operator under test never runs (audited:
    5 of 26 rows were metadata-only; a terminal aggregate doesn't help
    because the harness's outer count() prunes into it too).  A filter
    on the row hash puts the computation on the CARDINALITY path, so
    counting must evaluate every output column; the sentinel keeps all
    rows short of a 2^-64 collision, and the per-row cost is one
    hash."""
    h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    return df.filter(h != F.lit(42))


def build_queries(spark, sf_dir: str, factor: int):
    """name -> df_factory for the headline set."""
    from xjs.checks import drift, monotonicity, referential, stats, uniqueness
    from xjs.flagship import compile_plan
    from xjs.pipeline import decontam, dedup, sampling, similarity, text, urls
    from xjs.runtime import verdicts, violations

    wp_path = materialize(spark, sf_dir, factor)

    def wp():
        return spark.read.parquet(wp_path)

    def q_violations():
        w = wp()
        return violations(w, compile_plan(w))

    def q_verdicts():
        w = wp()
        return verdicts(w, compile_plan(w))

    def q_stats():
        return stats.column_stats(
            wp().withColumn("text_len", F.length("text")).withColumn(
                "html_bytes", F.octet_length("html")
            ),
            ["partition_id"],
            numeric_cols=["text_len", "html_bytes"],
            categorical_cols=["lang"],
            timestamp_cols=["warc_ts"],
            mode="approx",
        )

    def q_uniqueness():
        return uniqueness.duplicate_url_sample(wp(), "url")

    def q_referential():
        w = wp().withColumn("domain", referential.domain_of(F.col("url")))
        dim = referential.domain_allowlist(spark, sf_dir)
        return referential.missing_keys(w, dim, "domain", "domain").select("url")

    def q_drift():
        h = drift.histogram(
            wp(), F.length("text"), "partition_id",
            drift.TEXT_LEN_LO, drift.TEXT_LEN_HI, drift.N_BUCKETS,
        )
        base = h.groupBy("bucket").agg(F.sum("n").alias("n"))
        return drift.psi(h, base, "partition_id", drift.N_BUCKETS)

    def q_monotonicity():
        return monotonicity.out_of_order(wp(), "source", "doc_id", "warc_ts")

    def q_dedup_minhash():
        # the production composition: exact-dedup (collapses the
        # factor-x replication) -> MinHash-LSH over distinct texts
        docs = wp().select(F.col("doc_id"), F.col("text"))
        return dedup.near_duplicate_pipeline(docs)

    def q_text_quality():
        # force(): terminal projection, count() would prune it all
        return force(text.quality_features(wp().select("doc_id", "text")))

    def q_simhash():
        # collapse-first composition like q_dedup_minhash/q_decontam
        # (production order: signatures over unique texts only); the
        # row was count()-pruned before r4 — the first honest
        # measurement showed full-corpus signatures at ~80us/doc, and
        # the exact-collapse is exactly how production avoids paying
        # that for replicated content
        docs = wp().select("doc_id", "text")
        d = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).repartition(
            spark.sparkContext.defaultParallelism
        )
        return force(
            d.select("doc_id", dedup.simhash_native(F.col("text")).alias("sim"))
        )

    def q_similarity():
        return similarity.brute_force_topk(spark, sf_dir)

    # ---- factor-scaled embedding rows (r4 verdict #1): operator cost
    # at 1M distinct vectors, not the 2000-row fixture.  16 planes is
    # the web-scale bucket knob (expected bucket size N/2^16).
    emb_factor = int(os.environ.get("XJS_BENCH_EMB_FACTOR", "500"))
    emb_path = materialize_embeddings(spark, sf_dir, emb_factor)

    def emb_scaled():
        return similarity.cast_embeddings(spark.read.parquet(emb_path))

    def q_emb_bucket_scaled():
        return force(similarity.lsh_buckets_df(emb_scaled(), n_planes=16))

    def q_emb_quality_scaled():
        return force(
            similarity.embedding_quality(spark.read.parquet(emb_path))
        )

    def q_similarity_topk_scaled():
        return similarity.brute_force_topk_df(emb_scaled())

    def q_emb_neardup_scaled():
        return similarity.embedding_near_duplicates(
            emb_scaled(), max_bucket=16, n_planes=16
        )

    def q_decontam():
        # production composition: exact-collapse first (same first stage
        # as the minhash pipeline — decontamination always runs over the
        # deduplicated corpus), then benchmark-gram broadcast semi-join.
        # The repartition after the collapse is the same load-bearing
        # pin as near_duplicate_pipeline's: AQE coalesces the tiny
        # survivor set by bytes, serializing the compute-heavy gram
        # stage on one core otherwise
        docs = wp().select("doc_id", "text")
        d = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).repartition(
            spark.sparkContext.defaultParallelism
        )
        corpus = d.filter(F.col("doc_id") % decontam.BENCH_RESIDUE != 0)
        bench = d.filter(F.col("doc_id") % decontam.BENCH_RESIDUE == 0)
        return decontam.contaminated_docs(corpus, bench)

    def q_decontam_spans():
        # span-grain removal (splice benchmark-overlapping spans, keep
        # the rest); same collapse-first + repartition pin; force()
        # because the row ends in the narrow splice projection
        docs = wp().select("doc_id", "text")
        d = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).repartition(
            spark.sparkContext.defaultParallelism
        )
        corpus = d.filter(F.col("doc_id") % decontam.BENCH_RESIDUE != 0)
        bench = d.filter(F.col("doc_id") % decontam.BENCH_RESIDUE == 0)
        return force(decontam.decontaminate_spans(corpus, bench))

    def q_substring():
        # collapse-first composition + native hashed gram keys (the
        # 100 TB shape; the portable string-gram path exists for the
        # SQL oracle); repartition pin as in q_decontam
        docs = wp().select("doc_id", "text")
        d = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).repartition(
            spark.sparkContext.defaultParallelism
        )
        return dedup.substring_duplicates(d, hash_mode="native")

    def q_stratified():
        return sampling.stratified_quota(
            wp().select("doc_id", "lang"), "lang", "doc_id", 1000
        )

    def q_canonical():
        return urls.canonical_groups(
            wp().select("doc_id", "url"), "url", "doc_id"
        )

    def q_pii():
        from xjs.pipeline import pii

        return force(pii.pii_scan(wp().select("doc_id", "text")))

    def q_heavy():
        from xjs.pipeline import heavy

        w = wp().withColumn("domain", referential.domain_of(F.col("url")))
        return heavy.heavy_hitters(w, "domain")

    def q_asof():
        from xjs.pipeline import asof

        return asof.q_asof_clicks(spark, sf_dir)

    def q_pack():
        from xjs.pipeline import packing

        w = wp().withColumn("lang2", F.coalesce(F.col("lang"), F.lit("xx")))
        return force(packing.pack_sequences(w, "lang2", "doc_id"))

    def q_pack_global():
        from xjs.pipeline import packing

        return packing.pack_sequences_global(wp(), "doc_id")

    def q_boilerplate():
        from xjs.pipeline import boilerplate

        return boilerplate.boilerplate_grams(
            wp().select("source", "text"), "source"
        )

    # edge-regime corpus (page-length docs): materialized once so the
    # bench measures the boilerplate operator, not corpus synthesis.
    # Cache path keyed on the transform parameters (ADVICE r3): if
    # EDGE_REPEAT or the injected text changes, the tag changes and the
    # corpus rebuilds instead of silently benchmarking stale data.
    from xjs.pipeline import boilerplate

    edge_path = (
        f"{wp_path}-edges-r{boilerplate.EDGE_REPEAT}"
        f"v{boilerplate.EDGE_INJECT_VERSION}"
    )
    if not os.path.exists(os.path.join(edge_path, "_SUCCESS")):
        boilerplate.edge_regime_transform(
            spark.read.parquet(wp_path)
        ).write.mode("overwrite").parquet(edge_path)

    def q_boilerplate_edges():
        return boilerplate.boilerplate_grams_edges(
            spark.read.parquet(edge_path).select("source", "text"), "source"
        )

    # flagged-gram table: stored once, like any production pipeline
    # stores detection output before running the cleaning pass.  r5
    # re-scope (VERDICT r4 #6): the old compose row re-ran detection
    # inside the removal row, double-pricing the aggregates the
    # boilerplate_edges row already measures ("detection's aggregates
    # are shared with the already-priced boilerplate_edges row").  The
    # remove row now prices the cleaning increment over STORED
    # detection output — the two-pass-over-stored-data production
    # shape.  Cache keyed like the edge corpus so parameter changes
    # rebuild it.
    flagged_path = edge_path + "-flagged"
    if not os.path.exists(os.path.join(flagged_path, "_SUCCESS")):
        boilerplate.boilerplate_grams_edges(
            spark.read.parquet(edge_path).select("source", "text"), "source"
        ).select("source", "gram").write.mode("overwrite").parquet(flagged_path)

    def q_boilerplate_remove():
        # removal given stored flagged set: broadcast + narrow Arrow
        # strip over the corpus, no shuffle of document text
        corpus = spark.read.parquet(edge_path).select("doc_id", "source", "text")
        flagged = spark.read.parquet(flagged_path)
        return force(boilerplate.boilerplate_remove(corpus, flagged, "source"))

    def q_substring_spans():
        # span-grain output (r4): collapse-first + native hashed gram
        # keys, same pins as q_substring
        docs = wp().select("doc_id", "text")
        d = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).repartition(
            spark.sparkContext.defaultParallelism
        )
        return dedup.substring_spans(d, hash_mode="native")

    def q_char_dedup_spans():
        # char-grain exact-substring spans (Lee et al. true grain) over
        # the DISTINCT page corpus (collapse-first, like q_substring):
        # ~10k distinct 3.5k-char pages = ~35M char windows.  Rolling-
        # hash method: one O(N) numpy pass per batch — the per-position
        # substr+xxhash form measured 66-83s on the same input (7x).
        from xjs.pipeline.suffix import char_span_duplicates

        corpus = spark.read.parquet(edge_path).select("doc_id", "text")
        d = corpus.groupBy("text").agg(
            F.min("doc_id").alias("doc_id")
        ).repartition(spark.sparkContext.defaultParallelism)
        return force(char_span_duplicates(d, method="rolling"))

    # persisted window-owner state for the char-grain incremental row:
    # history = 7/8 of the distinct page corpus, anchor_mod=8 (the
    # content-defined state dial), stored once like the flagged-gram
    # table.  char_state_update's _SUCCESS guard is the cache check.
    char_state_path = edge_path + "-charstate-a8"
    if not os.path.exists(os.path.join(char_state_path, "_SUCCESS")):
        from xjs.pipeline.suffix import char_state_update

        _dpage = (
            spark.read.parquet(edge_path).select("doc_id", "text")
            .groupBy("text").agg(F.min("doc_id").alias("doc_id"))
        )
        char_state_update(
            spark, _dpage.filter(F.col("doc_id") % 8 != 0),
            char_state_path, method="rolling", anchor_mod=8,
        )

    def q_char_dedup_incremental():
        # the nightly increment: key the NEW slice (1/8 of distinct
        # pages, ~4.4M anchored windows) and min-merge into the stored
        # owner state — historical text never re-read; prices the
        # per-slice keying pass + the two key-keyed aggregations
        from xjs.pipeline.suffix import char_state_merge

        corpus = spark.read.parquet(edge_path).select("doc_id", "text")
        new = corpus.groupBy("text").agg(
            F.min("doc_id").alias("doc_id")
        ).filter(F.col("doc_id") % 8 == 0)
        return force(
            char_state_merge(
                spark, new, char_state_path, method="rolling", anchor_mod=8
            )
        )

    # persisted minhash registry for the incremental near-dup row:
    # history = the raw 7/8 page slice folded once (cached via the
    # state writer's _SUCCESS guard, like the char-grain state dir) —
    # the fold itself digest-collapses, so history arrives raw exactly
    # as a nightly slice would
    from xjs.pipeline import incremental as incr_mod

    mh_state_path = wp_path + "-mhstate-v1"
    if not incr_mod._mh_complete(mh_state_path):
        incr_mod.minhash_incremental_update(
            spark,
            wp().select("doc_id", "text").filter(F.col("doc_id") % 8 != 0),
            mh_state_path,
            hash_mode="native",
        )

    def q_dedup_minhash_incremental():
        # the nightly near-dup increment over a RAW 1/8 slice (~125k
        # docs): digest-collapse against history (seen texts skip
        # signatures entirely), banded candidate join against STORED
        # signatures, CC + full state rewrite + survivor report —
        # history text never re-read; prices the whole daily job
        # including the members rewrite (the corpus-sized-metadata
        # cost the module docstring owns)
        import shutil
        import tempfile

        new = wp().select("doc_id", "text").filter(F.col("doc_id") % 8 == 0)
        out = tempfile.mkdtemp(
            prefix="bench-mhstate-", dir=os.path.join(REPO, ".tmp")
        )
        try:
            incr_mod.minhash_incremental_update(
                spark, new, out, mh_state_path, hash_mode="native"
            )
            return incr_mod.minhash_survivors(spark, out).localCheckpoint(
                eager=True
            )
        finally:
            shutil.rmtree(out, ignore_errors=True)

    def q_model_artifact():
        # the real pickled model through the adapter at bench scale
        # (r3 verdict #4): lazy per-worker load + numpy batch inference
        from xjs.pipeline.model_artifact import (
            DEFAULT_ARTIFACT,
            model_fn_from_artifact,
        )
        from xjs.pipeline.text import text_model_adapter

        return text_model_adapter(
            wp().select("doc_id", "text"),
            "lang_pred",
            model_fn_from_artifact(DEFAULT_ARTIFACT),
        )

    def q_token_count_real():
        # real BPE billing at bench scale (r4 verdict gap #1): per-worker
        # merge-table load + per-worker pre-token LRU; web text repeats
        # words heavily so the merge loop amortizes to a dict hit
        from xjs.pipeline.bpe import token_count_real

        return token_count_real(wp().select("doc_id", "text"))

    # line-grain corpus (multi-line pages) + stored detection output,
    # mirroring the boilerplate edge/flagged pattern: the detect row
    # prices the one hash aggregation over the corpus, the remove row
    # prices the cleaning increment over the STORED duplicate table.
    from xjs.pipeline import lines as lines_mod

    line_path = f"{wp_path}-lines-v{lines_mod.LINE_SCALE_VERSION}"
    if not os.path.exists(os.path.join(line_path, "_SUCCESS")):
        lines_mod.line_page_transform(
            spark.read.parquet(wp_path).select("doc_id", "text")
        ).write.mode("overwrite").parquet(line_path)
    line_dups_path = line_path + "-dups"
    if not os.path.exists(os.path.join(line_dups_path, "_SUCCESS")):
        lines_mod.duplicated_lines(
            spark.read.parquet(line_path)
        ).write.mode("overwrite").parquet(line_dups_path)

    def q_line_dedup_detect():
        # force(): ends in a projection of aggregate outputs — count()
        # would prune the owner min() out of the plan
        return force(lines_mod.duplicated_lines(spark.read.parquet(line_path)))

    def q_line_dedup_remove():
        corpus = spark.read.parquet(line_path)
        dups = spark.read.parquet(line_dups_path)
        return force(lines_mod.line_dedup_remove(corpus, dups=dups))

    def q_export_shards():
        # hash-mod sharding at 64 shards (~n_docs/64 per shard): key
        # hashing + the write repartition's shuffle + per-shard rank
        from xjs.pipeline import export as export_mod

        return force(
            export_mod.shard_assign(
                spark.read.parquet(wp_path).select("doc_id"), n_shards=64
            )
        )

    def q_export_shards_sized():
        # exact fixed-size shards: the two-level global rank (the
        # distributed ORDER BY equivalent) at 16384 docs/shard
        from xjs.pipeline import export as export_mod

        return force(
            export_mod.shard_assign_sized(
                spark.read.parquet(wp_path).select("doc_id"),
                shard_size=16384,
            )
        )

    def q_mixture():
        # per-source epoch weighting: narrow lookup + explode fused
        # into the scan; force() keeps rep in the counted plan
        from xjs.pipeline.mixture import RECIPE, mixture_sample

        return force(
            mixture_sample(wp().select("doc_id", "source"), RECIPE).select(
                "doc_id", "source", "rep"
            )
        )

    def q_c4_clean():
        # C4 line rules over the MULTI-LINE page corpus (the line-dedup
        # fixture — the shape whose line splits/filters cost something):
        # pure scan-fused projection, so force() keeps the ledger live
        from xjs.pipeline.heuristics import c4_stats

        return force(c4_stats(spark.read.parquet(line_path)))

    def q_gopher_gate():
        from xjs.pipeline.heuristics import gopher_features

        return force(gopher_features(spark.read.parquet(line_path)))

    def q_html_extract():
        # HTML -> text extraction contract over 1M wrapper pages: a
        # scan-fused regexp_replace chain, zero shuffle; force() keeps
        # the projection in the counted plan
        from xjs.pipeline.html import html_extract_text

        return force(
            html_extract_text(wp().select("doc_id", "html")).select(
                "doc_id", "extracted_text"
            )
        )

    def q_lm_perplexity():
        # bigram-LM perplexity gate: narrow transition explode ->
        # broadcast model lookup -> doc-keyed partial-agg sum;
        # force(): ends in a projection, count() would prune the gate
        from xjs.pipeline.lm import lm_filter

        return force(lm_filter(wp().select("doc_id", "text")))

    def q_lm_perplexity_5gram():
        # CCNet's deployed model form: 5-tuple explode + FOUR broadcast
        # probes (recursive stupid backoff) — ~2.5x the transition
        # width of the bigram row at the same doc count
        from xjs.pipeline.lm import lm_filter_5gram

        return force(lm_filter_5gram(wp().select("doc_id", "text")))

    # JSONL ingest fixture at bench scale: 1M JSON lines derived from
    # the materialized page table (cached like every other artifact) —
    # the row prices the schema-enforced JSON scan + clean/quarantine
    # split, the pipeline's first stage
    from xjs.sources.jsonl import _line as _jsonl_line

    jl_path = wp_path + "-jsonl-v1"
    if not os.path.exists(os.path.join(jl_path, "_SUCCESS")):
        spark.read.parquet(wp_path).select(
            _jsonl_line(F.col("doc_id"), F.col("source"), F.col("text"),
                        F.col("lang")).alias("value")
        ).write.mode("overwrite").text(jl_path)

    def q_jsonl_ingest():
        from xjs.sources.jsonl import read_jsonl_webpages

        clean, _ = read_jsonl_webpages(spark, jl_path)
        return force(clean)

    # WARC ingest at bench scale: the same 1M pages framed as 64
    # gzip-member WET shards (the real Common-Crawl layout; cached) —
    # prices the file-grain parse + clean/quarantine split
    warc_path = wp_path + "-warc-v1"

    def q_warc_ingest():
        from xjs.sources.warc import (
            read_warc_wet, split_clean_quarantine, write_warc_fixture,
        )

        write_warc_fixture(
            spark, sf_dir, warc_path, compress=True,
            df=spark.read.parquet(wp_path).select(
                "doc_id", "source", "text", "lang"),
            n_shards=64,
        )
        clean, _ = split_clean_quarantine(read_warc_wet(spark, warc_path))
        return force(clean)

    # oversized-shard layout: the SAME 1M pages in 2 big gzip shards
    # (~168 MB each; cached — shared with scripts/ab_warc_split.py).
    # File-grain reading collapses to 2 tasks here (~10.4s, see
    # BENCH/ab_warc_split_r5.json); the row prices the byte-range
    # splitter that keeps 8 MB tasks
    warcbig_path = wp_path + "-warcbig2-v1"

    def q_warc_ingest_split():
        from xjs.sources.warc import (
            read_warc_wet_split, split_clean_quarantine, write_warc_fixture,
        )

        write_warc_fixture(
            spark, sf_dir, warcbig_path, compress=True,
            df=spark.read.parquet(wp_path).select(
                "doc_id", "source", "text", "lang"),
            n_shards=2,
        )
        clean, _ = split_clean_quarantine(
            read_warc_wet_split(spark, warcbig_path, 8 << 20))
        return force(clean)

    # raw-crawl-to-text at bench scale: the same 1M pages as WARC
    # 'response' records (html binary inside HTTP/1.1 messages, gzip
    # members) -> framing parse -> HTTP strip -> scan-fused extraction
    resp_path = wp_path + "-warcresp-v1"

    def q_warc_html_extract():
        from xjs.pipeline.html import html_extract_text
        from xjs.sources.warc import read_warc_responses, write_warc_fixture

        write_warc_fixture(
            spark, sf_dir, resp_path, compress=True,
            df=spark.read.parquet(wp_path).select(
                "doc_id", "source", "text", "lang", "html"),
            n_shards=64, kind="response",
        )
        recs = read_warc_responses(spark, resp_path)
        return force(
            html_extract_text(recs.filter(F.octet_length("html") > 0))
            .select("record_id", "extracted_text")
        )

    def q_bloom_novel():
        # bloom prefilter at scale: 500k history urls -> bit array,
        # ~333k probes, exact verify join only over the survivors
        from xjs.pipeline.bloom import novel_keys

        pages = spark.read.parquet(wp_path).select(
            "doc_id",
            F.concat(F.lit("https://"), F.col("source"),
                     F.lit(".example.com/p/"),
                     F.col("doc_id").cast("string")).alias("url"))
        hist = pages.filter(F.col("doc_id") % 2 == 0).select("url")
        new = pages.filter(F.col("doc_id") % 3 == 0)
        return force(novel_keys(new, hist, "url", n_bits=1 << 23, k=5))

    def q_bloom_novel_retraction():
        # takedown-day novelty: counting-bloom state folds 500k adds,
        # then ~100k retractions; probe the binarized state, exact
        # verify join over survivors only (adds MINUS removes live set)
        import shutil
        import tempfile

        from xjs.pipeline.bloom import (
            counting_state_update, counting_to_bits, novel_keys,
        )

        pages = spark.read.parquet(wp_path).select(
            "doc_id",
            F.concat(F.lit("https://"), F.col("source"),
                     F.lit(".example.com/p/"),
                     F.col("doc_id").cast("string")).alias("url"))
        adds = pages.filter(F.col("doc_id") % 2 == 0)
        removes = pages.filter(F.col("doc_id") % 10 == 4).select("url")
        new = pages.filter(F.col("doc_id") % 3 == 0)
        live = adds.join(removes, "url", "left_anti")
        base = tempfile.mkdtemp(prefix="bench-cbloom-",
                                dir=os.path.join(REPO, ".tmp"))
        try:
            counting_state_update(spark, adds, None, "url",
                                  os.path.join(base, "day1"),
                                  n_slots=1 << 23, k=5)
            counters = counting_state_update(
                spark, None, removes,
                "url", os.path.join(base, "day2"),
                prev_state_dir=os.path.join(base, "day1"),
                n_slots=1 << 23, k=5)
            return force(novel_keys(new, live, "url",
                                    bloom=counting_to_bits(counters)))
        finally:
            shutil.rmtree(base, ignore_errors=True)

    def q_lm_ccnet_buckets():
        # CCNet's deployment form of the perplexity gate: score the 1M
        # docs once, tercile cutoffs from a hashed sample (the only
        # sort is sample-sized), broadcast thresholds, narrow assign
        from xjs.pipeline.lm import ccnet_buckets

        return force(ccnet_buckets(wp().select("doc_id", "text", "lang")))

    def q_robots_filter():
        # RFC 9309 exclusion gate at 1M urls: domain-grain packed rules
        # broadcast + array-HOF longest-match — zero corpus shuffle
        from xjs.pipeline.robots import robots_filter, robots_rules

        corpus = wp().select(
            "doc_id",
            F.concat(F.lit("https://"), F.col("source"),
                     F.lit(".example.com/doc/"),
                     F.col("doc_id").cast("string")).alias("url"))
        return force(robots_filter(corpus, robots_rules(spark, sf_dir)))

    def q_html_links():
        # hyperlink extraction at 1M pages (~3M kept links): scan-fused
        # regexp_extract_all + transform/filter + explode, zero shuffle
        from xjs.pipeline.links import html_extract_links, linked_pages_from

        return force(html_extract_links(
            linked_pages_from(wp().select("doc_id", "source"))))

    def q_link_pagerank():
        # 3 integer PageRank iterations over the ~3M-edge page graph:
        # edge list built by formula (extraction is the html_links
        # row's bill), localCheckpointed once; per iteration one src
        # join + one dst partial-agg
        from xjs.pipeline.links import link_edges_from, pagerank_int

        edges = link_edges_from(wp().select("doc_id", "source"))
        return force(pagerank_int(edges, iterations=3))

    def q_quality_classifier():
        # classifier gate at 1M docs: token explode + B-row broadcast
        # weight probe + doc-keyed partial-agg sum, id-only join-back
        from xjs.pipeline.quality_model import classifier_gate

        return force(classifier_gate(wp().select("doc_id", "text")))

    def q_crawl_diff():
        # snapshot delta at 1M urls x 2 crawls: the suite's big-big
        # shuffle join — both sides project to (url, digest) first so
        # the Exchange carries 48-byte rows, never page text; output
        # is churn-proportional (~39% of urls at the fixture rates)
        from xjs.pipeline.diff import crawl_diff

        d = wp().select("doc_id", "source", "text")
        url = F.concat(F.lit("https://"), F.col("source"),
                       F.lit(".example.com/doc/"),
                       F.col("doc_id").cast("string"))
        old = d.select(url.alias("url"), "text")
        new = (d.filter(F.col("doc_id") % 7 != 0)
               .select(url.alias("url"),
                       F.when(F.col("doc_id") % 5 == 0,
                              F.concat(F.col("text"), F.lit(" [updated]")))
                       .otherwise(F.col("text")).alias("text")))
        return force(crawl_diff(old, new))

    def q_anchor_terms():
        # anchor-text aggregation at 1M pages (~3M kept anchors):
        # scan-fused double extract + zip explode, one (domain, term)
        # partial-agg shuffle, top-5 window over the aggregated table
        from xjs.pipeline.links import (
            anchor_pages_from, anchor_text_terms, html_anchor_pairs,
        )

        return force(anchor_text_terms(html_anchor_pairs(
            anchor_pages_from(wp().select("doc_id", "source"))), k=5))

    def q_vocab_top_words():
        # tokenizer-prep vocabulary: one token-explode partial-agg
        # over 1M page docs, TakeOrderedAndProject top-1000 cut,
        # integer ppm coverage window over the 1000-row result
        from xjs.pipeline.vocab import (
            corpus_token_total, top_vocab, word_frequencies,
        )

        d = wp().select("doc_id", "text")
        return force(top_vocab(word_frequencies(d), v=1000,
                               total=corpus_token_total(d)))

    vocab_path = wp_path + "-vocab"
    if not os.path.exists(os.path.join(vocab_path, "_SUCCESS")):
        from xjs.pipeline.vocab import (
            corpus_token_total, top_vocab, word_frequencies,
        )

        _vd = spark.read.parquet(wp_path).select("doc_id", "text")
        top_vocab(word_frequencies(_vd), v=1000,
                  total=corpus_token_total(_vd)
                  ).write.mode("overwrite").parquet(vocab_path)

    def q_tfidf_top_terms():
        # per-doc top-5 keywords by integer tf-idf over a STORED
        # vocabulary (the production shape — the vocab build is the
        # vocab_top_words row's bill): idf broadcast, no term-keyed
        # shuffle join, doc-keyed top-k window over 1M docs
        from xjs.pipeline.vocab import tfidf_top_terms

        d = wp().select("doc_id", "text")
        return force(tfidf_top_terms(
            d, spark.read.parquet(vocab_path), k=5))

    def q_dynamic_udf():
        # the deliberate slow path: Arrow pandas-UDF JSON validation;
        # measured so the static-vs-dynamic cost ratio stays visible
        from xjs.dynamic_spark import PROPS_SCHEMA, dynamic_violations

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return dynamic_violations(ev, PROPS_SCHEMA, "props", "event_id")

    return {
        "webpages_violations": q_violations,
        "webpages_verdicts": q_verdicts,
        "stats_single_pass": q_stats,
        "uniqueness_url": q_uniqueness,
        "referential_domains": q_referential,
        "drift_psi": q_drift,
        "ts_monotonicity": q_monotonicity,
        "dedup_minhash_lsh": q_dedup_minhash,
        "dedup_simhash": q_simhash,
        "text_quality": q_text_quality,
        "similarity_topk": q_similarity,
        "embedding_bucket_scaled": q_emb_bucket_scaled,
        "embedding_quality_scaled": q_emb_quality_scaled,
        "similarity_topk_scaled": q_similarity_topk_scaled,
        "embedding_neardup_scaled": q_emb_neardup_scaled,
        "decontaminate": q_decontam,
        "decontaminate_spans": q_decontam_spans,
        "dedup_substring": q_substring,
        "sample_stratified": q_stratified,
        "url_canonical_dedup": q_canonical,
        "text_pii": q_pii,
        "heavy_hitters_domains": q_heavy,
        "asof_join_clicks": q_asof,
        "pack_sequences": q_pack,
        "pack_global": q_pack_global,
        # headline boilerplate row: the edge-window production form on
        # a page-length corpus (the shape a 100 TB run uses — r2
        # verdict #1); the full-document scan stays as a secondary row
        "boilerplate_edges": q_boilerplate_edges,
        "boilerplate_grams": q_boilerplate,
        "boilerplate_remove": q_boilerplate_remove,
        "substring_spans": q_substring_spans,
        "char_dedup_spans": q_char_dedup_spans,
        "char_dedup_incremental": q_char_dedup_incremental,
        "dedup_minhash_incremental": q_dedup_minhash_incremental,
        "text_model_artifact": q_model_artifact,
        "token_count_real": q_token_count_real,
        "line_dedup_detect": q_line_dedup_detect,
        "line_dedup_remove": q_line_dedup_remove,
        "export_shards": q_export_shards,
        "export_shards_sized": q_export_shards_sized,
        "mixture_sample": q_mixture,
        "c4_clean": q_c4_clean,
        "gopher_gate": q_gopher_gate,
        "html_extract": q_html_extract,
        "lm_perplexity": q_lm_perplexity,
        "lm_perplexity_5gram": q_lm_perplexity_5gram,
        "jsonl_ingest": q_jsonl_ingest,
        "warc_ingest": q_warc_ingest,
        "warc_ingest_split": q_warc_ingest_split,
        "warc_html_extract": q_warc_html_extract,
        "bloom_novel": q_bloom_novel,
        "bloom_novel_retraction": q_bloom_novel_retraction,
        "lm_ccnet_buckets": q_lm_ccnet_buckets,
        "robots_filter": q_robots_filter,
        "html_links": q_html_links,
        "link_pagerank": q_link_pagerank,
        "quality_classifier": q_quality_classifier,
        "crawl_diff": q_crawl_diff,
        "html_anchor_terms": q_anchor_terms,
        "vocab_top_words": q_vocab_top_words,
        "tfidf_top_terms": q_tfidf_top_terms,
        "dynamic_json_udf": q_dynamic_udf,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    factor = int(os.environ.get("XJS_BENCH_FACTOR", "200"))

    from xjs.session import get_spark

    spark = get_spark(app_name="xjs-bench", cores=cpus, shuffle_partitions=max(cpus, 8))

    import duckdb  # count base docs for docs/sec

    n_base = duckdb.sql(
        f"select count(*) from read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    n_docs = n_base * factor

    queries = build_queries(spark, sf_dir, factor)

    # warm-up: JIT/codegen + file listing, not measured
    queries["webpages_verdicts"]().count()

    # best of 2 per query: a one-shot cold measurement of a multi-stage
    # job on this shared VM mixes JIT compilation with noisy-neighbor
    # contention (the same dedup query measured anywhere from 5.6s to
    # 80s across the day at identical code); the min of two runs is the
    # sustained-throughput number the suite is meant to track
    reps = int(os.environ.get("XJS_BENCH_REPS", "2"))
    max_reps = int(os.environ.get("XJS_BENCH_MAX_REPS", str(reps + 4)))
    timings = {}
    noisy = {}
    for name, make in queries.items():
        samples = []
        while len(samples) < reps:
            t0 = time.perf_counter()
            make().count()
            samples.append(time.perf_counter() - t0)
        # variance-aware extension: this host's steal noise can inflate a
        # single sample 3-10x; when the samples disagree badly, buy extra
        # reps for THIS query only until two samples agree within 30% or
        # the rep budget runs out — min-of-agreeing is the sustained number
        while (
            len(samples) < max_reps
            and min(samples) > 0
            and sorted(samples)[min(1, len(samples) - 1)] / min(samples) > 1.3
        ):
            t0 = time.perf_counter()
            make().count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)
        if max(samples) / max(min(samples), 1e-9) > 1.5:
            noisy[name] = [round(s, 2) for s in samples]

    total = round(sum(timings.values()), 3)
    flagship_dps = round(n_docs / timings["webpages_violations"], 1)
    deltas = _deltas_vs_previous_round(timings, total)
    # stdout carries ONE compact line (the driver tails ~2000 chars; the
    # round-2 line, bloated by noisy_samples + per-query deltas, got
    # truncated and recorded as parsed:null) — protocol detail and raw
    # samples go to BENCH/last_run.json instead
    compact = {
        "metric": "headline validation suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "n_docs": n_docs,
        "factor": factor,
        "cpus": cpus,
        "docs_per_sec_flagship": flagship_dps,
        **{k: deltas[k] for k in ("delta_total", "deltas_vs_round") if k in deltas},
    }
    detail = {
        **compact,
        "reps": reps,
        "protocol": f"best-of-{reps} per query, +reps (max {max_reps}) while samples disagree >30%",
        **({"noisy_samples": noisy} if noisy else {}),
        **deltas,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "last_run.json"), "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(compact))


def _deltas_vs_previous_round(timings: dict, total: float) -> dict:
    """Per-query regression tracking: seconds delta vs the newest
    BENCH_r{N}.json in the repo (negative = faster this round).
    Queries added since the previous round appear with delta null."""
    import glob
    import re

    rounds = []
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            rounds.append((int(m.group(1)), p))
    if not rounds:
        return {}
    n, path = max(rounds)
    try:
        with open(path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        return {}
    # the round driver wraps bench stdout: {"n", "rc", "tail", "parsed", ...};
    # accept the bare bench line, the driver's "parsed" field, or scan "tail"
    if "queries" not in prev and isinstance(prev.get("parsed"), dict):
        prev = prev["parsed"]
    if "queries" not in prev and isinstance(prev.get("tail"), str):
        for line in reversed(prev["tail"].replace("\r", "\n").splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    cand = json.loads(line)
                except ValueError:
                    continue
                if "queries" in cand:
                    prev = cand
                    break
    if "queries" not in prev and isinstance(prev.get("tail"), str):
        # last resort: the r02 driver tail held a FRONT-truncated line;
        # the flat {"queries": {...}} object and "value" are still
        # recoverable by regex
        m = re.search(r'"queries": (\{[^{}]*\})', prev["tail"])
        v = re.search(r'"value": ([0-9.]+)', prev["tail"]) or re.search(
            r'([0-9.]+), "unit"', prev["tail"]
        )
        if m:
            try:
                prev = {
                    "queries": json.loads(m.group(1)),
                    **({"value": float(v.group(1))} if v else {}),
                }
            except ValueError:
                pass
    prev_q = prev.get("queries", {})
    if not prev_q:
        return {}
    deltas = {
        name: (round(sec - prev_q[name], 3) if name in prev_q else None)
        for name, sec in timings.items()
    }
    out = {"deltas": deltas, "deltas_vs_round": n}
    if isinstance(prev.get("value"), (int, float)):
        out["delta_total"] = round(total - prev["value"], 3)
    return out


if __name__ == "__main__":
    main()
