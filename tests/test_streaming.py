"""Streaming wrapper: availableNow file stream == batch results;
windowed counts with watermark."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from xjs.flagship import compile_plan
from xjs.runtime import violations
from xjs.sources.webpages import webpages
from xjs.streaming import run_availablenow, windowed_violation_counts


@pytest.fixture()
def tmp(spark):
    d = tempfile.mkdtemp(prefix="xjs-stream-", dir="/root/repo/.tmp")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_equals_batch(spark, sf_dir, tmp):
    wp = webpages(spark, sf_dir)
    plan = compile_plan(wp)
    # land the table as two file batches (a mini ingest)
    wp.filter(F.col("partition_id") < 8).write.parquet(f"{tmp}/in/batch1")
    wp.filter(F.col("partition_id") >= 8).write.parquet(f"{tmp}/in/batch2")

    stream = (
        spark.readStream.schema(wp.schema)
        .option("recursiveFileLookup", "true")
        .parquet(f"{tmp}/in")
    )
    run_availablenow(stream, plan, f"{tmp}/out", f"{tmp}/ckpt")

    got = spark.read.parquet(f"{tmp}/out")
    expected = violations(wp, plan)
    assert got.count() == expected.count()
    assert got.exceptAll(expected.select(got.columns)).count() == 0


def test_stateful_totals_survive_restart(spark, sf_dir, tmp):
    """applyInPandasWithState: cumulative per-source totals persist in
    the streaming checkpoint across two separate availableNow runs."""
    from xjs.streaming import stateful_entity_totals

    wp = webpages(spark, sf_dir)
    plan = compile_plan(wp)

    def run_once(qname):
        stream = (
            spark.readStream.schema(wp.schema)
            .option("recursiveFileLookup", "true")
            .parquet(f"{tmp}/sin")
        )
        out = stateful_entity_totals(stream, plan, "source")
        totals = {}

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                totals[r["entity"]] = (r["n_docs"], r["n_violations"])

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/sckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return totals

    wp.filter(F.col("partition_id") < 8).write.parquet(f"{tmp}/sin/b1")
    first = run_once("st1")
    # restart with more data: totals must include the first run's state
    wp.filter(F.col("partition_id") >= 8).write.parquet(f"{tmp}/sin/b2")
    second = run_once("st2")

    full = {
        r["source"]: (r["n"], r["v"])
        for r in wp.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((~plan.pass_all()).cast("long")).alias("v"),
        )
        .collect()
    }
    for src, (n, v) in second.items():
        assert (n, v) == full[src], f"{src}: {(n, v)} vs {full[src]}"
    assert sum(n for n, _ in first.values()) < sum(n for n, _ in full.values())


def test_windowed_counts_with_watermark(spark, sf_dir, tmp):
    wp = webpages(spark, sf_dir)
    plan = compile_plan(wp)
    wp.write.parquet(f"{tmp}/in2")
    stream = spark.readStream.schema(wp.schema).parquet(f"{tmp}/in2")
    agg = windowed_violation_counts(stream, plan, "warc_ts", window="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from wincounts").collect()
    assert len(rows) > 0
    total = sum(r["n"] for r in rows)
    assert total == violations(wp, plan).count()


def test_streaming_session_windows_equal_batch(spark, sf_dir, tmp):
    """F.session_window in the streaming path == the same aggregation
    on the batch read == the batch sessionize pipeline (on ts order):
    identical (entity, session_start, n_events) triples."""
    from xjs.pipeline.sessions import GAP_MINUTES, sessionize
    from xjs.streaming import session_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(f"{tmp}/ev/b1")
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(f"{tmp}/ev/b2")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true")
        .parquet(f"{tmp}/ev")
    )
    q = (
        session_stats(stream, "user_id", "ts", gap=f"{GAP_MINUTES} minutes")
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from sessions_stream").collect()
    }
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_stats(ev, "user_id", "ts", gap=f"{GAP_MINUTES} minutes").collect()
    }
    assert got == batch
    assert sum(n for _, _, _, n in got) == ev.count()

    # the batch windowed pipeline agrees on session membership when
    # ordered by event time (session_window.end = last event + gap by
    # definition, so compare (entity, start, n_events))
    pipeline = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in sessionize(ev, "user_id", "ts", "ts").collect()
    }
    assert {(u, s, n) for u, s, _, n in got} == pipeline


def test_streaming_exact_dedup_equals_batch(spark, sf_dir, tmp):
    """dropDuplicatesWithinWatermark over two file batches == batch
    dropDuplicates on the union: one surviving row per key."""
    from xjs.streaming import stream_exact_dedup

    wp = webpages(spark, sf_dir).select("url", "warc_ts", "doc_id")
    wp.filter(F.col("doc_id") % 2 == 0).write.parquet(f"{tmp}/dd/b1")
    wp.filter(F.col("doc_id") % 2 == 1).write.parquet(f"{tmp}/dd/b2")

    stream = (
        spark.readStream.schema(wp.schema)
        .option("recursiveFileLookup", "true")
        .parquet(f"{tmp}/dd")
    )
    q = (
        stream_exact_dedup(stream, ["url"], "warc_ts")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.sql("select url from dedup_stream")
    assert got.count() == got.distinct().count()  # no key emitted twice
    assert {r["url"] for r in got.collect()} == {
        r["url"] for r in wp.select("url").distinct().collect()
    }


def test_streaming_quarantine_equals_batch(spark, sf_dir, tmp):
    """foreachBatch two-sink routing == batch quarantine on both sides."""
    from xjs.runtime import quarantine
    from xjs.streaming import run_quarantine_availablenow

    wp = webpages(spark, sf_dir)
    plan = compile_plan(wp)
    wp.filter(F.col("partition_id") < 8).write.parquet(f"{tmp}/in/batch1")
    wp.filter(F.col("partition_id") >= 8).write.parquet(f"{tmp}/in/batch2")

    stream = (
        spark.readStream.schema(wp.schema)
        .option("recursiveFileLookup", "true")
        .parquet(f"{tmp}/in")
    )
    run_quarantine_availablenow(
        stream, plan, f"{tmp}/clean", f"{tmp}/dirty", f"{tmp}/ckpt"
    )

    b_clean, b_dirty = quarantine(wp, plan)
    s_clean = spark.read.parquet(f"{tmp}/clean").drop("batch_id")
    s_dirty = spark.read.parquet(f"{tmp}/dirty").drop("batch_id")
    assert s_clean.count() == b_clean.count()
    assert s_clean.exceptAll(b_clean.select(s_clean.columns)).count() == 0
    assert s_dirty.count() == b_dirty.count()
    assert s_dirty.exceptAll(b_dirty.select(s_dirty.columns)).count() == 0


def test_streaming_drift_histogram_equals_batch(spark, sf_dir, tmp):
    """Watermarked windowed histogram == batch histogram on every
    window the watermark closed; PSI over the sink runs the SAME batch
    math as the partition-keyed check."""
    from xjs.checks import drift
    from xjs.streaming import stream_drift_histogram

    wp = webpages(spark, sf_dir)
    wp.filter(F.col("partition_id") < 8).write.parquet(f"{tmp}/in/b1")
    wp.filter(F.col("partition_id") >= 8).write.parquet(f"{tmp}/in/b2")

    stream = (
        spark.readStream.schema(wp.schema)
        .option("recursiveFileLookup", "true")
        .parquet(f"{tmp}/in")
    )
    hist = stream_drift_histogram(
        stream, F.length("text"), "warc_ts",
        drift.TEXT_LEN_LO, drift.TEXT_LEN_HI, drift.N_BUCKETS,
    )
    q = (
        hist.writeStream.format("parquet")
        .option("path", f"{tmp}/hist")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(f"{tmp}/hist")
    assert got.count() > 0

    # batch twin: same windows via F.window on the static table,
    # restricted to windows the watermark closed (end <= max event ts)
    max_ts = wp.agg(F.max("warc_ts")).first()[0]
    batch = (
        drift.histogram(
            wp.withColumn("window", F.window("warc_ts", "2 minutes")),
            F.length("text"), "window",
            drift.TEXT_LEN_LO, drift.TEXT_LEN_HI, drift.N_BUCKETS,
        )
        .filter(F.col("window.end") <= max_ts)
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch.select(got.columns)).count() == 0

    # the PSI stage is the identical batch operator, windows as keys
    base = got.groupBy("bucket").agg(F.sum("n").alias("n"))
    psi = drift.psi(got, base, "window", drift.N_BUCKETS)
    assert psi.count() == got.select("window").distinct().count()


def test_streaming_referential_equals_batch(spark, sf_dir, tmp):
    """Stream-static left-anti join == the batch referential check."""
    from xjs.checks.referential import domain_allowlist, domain_of, webpages_referential_violations
    from xjs.streaming import stream_referential_violations

    wp = webpages(spark, sf_dir)
    wp.filter(F.col("partition_id") < 8).write.parquet(f"{tmp}/in/b1")
    wp.filter(F.col("partition_id") >= 8).write.parquet(f"{tmp}/in/b2")

    stream = (
        spark.readStream.schema(wp.schema)
        .option("recursiveFileLookup", "true")
        .parquet(f"{tmp}/in")
        .withColumn("domain", domain_of(F.col("url")))
    )
    out = stream_referential_violations(
        stream, domain_allowlist(spark, sf_dir), "domain", "domain"
    ).select("url", "domain", "partition_id")
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{tmp}/viol")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(f"{tmp}/viol")
    expected = webpages_referential_violations(spark, sf_dir)
    assert got.count() == expected.count() > 0
    assert got.exceptAll(expected.select(got.columns)).count() == 0


def test_streaming_heavy_hitters_candidates_cover_batch(spark, sf_dir, tmp):
    """The union of final per-bucket MG summaries from the stream is a
    superset of the true heavy hitters; an exact confirm over those
    candidates reproduces the batch heavy_hitters output exactly."""
    from xjs.pipeline.heavy import S_DEN, S_NUM, heavy_hitters
    from xjs.streaming import stream_heavy_hitters

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(f"{tmp}/in/b1")
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(f"{tmp}/in/b2")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")  # force multiple micro-batches
        .parquet(f"{tmp}/in")
    )
    latest = {}  # bucket -> {item: est} from its newest emission

    def sink(batch_df, _batch_id):
        for r in batch_df.collect():
            latest.setdefault(r["bucket"], {})
        for b in {r["bucket"] for r in batch_df.collect()}:
            latest[b] = {}
        for r in batch_df.collect():
            latest[r["bucket"]][r["item"]] = r["est"]

    q = (
        stream_heavy_hitters(stream.select("user_id"), "user_id")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    candidates = {item for d in latest.values() for item in d}
    batch = {
        (r["user_id"], r["n_rows"]) for r in heavy_hitters(ev, "user_id").collect()
    }
    assert batch, "fixture must contain at least one heavy hitter"
    assert {k for k, _ in batch} <= candidates  # sketch recall guarantee

    # exact confirm over streamed candidates == batch output
    total = ev.count()
    confirmed = {
        (r["user_id"], r["count"])
        for r in ev.filter(F.col("user_id").isin(*candidates))
        .groupBy("user_id").count().collect()
        if r["count"] * S_DEN >= S_NUM * total
    }
    assert confirmed == batch


def test_streaming_heavy_hitters_string_column(spark, sf_dir, tmp):
    """ADVICE r2: output/state types must derive from the input column
    — the hardcoded 'long' broke string keys (domains)."""
    from xjs.streaming import stream_heavy_hitters

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.concat(F.lit("d"), (F.col("user_id") % 5).cast("string")).alias("dom")
    )
    ev.write.parquet(f"{tmp}/in/b1")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true")
        .parquet(f"{tmp}/in")
    )
    seen = {}

    def sink(batch_df, _batch_id):
        for r in batch_df.collect():
            seen[r["item"]] = r["est"]

    q = (
        stream_heavy_hitters(stream, "dom")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # 5 distinct string keys, tiny capacity pressure: all survive with
    # exact counts
    want = {r["dom"]: r["count"] for r in ev.groupBy("dom").count().collect()}
    assert seen == want


def test_streaming_heavy_hitters_null_keys(spark, sf_dir, tmp):
    """NULL keys must flow through the streaming MG sketch (counted
    under a None entry, stored as a null element in the state array)
    — the batch twin's ADVICE-r2 fix, streaming side."""
    from xjs.streaming import stream_heavy_hitters

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.when(F.col("event_id") % 2 == 0, F.col("user_id")).alias("uid")
    )
    ev.write.parquet(f"{tmp}/in/b1")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true")
        .parquet(f"{tmp}/in")
    )
    seen = {}

    def sink(batch_df, _batch_id):
        for r in batch_df.collect():
            seen[r["item"]] = r["est"]

    q = (
        stream_heavy_hitters(stream, "uid", capacity=10_000)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_null = ev.filter(F.col("uid").isNull()).count()
    assert n_null > 0
    assert seen.get(None) == n_null  # NULL surfaced with its exact count


def test_streaming_pii_redaction_equals_batch(spark, sf_dir, tmp):
    """PII scan/redaction is stateless Column algebra, so the same
    expressions run unchanged on a stream; sink == batch output."""
    from xjs.pipeline.pii import pii_scan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(f"{tmp}/in/b1")
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(f"{tmp}/in/b2")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("recursiveFileLookup", "true")
        .parquet(f"{tmp}/in")
    )
    q = (
        pii_scan(stream)
        .writeStream.format("parquet")
        .option("path", f"{tmp}/out")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(f"{tmp}/out")
    expected = pii_scan(docs)
    assert got.count() == expected.count() > 0
    assert got.exceptAll(expected.select(got.columns)).count() == 0


def test_streaming_duplicate_keys_equals_batch(spark, sf_dir, tmp):
    """Windowed duplicate-key stream == the same windowed groupBy on
    the static table, for every watermark-closed window."""
    from xjs.streaming import stream_duplicate_keys

    wp = webpages(spark, sf_dir)
    wp.filter(F.col("partition_id") < 8).write.parquet(f"{tmp}/in/b1")
    wp.filter(F.col("partition_id") >= 8).write.parquet(f"{tmp}/in/b2")

    stream = (
        spark.readStream.schema(wp.schema)
        .option("recursiveFileLookup", "true")
        .parquet(f"{tmp}/in")
    )
    q = (
        stream_duplicate_keys(stream, "url", "warc_ts")
        .writeStream.format("parquet")
        .option("path", f"{tmp}/dups")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(f"{tmp}/dups")
    max_ts = wp.agg(F.max("warc_ts")).first()[0]
    batch = (
        wp.groupBy(F.window(F.col("warc_ts"), "2 minutes").alias("window"), "url")
        .agg(F.count(F.lit(1)).alias("n"))
        .where((F.col("n") > 1) & (F.col("window.end") <= max_ts))
    )
    closed = got.where(F.col("window.end") <= max_ts)
    assert closed.count() == batch.count() > 0
    assert closed.exceptAll(batch.select(closed.columns)).count() == 0


def test_streaming_boilerplate_clean_equals_batch(spark, sf_dir, tmp):
    """The Arrow-gram-cutter boilerplate pass on a stream (foreachBatch
    against a batch-detected flagged-gram snapshot) == the batch
    flag+clean over the same corpus — the cutter's mapInPandas runs as
    plain batch work inside each micro-batch."""
    from xjs.pipeline.boilerplate import (
        boilerplate_flag_and_clean,
        boilerplate_grams_edges,
        edge_regime_corpus,
    )
    from xjs.streaming import run_boilerplate_clean_availablenow

    corpus = edge_regime_corpus(spark, sf_dir)
    flagged = boilerplate_grams_edges(
        corpus.select("source", "text"), "source"
    ).select("source", "gram")

    corpus.filter(F.col("doc_id") % 2 == 0).write.parquet(f"{tmp}/in/b1")
    corpus.filter(F.col("doc_id") % 2 == 1).write.parquet(f"{tmp}/in/b2")
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")  # force >1 micro-batch
        .parquet(f"{tmp}/in")
    )
    run_boilerplate_clean_availablenow(
        stream, flagged, "source", f"{tmp}/out", f"{tmp}/ckpt"
    )

    got = spark.read.parquet(f"{tmp}/out").drop("batch_id")
    expected = boilerplate_flag_and_clean(corpus, flagged, "source")
    assert got.count() == expected.count() > 0
    assert got.exceptAll(expected.select(got.columns)).count() == 0
    assert expected.select(got.columns).exceptAll(got).count() == 0
    # the injected footer docs actually got flagged and cleaned
    assert got.filter(F.col("n_flagged_grams") > 0).count() > 0
    assert got.filter(
        (F.col("doc_id") % 3 == 0) & F.col("clean_text").contains("subscribe")
    ).count() == 0


def test_idempotent_batch_write_replay(spark, sf_dir, tmp):
    """A replayed micro-batch (same batch_id, foreachBatch's
    at-least-once failure mode) overwrites its own partition instead
    of appending duplicates; distinct batch ids coexist."""
    from xjs.streaming import idempotent_batch_write

    df = webpages(spark, sf_dir).select("doc_id", "url").limit(20)
    idempotent_batch_write(df, f"{tmp}/sink", 0)
    idempotent_batch_write(df, f"{tmp}/sink", 1)
    # replay of batch 0 after a simulated failure
    idempotent_batch_write(df, f"{tmp}/sink", 0)

    got = spark.read.parquet(f"{tmp}/sink")
    assert got.count() == 2 * df.count()
    assert got.select("batch_id").distinct().count() == 2
    per_batch = got.groupBy("batch_id").count().collect()
    assert all(r["count"] == df.count() for r in per_batch)


def test_streaming_line_clean_equals_batch(spark, sf_dir, tmp):
    """Line-grain dedup cleaning on a stream (foreachBatch against a
    batch-detected duplicate-line snapshot) == the batch removal over
    the same corpus, including owner lines kept across micro-batch
    boundaries."""
    from xjs.pipeline.lines import (
        duplicated_lines,
        line_corpus,
        line_dedup_remove,
    )
    from xjs.streaming import run_line_clean_availablenow

    corpus = line_corpus(spark, sf_dir)
    dups = duplicated_lines(corpus)

    corpus.filter(F.col("doc_id") % 2 == 0).write.parquet(f"{tmp}/in/b1")
    corpus.filter(F.col("doc_id") % 2 == 1).write.parquet(f"{tmp}/in/b2")
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")  # force >1 micro-batch
        .parquet(f"{tmp}/in")
    )
    run_line_clean_availablenow(stream, dups, f"{tmp}/out", f"{tmp}/ckpt")

    got = spark.read.parquet(f"{tmp}/out").drop("batch_id")
    expected = line_dedup_remove(corpus, dups=dups)
    assert got.count() == expected.count() > 0
    assert got.exceptAll(expected.select(got.columns)).count() == 0
    assert expected.select(got.columns).exceptAll(got).count() == 0
    # the corpus-wide banner survives in exactly one doc
    n_banner = got.filter(
        F.col("clean_text").contains("copyright notice all rights reserved")
    ).count()
    assert n_banner == 1


def test_streaming_char_clean_equals_batch(spark, sf_dir, tmp):
    """Char-grain cleaning against a folded window-owner state, applied
    per micro-batch, must byte-match the batch retro-clean of the same
    corpus against the same state — owner docs keep their text
    whichever micro-batch they arrive in."""
    from xjs.pipeline.dedup import dedup_corpus
    from xjs.pipeline.suffix import (
        char_dedup_remove,
        char_duplicates_from_state,
        char_state_update,
    )
    from xjs.streaming import run_char_clean_availablenow

    corpus = dedup_corpus(spark, sf_dir)
    state = f"{tmp}/state"
    char_state_update(spark, corpus, state, method="rolling", anchor_mod=4)

    corpus.filter(F.col("doc_id") % 2 == 0).write.parquet(f"{tmp}/in/b1")
    corpus.filter(F.col("doc_id") % 2 == 1).write.parquet(f"{tmp}/in/b2")
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")  # force >1 micro-batch
        .parquet(f"{tmp}/in")
    )
    run_char_clean_availablenow(
        stream, state, f"{tmp}/out", f"{tmp}/ckpt",
        method="rolling", anchor_mod=4,
    )

    got = spark.read.parquet(f"{tmp}/out").drop("batch_id")
    expected = char_dedup_remove(
        corpus,
        char_duplicates_from_state(
            spark, corpus, state, method="rolling", anchor_mod=4
        ),
    )
    assert got.count() == expected.count() > 0
    assert got.exceptAll(expected.select(got.columns)).count() == 0
    assert expected.select(got.columns).exceptAll(got).count() == 0
    # duplicates were actually cut: some doc shrank
    assert got.join(
        corpus, "doc_id"
    ).filter(F.length("clean_text") < F.length("text")).count() > 0


def test_streaming_warc_ingest_equals_batch(spark, sf_dir, tmp):
    """WARC ingest on a file-source stream (shards landing over time)
    == the batch reader over the same directory, including the
    two-trigger incremental case: a second availableNow run processes
    ONLY newly-landed shards, and the union equals the batch over all."""
    import glob
    import shutil as _sh

    from xjs.sources.warc import (
        read_warc_wet,
        split_clean_quarantine,
        write_warc_fixture,
    )
    from xjs.streaming import run_warc_ingest_availablenow

    all_shards = write_warc_fixture(
        spark, sf_dir, f"{tmp}/all-shards", compress=True)
    names = sorted(glob.glob(f"{all_shards}/*.warc.gz"))
    land = f"{tmp}/landing"
    import os as _os

    _os.makedirs(land, exist_ok=True)
    for p in names[: len(names) // 2]:
        _sh.copy(p, land)
    run_warc_ingest_availablenow(
        spark, land, f"{tmp}/clean", f"{tmp}/quar", f"{tmp}/ckpt")
    n_first = spark.read.parquet(f"{tmp}/clean").count()
    # second wave of shards lands; same checkpoint -> only new files
    for p in names[len(names) // 2:]:
        _sh.copy(p, land)
    run_warc_ingest_availablenow(
        spark, land, f"{tmp}/clean", f"{tmp}/quar", f"{tmp}/ckpt")

    got_clean = spark.read.parquet(f"{tmp}/clean").drop("batch_id")
    got_quar = spark.read.parquet(f"{tmp}/quar").drop("batch_id")
    want_clean, want_quar = split_clean_quarantine(
        read_warc_wet(spark, all_shards))
    assert got_clean.count() > n_first > 0
    assert got_clean.count() == want_clean.count()
    assert got_clean.exceptAll(want_clean.select(got_clean.columns)).count() == 0
    assert want_clean.select(got_clean.columns).exceptAll(got_clean).count() == 0
    assert got_quar.count() == want_quar.count()
    assert got_quar.exceptAll(want_quar.select(got_quar.columns)).count() == 0


def test_streaming_novelty_gate_equals_batch(spark, sf_dir, tmp):
    """Bloom novelty gate on a stream of landed clean batches == the
    batch novel_keys over the same rows vs the same fixed history."""
    from xjs.pipeline.bloom import novel_keys
    from xjs.streaming import run_novelty_gate_availablenow

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"))
    hist = d.filter(F.col("doc_id") % 2 == 0).select("url")
    hist.write.parquet(f"{tmp}/history")
    new = d.filter(F.col("doc_id") % 3 == 0)
    new.filter(F.col("doc_id") < 250).write.parquet(f"{tmp}/in/b1")
    new.filter(F.col("doc_id") >= 250).write.parquet(f"{tmp}/in/b2")

    run_novelty_gate_availablenow(
        spark, f"{tmp}/in", f"{tmp}/history", f"{tmp}/novel",
        f"{tmp}/ckpt", key_col="url", n_bits=1 << 16, k=5)

    got = spark.read.parquet(f"{tmp}/novel").drop("batch_id")
    want = novel_keys(new, spark.read.parquet(f"{tmp}/history"), "url",
                      n_bits=1 << 16, k=5)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want.select(got.columns)).count() == 0
    assert want.select(got.columns).exceptAll(got).count() == 0
