"""Incremental (cross-run) near-duplicate dedup: process a NEW slice
of the corpus against persisted signature state — never rescanning
historical TEXT (r4 verdict gap #2: the production shape for a corpus
that grows daily).

State layout (parquet dir, written per run):
  digests/  (text_md5, rep_id)   one row per unique text ever seen;
                                 rep = first-seen representative
  sigs/     (rep_id, sim, root)  simhash signature + current
                                 component root per unique text
  members/  (doc_id, rep_id)     doc-level membership (narrow id
                                 metadata — ~16 bytes/doc, the only
                                 corpus-sized state; text is never
                                 re-read)

Incremental step (``incremental_update``):
1. digest the new slice; split seen/unseen texts with one join
   against ``digests`` (seen texts skip signature computation
   entirely — exact-collapse-first, the production order).
2. simhash only the unseen-text representatives (narrow stage).
3. candidate pairs via the same 15-bit-chunk pigeonhole banding the
   batch path uses — new-vs-new (self-join) and new-vs-HISTORY, where
   the history side derives chunks from STORED signatures. Hamming
   <= HAMMING_T keeps the pair; with SIM_CHUNKS = HAMMING_T + 1
   chunks the banding is exact (<=T differing bits can't touch all
   chunks), so the incremental pair set is precisely the batch pair
   set restricted to edges incident to the new slice.
4. contract historical endpoints to their component roots and run the
   existing pointer-jumping connected_components over the (tiny)
   edge graph.  Old components can MERGE through a new doc adjacent
   to two of them: the merge appears as a component containing >= 2
   old roots, and the resulting root remap is broadcast-joined onto
   ``sigs`` (remap size is bounded by the number of merge events, not
   the corpus).
5. write the updated state; re-runs are replay-safe (a state dir
   with _SUCCESS markers is never recomputed — the foreachBatch sink
   idempotence pattern).

Equivalence (the oracle): contracting identical texts to a
representative and old components to their roots both preserve
connected components, so after any slice sequence
``survivors(state)`` equals a full-corpus batch recompute: simhash
hamming-pair graph over unique texts -> connected components -> per
component (keep_doc_id = min member doc_id, n_docs).  The DuckDB
oracle states exactly that with a recursive reachability CTE, and
``q_dedup_incremental`` replays a 3-slice interleaved split (slices
by doc_id % 3, so later slices carry SMALLER doc_ids than earlier
reps — exercising the first-seen-rep vs min-doc-survivor
distinction).

100 TB shape: each daily run touches the new slice's text once
(digest + signatures for unseen texts only), joins against state on
digest/chunk keys (narrow tables, co-partitionable by key), and the
CC loop runs over candidate EDGES (pair-graph sized, not corpus
sized).  State rewrite is narrow-columns-only; at a trillion docs
``members`` is ~16 TB of ids vs the 100 TB+ of text it spares every
day.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xjs.pipeline.clusters import connected_components
from xjs.pipeline.dedup import (
    CHUNK_BITS,
    DUCKDB_CORPUS_CTE,
    HAMMING_T,
    SIM_CHUNKS,
    _simhash_sql_expr,
    dedup_corpus,
    simhash,
)

__all__ = [
    "incremental_update",
    "load_state",
    "survivors",
    "q_dedup_incremental",
    "oracle_dedup_incremental_sql",
]


def _chunks(df: DataFrame, id_col: str) -> DataFrame:
    """(id, sim, chunk, val) — the pigeonhole banding used by the
    batch path, derived from stored signatures (no text)."""
    return df.select(
        F.col(id_col),
        "sim",
        F.posexplode(
            F.array(*[
                (F.shiftright(F.col("sim"), CHUNK_BITS * c) % (2 ** CHUNK_BITS))
                for c in range(SIM_CHUNKS)
            ])
        ).alias("chunk", "val"),
    )


def _ham_pairs(a: DataFrame, b: DataFrame) -> DataFrame:
    """Hamming-verified pairs between two (id, sim, chunk, val) chunk
    frames; a-side id < b-side id is NOT imposed (callers dedupe)."""
    j = a.alias("a").join(
        b.alias("b"),
        (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.val") == F.col("b.val")),
    )
    ham = F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
    return (
        j.select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter((F.col("hamming") <= HAMMING_T) & (F.col("doc_a") != F.col("doc_b")))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _write(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def _complete(state_dir: str) -> bool:
    return all(
        os.path.exists(os.path.join(state_dir, t, "_SUCCESS"))
        for t in ("digests", "sigs", "members")
    )


def load_state(spark: SparkSession, state_dir: str):
    return (
        spark.read.parquet(os.path.join(state_dir, "digests")),
        spark.read.parquet(os.path.join(state_dir, "sigs")),
        spark.read.parquet(os.path.join(state_dir, "members")),
    )


def incremental_update(
    spark: SparkSession,
    new_df: DataFrame,
    state_out: str,
    state_in: str | None = None,
) -> None:
    """Fold a new corpus slice (doc_id, text) into dedup state.

    ``state_in=None`` bootstraps from an empty history.  Replay-safe:
    if ``state_out`` is already complete (all _SUCCESS markers) the
    call is a no-op, so a killed run re-submitted by a scheduler never
    double-applies a slice."""
    if _complete(state_out):
        return

    new_docs = new_df.select("doc_id", F.md5(F.col("text")).alias("dig"), "text")

    if state_in is not None:
        digests, sigs, members = load_state(spark, state_in)
    else:
        digests = spark.createDataFrame([], "dig string, rep_id long")
        sigs = spark.createDataFrame([], "rep_id long, sim long, root long")
        members = spark.createDataFrame([], "doc_id long, rep_id long")

    # 1. split seen / unseen texts (exact-collapse against history AND
    #    within the slice in one digest groupBy)
    slice_groups = (
        new_docs.groupBy("dig")
        .agg(F.min("doc_id").alias("slice_rep"), F.any_value("text").alias("text"))
        .join(digests, "dig", "left")
    )
    unseen = slice_groups.filter(F.col("rep_id").isNull()).select(
        "dig", F.col("slice_rep").alias("rep_id"), "text"
    )

    # 2. signatures for genuinely new texts only (the only text touch)
    new_sigs = unseen.select(
        "rep_id", simhash(F.col("text")).alias("sim")
    ).localCheckpoint(eager=True)  # cut lineage: reused 3x below

    # 3. candidate pairs: new-new + new-history (history chunks derive
    #    from stored sims — no text rescan)
    nc = _chunks(new_sigs.withColumnRenamed("rep_id", "id"), "id")
    pairs_nn = _ham_pairs(nc, nc).filter(F.col("doc_a") < F.col("doc_b"))
    oc = _chunks(sigs.select(F.col("rep_id").alias("id"), "sim"), "id")
    pairs_no = (
        _ham_pairs(nc, oc)
        # contract the historical endpoint to its component root
        .join(sigs.select(F.col("rep_id").alias("doc_b"), "root"), "doc_b")
        .select("doc_a", F.col("root").alias("doc_b"))
        .distinct()
    )

    # 4. components over the contracted edge graph (tiny: edges only)
    cc_pairs = pairs_nn.unionAll(pairs_no)
    cc = connected_components(cc_pairs)  # (doc_id, cluster)

    # new reps: root from cc, else self
    new_sig_rows = (
        new_sigs.join(cc.withColumnRenamed("doc_id", "rep_id"), "rep_id", "left")
        .select("rep_id", "sim", F.coalesce("cluster", F.col("rep_id")).alias("root"))
    )
    # historical roots that appeared in cc get remapped (merges);
    # remap table is merge-event sized -> broadcast
    remap = cc.select(F.col("doc_id").alias("root"), F.col("cluster").alias("new_root"))
    old_sig_rows = (
        sigs.join(F.broadcast(remap), "root", "left")
        .select("rep_id", "sim", F.coalesce("new_root", F.col("root")).alias("root"))
    )

    # 5. persist updated state
    out_digests = digests.unionAll(unseen.select("dig", "rep_id"))
    out_members = members.unionAll(
        new_docs.select("doc_id", "dig")
        .join(out_digests, "dig")
        .select("doc_id", "rep_id")
    )
    _write(out_digests, os.path.join(state_out, "digests"))
    _write(old_sig_rows.unionAll(new_sig_rows), os.path.join(state_out, "sigs"))
    _write(out_members, os.path.join(state_out, "members"))


def survivors(spark: SparkSession, state_dir: str) -> DataFrame:
    """(keep_doc_id, n_docs) per near-duplicate component over
    everything folded into the state so far — the full-corpus-batch
    equivalent answer, computed from state alone."""
    _, sigs, members = load_state(spark, state_dir)
    return (
        members.join(sigs.select("rep_id", "root"), "rep_id")
        .groupBy("root")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_docs"))
        .select("keep_doc_id", "n_docs")
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the dedup corpus as three interleaved daily slices
    (doc_id % 3) through incremental state, then report survivors.
    The oracle recomputes the same answer from the full corpus in one
    batch — the equivalence that makes incremental mode trustworthy."""
    import shutil
    import tempfile

    corpus = dedup_corpus(spark, sf_dir)
    base = tempfile.mkdtemp(
        prefix="incr-", dir=os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".tmp")
    )
    try:
        prev = None
        for day in range(3):
            out = os.path.join(base, f"day{day}")
            incremental_update(
                spark, corpus.filter(F.col("doc_id") % 3 == day), out, prev
            )
            prev = out
        return survivors(spark, prev).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def oracle_dedup_incremental_sql() -> str:
    return f"""
WITH RECURSIVE {DUCKDB_CORPUS_CTE.strip()},
sims AS (SELECT doc_id, sim FROM {_simhash_sql_expr()} t),
uniq AS (
    SELECT md5(text) AS dig, MIN(doc_id) AS rep FROM corpus GROUP BY 1
),
rsims AS (
    SELECT u.rep, s.sim FROM uniq u JOIN sims s ON s.doc_id = u.rep
),
chunks AS (
    SELECT rep, sim, UNNEST(RANGE({SIM_CHUNKS})) AS chunk,
           UNNEST([{', '.join(f'(sim >> {CHUNK_BITS * c}) % {2 ** CHUNK_BITS}' for c in range(SIM_CHUNKS))}]) AS val
    FROM rsims
),
pairs AS (
    SELECT DISTINCT a.rep AS ra, b.rep AS rb
    FROM chunks a JOIN chunks b
      ON a.chunk = b.chunk AND a.val = b.val AND a.rep < b.rep
    WHERE bit_count(xor(a.sim, b.sim)) <= {HAMMING_T}
),
edges AS (SELECT ra AS a, rb AS b FROM pairs UNION SELECT rb, ra FROM pairs),
reach(src, node) AS (
    SELECT DISTINCT a, a FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
),
roots AS (SELECT src AS rep, MIN(node) AS root FROM reach GROUP BY src),
membership AS (
    SELECT c.doc_id, COALESCE(r.root, u.rep) AS root
    FROM corpus c
    JOIN uniq u ON u.dig = md5(c.text)
    LEFT JOIN roots r ON r.rep = u.rep
)
SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_docs
FROM membership GROUP BY root
"""
