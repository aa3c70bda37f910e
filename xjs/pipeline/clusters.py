"""Near-duplicate clustering + survivor selection: pairs -> connected
components -> one kept doc per cluster.

Label propagation over the (tiny, relative to the corpus) candidate
graph: each node takes the min label among itself and its neighbors,
then follows its label's label (pointer jumping / path halving — the
large-star idea from Kiveris et al., "Connected Components in
MapReduce and Beyond"), iterated to convergence with a driver-side
changed-count check.  Every iteration is two joins + one aggregation
over EDGES (not documents); pointer jumping makes the round count
O(log diameter) instead of O(diameter), so a 2^MAX_ITERS-long chain
still converges — and non-convergence raises instead of silently
returning wrong labels (round-1 verdict #5).

Superseded per-iteration caches are unpersisted as soon as the next
generation is materialized, so executor storage stays at one labels
generation regardless of iteration count.

Oracle: a DuckDB recursive CTE computes true reachability minima; the
convergence loop must agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xjs.pipeline.dedup import DUCKDB_CORPUS_CTE, _minhash_sql, dedup_corpus, verified_near_duplicates

MAX_ITERS = 20

#: edge-count ceiling for the driver-side union-find fast path.  The
#: candidate graph is pair-graph sized (near-duplicate mass), usually
#: minuscule next to the corpus; below the cap the whole component
#: computation is one bounded collect + O(E α(E)) union-find instead of
#: O(log d) distributed rounds, each of which costs several shuffle
#: stages of fixed overhead (measured: 4.1s for a 151-node graph on
#: local[32] vs 0.2s collected).  The cap bounds the collect by a
#: CONFIGURED constant (the novel_keys / checkpoint-manifest collect
#: class); graphs above it take the distributed loop unchanged.
CC_DRIVER_EDGE_CAP = 100_000


def _driver_union_find(rows) -> dict:
    """node -> min reachable id over the collected edge list."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        m = comp_min.get(r)
        if m is None or n < m:
            comp_min[r] = n
    return {n: comp_min[find(n)] for n in parent}


def connected_components(
    pairs: DataFrame,
    max_iters: int = MAX_ITERS,
    driver_edge_cap: int = CC_DRIVER_EDGE_CAP,
) -> DataFrame:
    """(doc_id, cluster): min doc_id reachable in the pair graph.

    Raises RuntimeError if the loop has not converged after
    ``max_iters`` rounds — with path halving that needs a component
    diameter around 2^max_iters, so hitting it means something is
    wrong, and wrong cluster labels must never be returned silently."""
    edges = pairs.select("doc_a", "doc_b")
    sym = edges.unionAll(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).distinct().cache()
    if sym.count() <= driver_edge_cap:
        labels = _driver_union_find(
            [(r[0], r[1]) for r in sym.collect()]  # bounded by the cap
        )
        sym.unpersist()
        spark = pairs.sparkSession
        id_type = pairs.schema["doc_a"].dataType
        from pyspark.sql.types import StructField, StructType

        schema = StructType([StructField("doc_id", id_type, False),
                             StructField("cluster", id_type, False)])
        return spark.createDataFrame(
            sorted(labels.items()), schema)
    labels = (
        sym.select(F.col("doc_a").alias("id")).distinct()
        .select("id", F.col("id").alias("label"))
        .cache()
    )
    converged = False
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym.doc_b == labels.id)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nl"))
        )
        stepped = (
            labels.join(neighbor_min, labels.id == neighbor_min.doc_a, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nl"), F.col("label"))).alias("label"),
            )
        )
        # pointer jumping: label <- label(label).  A label is always a
        # node id in the same component, so the jump preserves
        # correctness while halving pointer-chain depth each round.
        mapping = stepped.select(F.col("id").alias("mid"), F.col("label").alias("mlabel"))
        new_labels = (
            stepped.join(mapping, stepped.label == mapping.mid, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("mlabel"), F.col("label"))).alias("label"),
            )
            # lineage truncation, not just caching: each generation's
            # logical plan references the previous one ~4x (stepped,
            # mapping, changed-join), so without an eager checkpoint the
            # plan grows 4^k and Catalyst analysis dominates after a few
            # rounds.  localCheckpoint materializes to executor storage
            # and cuts the plan — the standard iterative-algorithm shape.
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # drop the superseded generation (no-op on checkpointed gens,
        # whose RDD storage is reclaimed by the ContextCleaner once the
        # reference rebinds)
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "— refusing to return possibly-wrong cluster labels"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster"))


def dedup_survivors(df: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster, keep): cluster representative = min doc_id."""
    cc = connected_components(pairs)
    return cc.select(
        "doc_id", "cluster", (F.col("doc_id") == F.col("cluster")).alias("keep")
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = dedup_corpus(spark, sf_dir)
    pairs = verified_near_duplicates(corpus)
    return dedup_survivors(corpus, pairs)


def oracle_dedup_clusters_sql() -> str:
    # true components via recursive reachability over the same verified
    # pair set the Spark side produces
    from xjs.pipeline.dedup import JACCARD_T

    return f"""
WITH RECURSIVE {DUCKDB_CORPUS_CTE.strip()},
{_minhash_sql().strip()},
pairs AS (
    SELECT doc_a, doc_b FROM cands
    JOIN toksets ta ON ta.doc_id = doc_a
    JOIN toksets tb ON tb.doc_id = doc_b
    WHERE len(list_intersect(ta.toks, tb.toks))::DOUBLE /
          (len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks))) >= {JACCARD_T}
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION SELECT doc_b, doc_a FROM pairs
),
reach(src, node) AS (
    SELECT DISTINCT a, a FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
)
SELECT src AS doc_id, MIN(node) AS cluster, src = MIN(node) AS keep
FROM reach GROUP BY src
"""


# --------------------------------------------------------------------------
# quality-aware survivor selection
# --------------------------------------------------------------------------


def dedup_survivors_quality(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, cluster, q, keep): cluster representative = the
    HIGHEST-quality member (ties to the smaller doc_id) instead of
    ``dedup_survivors``' min-id pick — the production choice when the
    near-dup cluster mixes a clean page with its ad-laden mirrors and
    the pipeline should keep the best copy, not the first-crawled one.

    Scale shape: components run over the candidate-pair graph (edges,
    not documents); the quality score joins in on doc_id for CLUSTERED
    docs only (the corpus at large never shuffles — cc output is
    pair-graph-sized); the argmax is one row_number window partitioned
    by cluster over that same small set.  Ranking uses
    ``text.quality_score`` (4-decimal rounded, bit-identical to its
    DuckDB twin ``quality_score_sql`` — the lock-step pair the curate
    oracles already prove), so the argmax is exact, never a float
    knife-edge.

    The reference engine (/root/reference, a schema validator) has no
    corpus operators; this op belongs to the training-data-pipeline
    mandate (SURVEY.md §2.10).
    """
    from pyspark.sql import Window

    from xjs.pipeline.text import quality_score

    cc = connected_components(pairs)
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        quality_score(F.col(text_col)).alias("q"),
    )
    labeled = cc.join(scored, "doc_id")
    w = Window.partitionBy("cluster").orderBy(
        F.col("q").desc(), F.col("doc_id").asc()
    )
    return labeled.select(
        "doc_id", "cluster", "q",
        (F.row_number().over(w) == 1).alias("keep"),
    )


def q_dedup_survivors_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = dedup_corpus(spark, sf_dir)
    pairs = verified_near_duplicates(corpus)
    return dedup_survivors_quality(corpus, pairs)


def oracle_dedup_survivors_quality_sql() -> str:
    # same reachability CTE as oracle_dedup_clusters_sql; the survivor
    # pick swaps min-id for argmax(quality, ties to min doc_id)
    from xjs.pipeline.dedup import JACCARD_T
    from xjs.pipeline.text import quality_score_sql

    return f"""
WITH RECURSIVE {DUCKDB_CORPUS_CTE.strip()},
{_minhash_sql().strip()},
pairs AS (
    SELECT doc_a, doc_b FROM cands
    JOIN toksets ta ON ta.doc_id = doc_a
    JOIN toksets tb ON tb.doc_id = doc_b
    WHERE len(list_intersect(ta.toks, tb.toks))::DOUBLE /
          (len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks))) >= {JACCARD_T}
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION SELECT doc_b, doc_a FROM pairs
),
reach(src, node) AS (
    SELECT DISTINCT a, a FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
),
labeled AS (
    SELECT src AS doc_id, MIN(node) AS cluster FROM reach GROUP BY src
),
scored AS (
    SELECT l.doc_id, l.cluster, {quality_score_sql('c.text')} AS q
    FROM labeled l JOIN corpus c ON c.doc_id = l.doc_id
)
SELECT doc_id, cluster, q,
       ROW_NUMBER() OVER (PARTITION BY cluster
                          ORDER BY q DESC, doc_id ASC) = 1 AS keep
FROM scored
"""
