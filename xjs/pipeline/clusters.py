"""Near-duplicate clustering + survivor selection: pairs -> connected
components -> one kept doc per cluster.

Label propagation over the (tiny, relative to the corpus) candidate
graph: each node takes the min label among itself and its neighbors,
iterated to convergence with a driver-side changed-count check.  Every
iteration is one join + one aggregation over EDGES (not documents);
real corpora have small diameters, so this terminates in a handful of
rounds — the classic iterative-algorithm shape on Spark (same topology
as GraphX's connected components).

Oracle: a DuckDB recursive CTE computes true reachability minima; the
convergence loop must agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xjs.pipeline.dedup import DUCKDB_CORPUS_CTE, _minhash_sql, dedup_corpus, verified_near_duplicates

MAX_ITERS = 20


def connected_components(pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster): min doc_id reachable in the pair graph."""
    spark = pairs.sparkSession
    edges = pairs.select("doc_a", "doc_b")
    sym = edges.unionAll(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).distinct().cache()
    labels = (
        sym.select(F.col("doc_a").alias("id")).distinct()
        .select("id", F.col("id").alias("label"))
        .cache()
    )
    for _ in range(MAX_ITERS):
        neighbor_min = (
            sym.join(labels, sym.doc_b == labels.id)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nl"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.doc_a, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nl"), F.col("label"))).alias("label"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
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
