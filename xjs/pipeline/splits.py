"""Leakage-safe train/val/test split assignment.

A plain hash split (``hash(doc_id) % 100``) contaminates evaluation:
near-duplicate documents land in different splits, so the model is
"tested" on paraphrases of its training data.  The fix is to split at
CLUSTER grain — every member of a verified near-duplicate component
gets the same split, because the split variate hashes the component's
canonical id (min doc_id), not the document's own.

Composition, all existing machinery: verified near-dup pairs
(pipeline.dedup) → connected components (pipeline.clusters) →
md5-variate range assignment (the mixture/export arithmetic, bit-exact
in DuckDB).  Singletons are their own cluster, so corpus coverage is
total and every row gets exactly one split.

100 TB shape: the pair graph and components are dedup's existing
cost (already run for dedup itself — the split rides the SAME
component table); assignment is a broadcast-or-SMJ join of the
(doc_id, cluster) labels back to the corpus plus one narrow
projection.  Weights are integer per-mille ranges so the verdict is
exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xjs.pipeline.clusters import connected_components
from xjs.pipeline.sampling import _md5_variate, _md5_variate_sql

SPLIT_SEED = "split"
#: (name, per-mille width) — cumulative ranges over [0, 1000)
DEFAULT_SPLITS = (("train", 800), ("val", 100), ("test", 100))


def assign_splits(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
    seed: str = SPLIT_SEED,
) -> DataFrame:
    """(id, cluster, split): deterministic split with the leakage
    guarantee — rows sharing a near-duplicate component share a split
    BY CONSTRUCTION (the variate hashes the cluster id)."""
    assert sum(w for _, w in splits) == 1000, "per-mille widths must sum to 1000"
    comp = connected_components(pairs)
    assigned = df.select(id_col).join(comp, id_col, "left").select(
        id_col,
        F.coalesce(F.col("cluster"), F.col(id_col)).alias("cluster"),
    )
    v = F.pmod(_md5_variate(F.col("cluster"), seed), F.lit(1000))
    expr = None
    hi = 0
    for name, width in splits:
        hi += width
        cond = v < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return assigned.select(id_col, "cluster", expr.alias("split"))


def q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xjs.pipeline.dedup import dedup_corpus, verified_near_duplicates

    corpus = dedup_corpus(spark, sf_dir)
    return assign_splits(corpus, verified_near_duplicates(corpus))


def oracle_split_leakage_safe_sql() -> str:
    # the clusters oracle's recursive reachability + the md5 range
    # assignment, with singletons as their own cluster
    from xjs.pipeline.dedup import (
        DUCKDB_CORPUS_CTE,
        JACCARD_T,
        _minhash_sql,
    )

    v = _md5_variate_sql("cluster", SPLIT_SEED)
    cases = []
    hi = 0
    for name, width in DEFAULT_SPLITS:
        hi += width
        cases.append(f"WHEN ({v}) % 1000 < {hi} THEN '{name}'")
    case = "CASE " + " ".join(cases) + " END"
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
comp AS (
    SELECT src AS doc_id, MIN(node) AS cluster FROM reach GROUP BY src
),
assigned AS (
    SELECT c.doc_id, COALESCE(p.cluster, c.doc_id) AS cluster
    FROM corpus c LEFT JOIN comp p USING (doc_id)
)
SELECT doc_id, cluster, {case} AS split FROM assigned
"""
