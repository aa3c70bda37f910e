"""Crawl snapshot diff at URL grain — what changed between two crawl
snapshots: pages added, removed, or whose content changed.  The
recrawl-scheduling / incremental-reprocessing primitive: downstream
stages re-run only over the churn, not the corpus.

Scale shape: this is the suite's one deliberately BIG-BIG join — both
sides are corpus-sized, so neither broadcasts and the join is a
co-partitioned shuffle on url (sort-merge or shuffled-hash under AQE,
skew-split eligible).  The load-bearing decision is what the shuffle
CARRIES: both snapshots are projected to (url, md5(text)) BEFORE the
join, so each shuffled row is a url + a 32-hex digest — page text
never moves.  The unchanged bulk (same digest both sides) is dropped
in the join's output filter, so the RESULT is churn-proportional
even though the join itself is corpus-sized.  Content equality is
md5-of-text, the same digest contract the exact-dedup family uses
(dedup.py), and exactly restatable in DuckDB.

The reference engine (/root/reference, a schema validator) has no
corpus operators; this op belongs to the training-data-pipeline
mandate (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(url, status, old_digest, new_digest) for every url whose
    presence or content differs between the snapshots; status in
    ('added', 'removed', 'changed').  Unchanged urls (same digest both
    sides) are excluded — output is churn-proportional.  NULL text
    digests to NULL, which compares as a content state of its own
    (NULL -> text and text -> NULL are 'changed'); urls are assumed
    unique per snapshot (the uniqueness check family exists to enforce
    exactly that upstream)."""
    o = old.select(F.col(url_col).alias("url"),
                   F.md5(F.col(text_col)).alias("old_digest"))
    n = new.select(F.col(url_col).alias("url"),
                   F.md5(F.col(text_col)).alias("new_digest"))
    # presence must be tracked by the join side, not digest nullness
    # (a present row may carry a NULL text digest) — use marker cols
    o2 = o.withColumn("_in_old", F.lit(True))
    n2 = n.withColumn("_in_new", F.lit(True))
    j = o2.join(n2, "url", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            F.col("old_digest").eqNullSafe(F.col("new_digest")),
            F.lit(None).cast("string"))
        .otherwise(F.lit("changed"))
    )
    return (j.select("url", status.alias("status"),
                     "old_digest", "new_digest")
            .filter(F.col("status").isNotNull()))


# ---------------------------------------------------------------------------
# fixture + query + constructive oracle
# ---------------------------------------------------------------------------
#
# old snapshot: every document.  new snapshot, as formulas of doc_id:
#   % 7 == 0  -> dropped from the new crawl        (removed)
#   % 5 == 0 (and % 7 != 0) -> text gets a suffix  (changed)
#   doc_id + 3_000_000 for % 11 == 0 -> new pages  (added)
#   everything else unchanged                      (excluded)


def _snapshots(spark: SparkSession, sf_dir: str):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "source", "text")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/doc/"),
                   F.col("doc_id").cast("string"))
    old = d.select(url.alias("url"), "text")
    kept = d.filter(F.col("doc_id") % 7 != 0)
    new_live = kept.select(
        url.alias("url"),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"), F.lit(" [updated]")))
        .otherwise(F.col("text")).alias("text"))
    added = (d.filter(F.col("doc_id") % 11 == 0)
             .select(F.concat(F.lit("https://"), F.col("source"),
                              F.lit(".example.com/doc/"),
                              (F.col("doc_id") + 3_000_000).cast("string"))
                     .alias("url"),
                     "text"))
    return old, new_live.unionByName(added)


def q_crawl_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _snapshots(spark, sf_dir)
    return crawl_diff(old, new)


def oracle_crawl_diff_sql() -> str:
    return """
WITH old_snap AS (
    SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
           md5(text) AS old_digest
    FROM documents
),
new_snap AS (
    SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
           md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [updated]'
                    ELSE text END) AS new_digest
    FROM documents WHERE doc_id % 7 != 0
    UNION ALL
    SELECT 'https://' || source || '.example.com/doc/'
               || (doc_id + 3000000) AS url,
           md5(text) AS new_digest
    FROM documents WHERE doc_id % 11 = 0
),
j AS (
    SELECT COALESCE(o.url, n.url) AS url,
           o.url IS NOT NULL AS in_old, n.url IS NOT NULL AS in_new,
           o.old_digest, n.new_digest
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.url = n.url
)
SELECT url,
       CASE WHEN NOT in_old THEN 'added'
            WHEN NOT in_new THEN 'removed'
            ELSE 'changed' END AS status,
       old_digest, new_digest
FROM j
WHERE (NOT in_old) OR (NOT in_new)
   OR (old_digest IS DISTINCT FROM new_digest)
"""
