"""Domain-level reputation profiles — the per-source curation gate a
webtext pipeline applies before document-level filtering (CCNet /
RefinedWeb-style source scoring).

One aggregation over the page table keyed by registrable domain:
document count, clean rate (fraction passing the full compiled check
plan — the same codegen'd ``pass_all`` predicate the quarantine router
uses), mean quality score, duplicate-URL rate, and the reputation
verdict gating all of them.

Scale shape: a single groupBy(domain) with map-side partial
aggregation; `countDistinct(url)` is the only two-phase aggregate
(Spark plans it as the standard expand + two-stage agg).  Domains are
Zipfian but the per-domain state is O(1) scalars plus the distinct-url
map-side partials, so no salting is needed until a single domain's
distinct-url set dominates an executor — at which point the salted
two-stage pattern from ``xjs.checks.uniqueness`` drops in unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xjs.checks.referential import domain_of
from xjs.pipeline.text import quality_score, quality_score_sql
from xjs.plan import CheckPlan

MIN_CLEAN_RATE = 0.9
MIN_MEAN_QUALITY = 0.3


def domain_profile(df: DataFrame, plan: CheckPlan,
                   url_col: str = "url", text_col: str = "text") -> DataFrame:
    """(domain, n_docs, clean_rate, mean_quality, n_urls, dup_rate,
    reputable) per domain."""
    per_row = df.select(
        domain_of(F.col(url_col)).alias("domain"),
        F.col(url_col).alias("_url"),
        plan.pass_all().cast("double").alias("_clean"),
        quality_score(F.col(text_col)).alias("_q"),
    )
    agg = per_row.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("_clean"), 4).alias("clean_rate"),
        F.round(F.avg("_q"), 4).alias("mean_quality"),
        F.countDistinct("_url").alias("n_urls"),
    )
    return agg.select(
        "domain", "n_docs", "clean_rate", "mean_quality", "n_urls",
        F.round(1 - F.col("n_urls") / F.col("n_docs"), 4).alias("dup_rate"),
        (
            (F.col("clean_rate") >= MIN_CLEAN_RATE)
            & (F.col("mean_quality") >= MIN_MEAN_QUALITY)
        ).alias("reputable"),
    )


def q_domain_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xjs.flagship import compile_plan
    from xjs.sources.webpages import webpages

    wp = webpages(spark, sf_dir)
    return domain_profile(wp, compile_plan(wp))


def oracle_domain_reputation_sql(cte: str) -> str:
    from xjs.flagship import ORACLE_CHECKS

    any_fail = " OR ".join(f"({cond})" for _p, _k, _vj, _r, cond, _a in ORACLE_CHECKS)
    q = quality_score_sql("text")
    return f"""
WITH {cte},
per AS (
    SELECT regexp_extract(url, '^(?:[a-zA-Z][a-zA-Z0-9.+-]*://)?([^/]+)', 1)
               AS domain,
           url,
           CASE WHEN NOT ({any_fail}) THEN 1.0 ELSE 0.0 END AS clean,
           {q} AS q
    FROM webpages
),
agg AS (
    SELECT domain, COUNT(*) AS n_docs,
           ROUND(AVG(clean), 4) AS clean_rate,
           ROUND(AVG(q), 4) AS mean_quality,
           COUNT(DISTINCT url) AS n_urls
    FROM per GROUP BY domain
)
SELECT domain, n_docs, clean_rate, mean_quality, n_urls,
       ROUND(1 - n_urls / n_docs::DOUBLE, 4) AS dup_rate,
       (clean_rate >= {MIN_CLEAN_RATE} AND mean_quality >= {MIN_MEAN_QUALITY})
           AS reputable
FROM agg
"""
