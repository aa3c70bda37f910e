"""robots.txt exclusion filtering — the crawl-compliance gate every
web corpus pipeline (C4, CCNet, RefinedWeb) runs before training-data
selection: drop pages whose path a domain's robots policy disallows.

Semantics (RFC 9309, user-agent ``*`` group, simplified to the
allow/disallow core): among the rules of the url's domain whose path
PREFIX matches the url path, the LONGEST match wins; on a length tie
``allow`` wins; a url with no matching rule is allowed.

Spark-first shape — the thing to avoid is a corpus × rules explode:

  1. the rules cache is packed to DOMAIN grain — one row per domain
     carrying its rules as an array (robots files are bounded, so the
     array is small by construction),
  2. the corpus joins that table ONCE on domain (broadcast when the
     cache fits — the default here; at a 10^8-domain cache, a plain
     shuffle join on domain with the existing salted-join machinery
     for hot domains),
  3. match + longest-wins evaluated NARROWLY per row with array HOFs
     (filter + aggregate over a struct whose (len, allow) field order
     makes Spark's struct comparison implement the RFC tie-break).
     Arrays are rule-count-sized (tens), so the interpreted-HOF cost
     sits on a dozen elements per row, not a corpus-sized axis — the
     boundedness that the embedding family (similarity.py) lacked.

The fixture derives a deterministic per-domain policy from the
documents table's own url formula, and the DuckDB oracle restates
longest-match with a window over the same VALUES rules — so the green
row pins prefix semantics, the tie-break, and the no-match default.

The reference engine (/root/reference, a schema validator) has no
corpus operators; this op belongs to the training-data-pipeline
mandate (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: per-domain policy template: digit-prefix rules exercise real
#: longest-match behavior over the fixture's /doc/{id} paths —
#: ids starting 1 are blocked EXCEPT ids starting 12 (longer allow),
#: ids starting 3 are blocked
RULE_TEMPLATE: list[tuple[str, bool]] = [
    ("/doc/1", False),
    ("/doc/12", True),
    ("/doc/3", False),
]
#: one domain gets a whole-site disallow (plus the template's /doc/12
#: re-allow) — the takedown-domain profile
BLOCKED_SOURCE = "src7"


def robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(domain, prefix, allow) — the deterministic fixture policy over
    the corpus's own domains (documents.source)."""
    sources = (spark.read.parquet(f"{sf_dir}/documents.parquet")
               .select("source").distinct())
    rows = F.array(*[
        F.struct(F.lit(p).alias("prefix"), F.lit(a).alias("allow"))
        for p, a in RULE_TEMPLATE
    ])
    blocked = F.array_append(
        rows, F.struct(F.lit("/doc/").alias("prefix"),
                       F.lit(False).alias("allow")))
    return sources.select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("domain"),
        F.explode(
            F.when(F.col("source") == BLOCKED_SOURCE, blocked)
            .otherwise(rows)
        ).alias("r"),
    ).select("domain", F.col("r.prefix").alias("prefix"),
             F.col("r.allow").alias("allow"))


def robots_filter(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """``df`` + (allowed boolean, matched_prefix) under the domain's
    robots policy — longest prefix match, allow wins ties, no match
    means allowed.

    ``broadcast_rules=True`` (default) for caches that fit an executor
    broadcast; at registry scale pass False and the join shuffles on
    domain (rules stay one row per domain either way)."""
    packed = rules.groupBy("domain").agg(
        F.collect_list(F.struct("prefix", "allow")).alias("rules"))
    if broadcast_rules:
        packed = F.broadcast(packed)
    domain = F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)", 1)
    path = F.regexp_extract(F.col(url_col), r"^[a-z]+://[^/]+(/.*)?$", 1)
    with_rules = df.withColumn("_domain", domain).join(
        packed.withColumnRenamed("domain", "_domain"), "_domain", "left")
    # candidates: matching rules as (len, allow, prefix) structs —
    # field order makes struct max() implement longest-wins then
    # allow-wins; sentinel (-1, true, '') is the no-match default
    matched = F.filter(
        F.coalesce(F.col("rules"), F.array()),
        lambda r: path.startswith(r["prefix"]),
    )
    sentinel = F.struct(F.lit(-1).alias("l"), F.lit(True).alias("a"),
                        F.lit("").alias("p"))
    best = F.aggregate(
        matched,
        sentinel,
        lambda acc, r: F.when(
            F.struct(F.length(r["prefix"]).alias("l"),
                     r["allow"].alias("a"),
                     r["prefix"].alias("p")) > acc,
            F.struct(F.length(r["prefix"]).alias("l"),
                     r["allow"].alias("a"),
                     r["prefix"].alias("p")),
        ).otherwise(acc),
    )
    return with_rules.withColumn("_best", best).select(
        *[F.col(c) for c in df.columns],
        F.col("_best.a").alias("allowed"),
        F.when(F.col("_best.l") >= 0, F.col("_best.p"))
        .alias("matched_prefix"),
    )


# ---------------------------------------------------------------------------
# query + oracle
# ---------------------------------------------------------------------------


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.select(
        "doc_id",
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
    )
    return robots_filter(corpus, robots_rules(spark, sf_dir))


def oracle_robots_filter_sql() -> str:
    tmpl = ", ".join(f"('{p}', {str(a).lower()})" for p, a in RULE_TEMPLATE)
    return f"""
WITH corpus AS (
    SELECT doc_id,
           'https://' || source || '.example.com/doc/' || doc_id AS url,
           source || '.example.com' AS domain,
           '/doc/' || doc_id AS path
    FROM documents
),
template(prefix, allow) AS (VALUES {tmpl}),
rules AS (
    SELECT s.source || '.example.com' AS domain, t.prefix, t.allow
    FROM (SELECT DISTINCT source FROM documents) s, template t
    UNION ALL
    SELECT '{BLOCKED_SOURCE}.example.com', '/doc/', false
    FROM (SELECT DISTINCT source FROM documents)
    WHERE source = '{BLOCKED_SOURCE}'
),
matched AS (
    SELECT c.doc_id, c.url, r.prefix, r.allow,
           ROW_NUMBER() OVER (
               PARTITION BY c.doc_id
               ORDER BY length(r.prefix) DESC, r.allow DESC) AS rn
    FROM corpus c
    JOIN rules r ON r.domain = c.domain
        AND starts_with(c.path, r.prefix)
)
SELECT c.doc_id, c.url,
       COALESCE(m.allow, true) AS allowed,
       m.prefix AS matched_prefix
FROM corpus c
LEFT JOIN matched m ON m.doc_id = c.doc_id AND m.rn = 1
"""
