"""URL canonicalization + canonical-URL dedup.

Web corpora carry the same page under many raw URLs: tracking query
params (``utm_*``, ``fbclid``, ``gclid``), fragments, ``www.``
prefixes, default ports, case-variant hosts, trailing slashes.
Canonicalizing before dedup collapses these families without touching
page content — the cheapest dedup pass in a crawl pipeline, and the
first one to run because it is a **narrow, zero-shuffle projection**
(pure regexp/string Catalyst expressions fused into the scan).  The
only shuffle is the final groupBy(canonical), a plain hash aggregation
with map-side partials.

Every regexp used here is RE2-compatible so the DuckDB oracle runs the
byte-identical transform (DuckDB ``regexp_replace`` needs the explicit
``'g'`` flag to match Spark's replace-all default).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: (pattern, replacement) pipeline applied to the part BEFORE the path
#: split; see canonical_url for the full algorithm.
_TRACKING = "(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*&?"
_PREFIX = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*"


def canonical_url(col: Column) -> Column:
    """Canonical form: drop fragment, drop tracking params, lowercase
    scheme+host, strip ``www.`` and default ports, strip trailing
    slashes.  Path/query case is preserved."""
    u = F.regexp_replace(col, "#.*", "")              # fragment
    u = F.regexp_replace(u, _TRACKING, "")            # tracking params
    u = F.regexp_replace(u, "[?&]+$", "")             # dangling ? / &
    prefix = F.regexp_extract(u, _PREFIX, 0)          # scheme://host[:port]
    rest = F.substring(u, F.length(prefix) + 1, F.lit(1 << 30))
    prefix = F.lower(prefix)
    prefix = F.regexp_replace(prefix, "://www\\.", "://")
    prefix = F.regexp_replace(prefix, ":(80|443)$", "")
    rest = F.regexp_replace(rest, "/+$", "")
    return F.concat(prefix, rest)


def canonical_url_sql(expr: str) -> str:
    """The byte-identical transform in DuckDB SQL."""
    u = f"regexp_replace({expr}, '#.*', '', 'g')"
    u = f"regexp_replace({u}, '{_TRACKING}', '', 'g')"
    u = f"regexp_replace({u}, '[?&]+$', '', 'g')"
    prefix = f"regexp_extract({u}, '{_PREFIX}', 0)"
    rest = f"substring({u}, length({prefix}) + 1)"
    canon_prefix = (
        f"regexp_replace(regexp_replace(lower({prefix}),"
        f" '://www\\.', '://', 'g'), ':(80|443)$', '', 'g')"
    )
    canon_rest = f"regexp_replace({rest}, '/+$', '', 'g')"
    return f"({canon_prefix} || {canon_rest})"


def canonical_groups(df: DataFrame, url_col: str = "url",
                     id_col: str = "doc_id") -> DataFrame:
    """Canonical-URL dedup: (canonical_url, n_rows, n_distinct_raw,
    survivor_doc_id) for every canonical form covering >= 2 rows.
    Survivor = min id (deterministic keep-first policy)."""
    canon = df.select(
        F.col(id_col),
        F.col(url_col).alias("_raw"),
        canonical_url(F.col(url_col)).alias("canonical_url"),
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("_raw").alias("n_distinct_raw"),
            F.min(id_col).alias("survivor_doc_id"),
        )
        .filter(F.col("n_rows") >= 2)
    )


# ---------------------------------------------------------------------------
# driver query + oracle: deterministic raw-URL variants over webpages
# ---------------------------------------------------------------------------
# The webpages table has clean URLs, so the query derives the messy raw
# forms a crawler would actually see (tracking junk, fragments, www.,
# trailing slash) at fixed doc_id residues, then proves canonicalization
# collapses them back onto the clean duplicates.

def _messy(url: Column, doc_id: Column) -> Column:
    u = F.when(doc_id % 7 == 0,
               F.concat(url, F.lit("?utm_source=feed&utm_campaign=x"))
               ).otherwise(url)
    u = F.when(doc_id % 11 == 0, F.concat(u, F.lit("#section-2"))).otherwise(u)
    u = F.when(doc_id % 13 == 0,
               F.regexp_replace(u, "://", "://www.")).otherwise(u)
    u = F.when(doc_id % 17 == 0, F.concat(u, F.lit("/"))).otherwise(u)
    return u


_MESSY_SQL = """
CASE WHEN doc_id % 17 = 0 THEN m3 || '/' ELSE m3 END
""".strip()


def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xjs.sources.webpages import webpages

    wp = webpages(spark, sf_dir).select(
        "doc_id", _messy(F.col("url"), F.col("doc_id")).alias("raw_url")
    )
    return canonical_groups(wp, "raw_url", "doc_id")


def oracle_url_canonical_dedup_sql(cte: str) -> str:
    canon = canonical_url_sql("raw_url")
    return f"""
WITH {cte},
m1 AS (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0
                THEN url || '?utm_source=feed&utm_campaign=x' ELSE url END AS m1
    FROM webpages
),
m2 AS (
    SELECT doc_id,
           CASE WHEN doc_id % 11 = 0 THEN m1 || '#section-2' ELSE m1 END AS m2
    FROM m1
),
m3 AS (
    SELECT doc_id,
           CASE WHEN doc_id % 13 = 0
                THEN regexp_replace(m2, '://', '://www.', 'g') ELSE m2 END AS m3
    FROM m2
),
raw AS (
    SELECT doc_id, {_MESSY_SQL} AS raw_url FROM m3
),
canon AS (
    SELECT doc_id, raw_url, {canon} AS canonical_url FROM raw
)
SELECT canonical_url, COUNT(*) AS n_rows,
       COUNT(DISTINCT raw_url) AS n_distinct_raw,
       MIN(doc_id) AS survivor_doc_id
FROM canon
GROUP BY canonical_url
HAVING COUNT(*) >= 2
"""
