"""Single-pass per-partition column stats (north_star constraint class).

ONE ``groupBy(partition).agg(...)`` computes every column's metrics at
once — count / null-count / min / max / mean / distinct / quantiles —
so the table is scanned exactly once and shuffled exactly once, with
map-side partial aggregation doing most of the work before the
exchange.  All aggregates used have merge semantics, so the same plan
scales to any executor count.

Two modes:

* ``approx`` (the 100 TB default): ``approx_count_distinct`` (HLL,
  constant memory) and ``percentile_approx`` (GK sketch) — both
  mergeable sketches;
* ``exact``: ``count_distinct`` / ``percentile`` — used for the
  DuckDB-oracle correctness gate (sketches aren't oracle-comparable).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    partition_cols: Sequence[str],
    numeric_cols: Sequence[str] = (),
    categorical_cols: Sequence[str] = (),
    timestamp_cols: Sequence[str] = (),
    quantiles: Sequence[float] = (0.5,),
    mode: str = "approx",
) -> DataFrame:
    aggs: List[Column] = [F.count(F.lit(1)).alias("n_rows")]

    def distinct(c: str) -> Column:
        if mode == "approx":
            return F.approx_count_distinct(c)
        return F.count_distinct(F.col(c))

    for c in numeric_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.round(F.avg(c), 6).alias(f"{c}_avg"),
        ]
        for q in quantiles:
            qname = f"{c}_p{int(q * 100)}"
            if mode == "approx":
                aggs.append(F.percentile_approx(c, q).alias(qname))
            else:
                aggs.append(F.round(F.percentile(F.col(c), F.lit(q)), 6).alias(qname))
    for c in categorical_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
            distinct(c).alias(f"{c}_distinct"),
        ]
    for c in timestamp_cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ]

    return df.groupBy(*partition_cols).agg(*aggs)


def webpages_stats(spark, sf_dir: str, mode: str = "exact") -> DataFrame:
    """Flagship stats query: one pass over the web-pages table."""
    from xjs.sources.webpages import webpages

    wp = webpages(spark, sf_dir).withColumn("text_len", F.length("text")).withColumn(
        "html_bytes", F.octet_length("html")
    )
    return column_stats(
        wp,
        ["partition_id"],
        numeric_cols=["text_len", "html_bytes"],
        categorical_cols=["lang"],
        timestamp_cols=["warc_ts"],
        quantiles=(0.5,),
        mode=mode,
    )


def oracle_webpages_stats_sql(cte: str) -> str:
    return f"""
WITH {cte}
SELECT
    partition_id,
    COUNT(*) AS n_rows,
    COUNT(*) FILTER (WHERE text IS NULL) AS text_len_nulls,
    MIN(length(text)) AS text_len_min,
    MAX(length(text)) AS text_len_max,
    ROUND(AVG(length(text)), 6) AS text_len_avg,
    ROUND(quantile_cont(length(text), 0.5), 6) AS text_len_p50,
    COUNT(*) FILTER (WHERE html_str IS NULL) AS html_bytes_nulls,
    MIN(strlen(html_str)) AS html_bytes_min,
    MAX(strlen(html_str)) AS html_bytes_max,
    ROUND(AVG(strlen(html_str)), 6) AS html_bytes_avg,
    ROUND(quantile_cont(strlen(html_str), 0.5), 6) AS html_bytes_p50,
    COUNT(*) FILTER (WHERE lang IS NULL) AS lang_nulls,
    COUNT(DISTINCT lang) AS lang_distinct,
    MIN(warc_ts) AS warc_ts_min,
    MAX(warc_ts) AS warc_ts_max
FROM webpages
GROUP BY partition_id
"""
