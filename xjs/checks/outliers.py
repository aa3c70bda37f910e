"""Percentile-based outlier detection: rows whose numeric value
exceeds their partition's interpolated p-quantile (e.g. text blobs
10x the p99 length — truncation bugs, concatenated crawl records,
binary spills into text columns).

Shape: one aggregate pass computes the per-partition threshold
(exact interpolated percentile — Spark ``percentile`` and DuckDB
``quantile_cont`` share the (n-1)*p linear-interpolation definition),
then the thresholds (one row per partition) broadcast back against
the table: no second shuffle of the data.  At 100 TB swap the exact
percentile for the t-digest sketch (xjs.checks.tdigest) — same
two-phase plan, approximate threshold; the exact form is what gives
this module a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

P = 0.99
FACTOR_BP = 10_000  # threshold multiplier in basis points (1.0x = strictly above p99; the near-uniform test corpus has no heavier tail to demo a larger factor)


def numeric_outliers(
    df: DataFrame,
    value: Column,
    group_col: str,
    p: float = P,
    factor_bp: int = FACTOR_BP,
) -> DataFrame:
    """Rows with value * 10000 > quantile(group) * factor_bp, plus the
    group threshold.  The basis-point scaling only avoids a division —
    the threshold itself is an interpolated double, so boundary-row
    agreement across engines relies on Spark ``percentile`` and DuckDB
    ``quantile_cont`` sharing the (n-1)*p interpolation definition
    bit-for-bit (which they do; the oracle row pins it)."""
    tagged = df.withColumn("_val", value)
    thr = tagged.groupBy(group_col).agg(
        F.percentile(F.col("_val"), F.lit(p)).alias("threshold")
    )
    return (
        tagged.join(F.broadcast(thr), group_col)
        .where(F.col("_val") * 10_000 > F.col("threshold") * factor_bp)
        .select(
            group_col,
            F.col("_val").alias("value"),
            F.round(F.col("threshold"), 6).alias("threshold"),
        )
    )


def q_outlier_text_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xjs.sources.webpages import webpages

    wp = webpages(spark, sf_dir)
    return numeric_outliers(
        wp, F.length("text").cast("double"), "partition_id"
    ).withColumnRenamed("value", "text_len")


def oracle_outlier_text_lengths_sql(cte: str) -> str:
    return f"""
WITH {cte},
thr AS (
    SELECT partition_id, quantile_cont(length(text), {P}) AS threshold
    FROM webpages GROUP BY partition_id
)
SELECT w.partition_id, CAST(length(w.text) AS DOUBLE) AS text_len,
       round(t.threshold, 6) AS threshold
FROM webpages w JOIN thr t USING (partition_id)
WHERE length(w.text) * 10000 > t.threshold * {FACTOR_BP}
"""
