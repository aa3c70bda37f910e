"""Approximate heavy hitters (frequent items) with an exact confirm
pass — the scalable answer to "which keys dominate the corpus?"
(hot domains, crawl-loop URLs, bot users) when the key cardinality is
too high for a plain groupBy to be cheap.

Two-stage shape:

1. **Misra-Gries sketch per partition** (``mapInPandas``, Arrow
   batches, bounded ``capacity`` counters of state regardless of
   partition size).  MG guarantee: any item with local frequency
   > N_p/(capacity+1) survives the partition summary; by a weighted-
   average argument an item with global frequency >= s*N exceeds that
   rate in at least one partition whenever capacity+1 > 1/s — so the
   union of partition summaries is a provable superset of the true
   heavy hitters (here s = 8/1000, capacity = 256 >> 125).
2. **Exact confirm**: broadcast the tiny candidate set back against
   the fact table, count exactly, keep count*s_den >= s_num*total.
   The final answer is therefore *exact* (sketch recall + exact
   precision), which is what makes a DuckDB HAVING oracle possible.

At 100 TB stage 1 is a narrow scan (no shuffle, constant memory);
stage 2 shuffles only rows matching ~candidates (a broadcast
semi-join prunes the rest map-side).  The threshold scalar is a
broadcast 1-row aggregate, not a driver ``.collect()`` round-trip.
Integer threshold arithmetic (count*s_den >= s_num*total) avoids
float boundary drift between engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

S_NUM, S_DEN = 8, 1000   # heavy = frequency >= 0.8% of rows
CAPACITY = 256


def _mg_reduce(counts: dict, capacity: int) -> dict:
    """Misra-Gries reduce-to-capacity: subtract the (m-capacity)-th
    smallest count from all, drop non-positive (mergeable-summaries
    form; error grows by the subtracted amount)."""
    if len(counts) <= capacity:
        return counts
    vals = sorted(counts.values())
    dec = vals[len(counts) - capacity - 1]
    return {k: v - dec for k, v in counts.items() if v > dec}


def mg_candidates(df: DataFrame, col: str, capacity: int = CAPACITY) -> DataFrame:
    """Per-partition MG summaries: (item, est) with <= capacity rows
    per partition.  Batch counting is vectorized (value_counts); the
    Python dict holds only the bounded sketch state."""
    item_type = dict(df.dtypes)[col]

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            s = pdf[col]
            # NULL is a countable key (a NULL-heavy column is exactly
            # the kind of data-quality hotspot this check exists for);
            # value_counts() drops NaN silently, so count it explicitly
            # under a None key (ADVICE r2)
            n_null = int(s.isna().sum())
            if n_null:
                counts[None] = counts.get(None, 0) + n_null
            for item, c in s.dropna().value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            counts = _mg_reduce(counts, capacity)
        if counts:
            yield pd.DataFrame(
                {
                    "item": pd.array(list(counts.keys()), dtype="object"),
                    "est": list(counts.values()),
                }
            )

    return df.select(col).mapInPandas(summarize, f"item {item_type}, est bigint")


def heavy_hitters(
    df: DataFrame,
    col: str,
    s_num: int = S_NUM,
    s_den: int = S_DEN,
    capacity: int = CAPACITY,
) -> DataFrame:
    """Exact (item, n_rows) for every item with frequency >=
    s_num/s_den of the table.  Requires capacity+1 > s_den/s_num for
    the sketch superset guarantee."""
    if (capacity + 1) * s_num <= s_den:
        raise ValueError(
            f"capacity {capacity} too small for threshold {s_num}/{s_den}; "
            f"need capacity+1 > {s_den // s_num}"
        )
    cands = mg_candidates(df, col, capacity).select(F.col("item").alias("_cand")).distinct()
    # null-safe semi join: a NULL candidate must still match NULL rows
    # (a plain equi-join key would drop the NULL group at confirm time)
    exact = (
        df.join(F.broadcast(cands), F.col(col).eqNullSafe(F.col("_cand")), "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    return (
        exact.join(F.broadcast(total))
        .where(F.col("n_rows") * s_den >= s_num * F.col("_total"))
        .drop("_total")
    )


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return heavy_hitters(ev, "user_id").withColumnRenamed("user_id", "item")


def oracle_heavy_hitters_sql() -> str:
    return f"""
SELECT user_id AS item, COUNT(*) AS n_rows
FROM events
GROUP BY user_id
HAVING COUNT(*) * {S_DEN} >= {S_NUM} * (SELECT COUNT(*) FROM events)
"""
