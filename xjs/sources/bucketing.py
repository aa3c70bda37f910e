"""Bucketed co-located joins: pre-shuffle once at write time, join
forever without an Exchange (SURVEY.md §2.9 / task brief: "bucketing
for co-located joins").

The pattern for recurring large-dim joins at 100 TB: bucket BOTH
sides by the join key with the same bucket count at ingest; every
subsequent equi-join (validation runs, enrichment, dedup-evidence
joins) is Exchange-free — each task zips matching bucket files.  On
Iceberg the same is expressed with a bucket(N, key) partition
transform + storage-partitioned joins.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    w = df.write.bucketBy(n_buckets, key).mode("overwrite")
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables; planner elides both exchanges
    (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)
