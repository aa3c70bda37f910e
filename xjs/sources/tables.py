"""Table IO: Iceberg when available, parquet otherwise — one interface.

The north_rule targets Iceberg tables of web pages partitioned by
``days(warc_ts)`` (hidden partitioning).  This sandbox has no Iceberg
runtime jars, so the layer probes for them and degrades to parquet
with EXPLICIT ``partitionBy`` on a derived day column — identical
query code either way, and the checkpoint protocol (xjs.checkpoint)
maps to Iceberg's dynamic overwrite + MERGE INTO unchanged.

To enable Iceberg on a real cluster:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=<path> ...

and pass ``iceberg://lake.db.webpages`` identifiers to these helpers.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ICEBERG_PREFIX = "iceberg://"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, target: str) -> DataFrame:
    if target.startswith(ICEBERG_PREFIX):
        ident = target[len(ICEBERG_PREFIX):]
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg identifier given but no Iceberg runtime on the "
                "classpath — see xjs/sources/tables.py docstring"
            )
        return spark.read.format("iceberg").load(ident)
    return spark.read.parquet(target)


def write_table(
    df: DataFrame,
    target: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    if target.startswith(ICEBERG_PREFIX):
        ident = target[len(ICEBERG_PREFIX):]
        w = df.writeTo(ident)
        if mode == "overwrite":
            w.overwritePartitions()
        else:
            w.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)


def with_day_partition(df: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """Parquet stand-in for Iceberg's hidden days(ts) partitioning: an
    explicit day column the writer partitions by and the reader prunes
    on (filter warc_day = ... reaches the file listing)."""
    return df.withColumn("warc_day", F.to_date(F.col(ts_col)))
