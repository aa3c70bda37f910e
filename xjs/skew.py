"""Explicit skew-handling for large equi-joins: salted join.

AQE's skew-join splits oversized partitions at runtime, but only for
sort-merge joins and only after a shuffle has already materialized the
hot partition's map output. Pre-salting is the static alternative the
north_rule calls for ("partitioning / shuffle / skew handled
explicitly"): replicate the dimension side S×, scatter the fact side's
hot key across S sub-keys with a deterministic hash salt, and join on
(key, salt) — every reducer sees at most ~rows(key)/S rows of any key.

Cost model: the dimension side grows S×, so this is for joins whose
dimension is too big to broadcast outright but small relative to the
fact (the classic 10 GB dim × 100 TB fact with a Zipfian key). For
broadcast-sized dims, ``F.broadcast`` is strictly better (no shuffle
at all); for balanced keys, a plain sort-merge is. The salt is a hash
of the fact row's own id — deterministic, so results are reproducible
and the operation is retry-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALTS = 16


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_id: str,
    n_salts: int = N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on fact_key = dim_key, shuffled on (key, salt) so a
    hot key spreads over ``n_salts`` reducers.  Returns fact.* + dim.*
    (minus the duplicate key and internal salt columns)."""
    spark = fact.sparkSession
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    dim_rep = dim.crossJoin(salts)  # S× replication of the small side
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(fact_id)), F.lit(n_salts)).cast("int")
    )
    joined = fact_s.join(
        dim_rep,
        on=(fact_s[fact_key] == dim_rep[dim_key]) & (fact_s["_salt"] == dim_rep["_salt"]),
        how=how,
    )
    return joined.drop("_salt").drop(dim_rep[dim_key])


def q_salted_join_orders(spark, sf_dir: str) -> DataFrame:
    """Orders x customer through the salted path — semantics are
    identical to the plain equi-join (the oracle), only the shuffle
    key changes; the driver's hash-compare proves it."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return salted_join(
        orders, customer, "o_custkey", "c_custkey", "o_orderkey"
    ).select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")


ORACLE_SALTED_JOIN_SQL = """
SELECT o_orderkey, o_custkey, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""
