"""Referential checks: fact keys must exist in a dimension
(north_star class: "broadcast/sort-merge joins against a domain
allowlist dimension").

Small dimension -> explicit ``broadcast()`` left-anti join (no
shuffle of the fact table at all: the allowlist ships to every
executor).  Large dimension -> plain left-anti (sort-merge) with AQE
free to pick broadcast at runtime if stats allow.
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sources deliberately excluded from the allowlist -> expected violations
DENYLISTED_SOURCES = ("src17", "src18", "src19")

_DOMAIN_RE = "^(?:[a-zA-Z][a-zA-Z0-9.+-]*://)?([^/]+)"


def domain_of(url_col) -> F.Column:
    return F.regexp_extract(url_col, _DOMAIN_RE, 1)


def missing_keys(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str,
                 broadcast_dim: bool = True) -> DataFrame:
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=fact[fact_key] == d[dim_key], how="left_anti")


def domain_allowlist(spark, sf_dir: str) -> DataFrame:
    """Deterministic dimension: every document source except the
    denylisted ones, as `<source>.example.com` domains."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select("source")
        .filter(~F.col("source").isin(*DENYLISTED_SOURCES))
        .distinct()
        .select(F.concat(F.col("source"), F.lit(".example.com")).alias("domain"))
    )


def webpages_referential_violations(spark, sf_dir: str) -> DataFrame:
    """(url, domain, partition_id) rows whose domain is not allowlisted."""
    from xjs.sources.webpages import webpages

    wp = webpages(spark, sf_dir).withColumn("domain", domain_of(F.col("url")))
    dim = domain_allowlist(spark, sf_dir)
    return missing_keys(wp, dim, "domain", "domain").select("url", "domain", "partition_id")


def oracle_referential_sql(cte: str) -> str:
    return f"""
WITH {cte},
allowlist AS (
    SELECT DISTINCT source || '.example.com' AS domain
    FROM documents
    WHERE source NOT IN ('src17', 'src18', 'src19')
)
SELECT url, regexp_extract(url, '^(?:[a-zA-Z][a-zA-Z0-9.+-]*://)?([^/]+)', 1) AS domain, partition_id
FROM webpages
WHERE regexp_extract(url, '^(?:[a-zA-Z][a-zA-Z0-9.+-]*://)?([^/]+)', 1) NOT IN (SELECT domain FROM allowlist)
"""


def orders_missing_customers(spark, sf_dir: str) -> DataFrame:
    """TPC-H-shaped referential integrity: orders whose customer is
    absent (driver tables are consistent, so this asserts emptiness —
    the oracle agrees)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        missing_keys(orders, customer, "o_custkey", "c_custkey")
        .select("o_orderkey", "o_custkey")
    )


ORACLE_ORDERS_MISSING_SQL = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
"""
