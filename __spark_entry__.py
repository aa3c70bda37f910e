"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship web-pages validation;
``queries()`` / ``oracle_sql()`` expose each implemented operator with
its DuckDB oracle (driver compares at sf=0.01).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xjs.flagship import (  # noqa: E402
    flagship_verdicts,
    flagship_violations,
    oracle_verdicts_sql,
    oracle_violations_sql,
)
from xjs.sources.webpages import DUCKDB_CTE  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_violations(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "webpages_violations": flagship_violations,
        "webpages_verdicts": flagship_verdicts,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "webpages_violations": oracle_violations_sql(DUCKDB_CTE),
        "webpages_verdicts": oracle_verdicts_sql(DUCKDB_CTE),
    }
