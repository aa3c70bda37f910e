#!/usr/bin/env python3
"""Replicates the round driver's correctness gate locally: runs every
``__spark_entry__.queries()`` entry against its ``oracle_sql()`` DuckDB
equivalent and compares row counts + order-insensitive value content.

Usage:
    python3 scripts/check_oracles.py [query_name ...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    """pandas DF -> canonical sorted rows for order-insensitive compare."""
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v))
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from xjs.session import get_spark

    spark = get_spark(app_name="check-oracles", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    failures = []
    for name in names:
        q = qs[name]
        try:
            mine = q(spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: SPARK ERROR {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"~ {name}: no oracle (rows-only) -> {len(mine)} rows")
            continue
        try:
            ora = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: ORACLE ERROR {e}")
            failures.append(name)
            continue
        a, b = normalize(mine), normalize(ora)
        if list(a.columns) != list(b.columns):
            print(f"✗ {name}: column mismatch {list(a.columns)} vs {list(b.columns)}")
            failures.append(name)
        elif len(a) != len(b):
            print(f"✗ {name}: row count {len(a)} vs {len(b)}")
            failures.append(name)
        elif not a.equals(b):
            diff = a.compare(b) if a.shape == b.shape else None
            print(f"✗ {name}: value mismatch\n{diff.head(5) if diff is not None else ''}")
            failures.append(name)
        else:
            print(f"✓ {name}: {len(a)} rows match")
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
