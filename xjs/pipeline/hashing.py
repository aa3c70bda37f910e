"""Portable deterministic hashing — identical arithmetic in Spark
Column expressions and DuckDB SQL, so every hash-based pipeline op
(minhash, simhash, fingerprints, LSH) has an exact SQL oracle.

The production path should swap ``char_hash`` for ``xxhash64`` (native,
~10x faster, same plan shape) via ``hash_mode='native'`` where offered;
the portable polynomial hash exists so correctness is provable against
an independent engine.  Both are JVM-side expressions — no Python in
the row loop either way.
"""

from __future__ import annotations


from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
SEED = 7
CHAR_A = 31


def char_hash(col: Column) -> Column:
    """Polynomial char hash: fold (acc*31 + ascii(c)) % MOD, seed 7."""
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(SEED).cast("long"),
        lambda acc, c: (acc * CHAR_A + c) % MOD,
    )


def char_hash_sql(expr: str) -> str:
    return (
        f"list_reduce(list_prepend({SEED}::BIGINT, "
        f"list_transform(string_split({expr}, ''), c -> ascii(c)::BIGINT)), "
        f"(a, b) -> (a * {CHAR_A} + b) % {MOD})"
    )


def hash_params(k: int) -> tuple[int, int]:
    """Deterministic (a, b) for the k-th universal-ish hash h_k(x) =
    (a*x + b) % MOD."""
    return (2 * k + 3, 5 * k + 7)


def rehash(h: Column, k: int) -> Column:
    a, b = hash_params(k)
    return (h * a + b) % MOD


def rehash_sql(expr: str, k: int) -> str:
    a, b = hash_params(k)
    return f"(({expr}) * {a} + {b}) % {MOD}"
