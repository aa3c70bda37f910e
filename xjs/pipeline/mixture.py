"""Data-mixture sampling: per-source epoch weighting — the recipe
stage that turns a curated pool into the training mixture ("2.5
epochs of wiki, 0.3 epochs of crawl", the static-weight scheme of
DoReMi/Llama-style data recipes).

Each document in source ``s`` with weight ``e`` appears
``floor(e)`` times, plus one more copy iff a deterministic per-doc
uniform variate falls below ``frac(e)`` — so per-source expected
token mass is exactly ``e×`` the pool, every run reproduces the same
mixture, and a weight below 1 is a plain down-sample.  Copies carry a
``rep`` index so downstream shuffling (export.shard_key seeds on
(doc, rep)) spreads replicas apart instead of clumping them.

Scale shape: ONE narrow projection — the weight lookup is a literal
CASE chain (the mixture table is recipe-sized), the copy count is
arithmetic on a seeded md5 variate, and replication is
``explode(sequence(...))`` fused into the scan.  Zero shuffle, zero
Python; output size is exactly the mixture's token budget.  The
variate reuses the md5→60-bit arithmetic of xjs.pipeline.export, so
the DuckDB oracle is bit-exact.

The reference engine (/root/reference, a schema validator) has no
corpus operators; this op belongs to the training-data-pipeline
mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 13
_SCALE = 1 << 60  # variate denominator (15 hex chars of md5)


def _u60(id_col: Column, seed: int) -> Column:
    """Deterministic integer variate in [0, 2^60) from the doc id —
    same md5/conv arithmetic as export.shard_key (oracle-exact)."""
    key = F.md5(F.concat(id_col.cast("string"), F.lit(f"#{seed}")))
    return F.conv(F.substring(key, 1, 15), 16, 10).cast("long")


def mixture_sample(
    df: DataFrame,
    epochs: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default: float = 1.0,
    seed: int = SEED,
) -> DataFrame:
    """(id, source, rep): the mixture expansion — each doc appears
    ``floor(e) + Bernoulli(frac(e))`` times for its source's weight
    ``e`` (deterministic variate), ``rep`` in [0, n_copies).  Join the
    result back on ``id_col`` to materialize payload columns, or
    select them through ``df``'s other columns directly (the operator
    preserves them)."""
    # recipe-sized literal CASE chain — broadcast-free weight lookup
    e = F.lit(float(default))
    for s, w in sorted(epochs.items()):
        e = F.when(F.col(source_col) == s, F.lit(float(w))).otherwise(e)
    base = F.floor(e).cast("long")
    frac = e - F.floor(e)
    # u < frac(e) <=> u60 < round(frac * 2^60); round() matches the
    # oracle's arithmetic exactly (frac has few decimal digits)
    extra = (
        _u60(F.col(id_col), seed) < F.round(frac * _SCALE).cast("long")
    ).cast("long")
    n = (base + extra).alias("_n")
    out = (
        df.withColumn("_n", n)
        .filter(F.col("_n") > 0)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )
    return out


#: the oracle/bench recipe: upsample two sources, downsample two,
#: leave the rest at 1 epoch
RECIPE = {"src0": 2.5, "src1": 2.0, "src2": 0.5, "src3": 0.25}


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    return mixture_sample(d, RECIPE).select("doc_id", "source", "rep")


def oracle_mixture_sample_sql(seed: int = SEED) -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {float(w)}"
        for s, w in sorted(RECIPE.items())
    )
    u = f"('0x' || substr(md5(doc_id::VARCHAR || '#{seed}'), 1, 15))::BIGINT"
    return f"""
WITH weighted AS (
    SELECT doc_id, source,
           (CASE {cases} ELSE 1.0 END) AS e
    FROM documents
),
counted AS (
    SELECT doc_id, source,
           (floor(e)::BIGINT
            + CASE WHEN {u} < round((e - floor(e)) * {_SCALE})::BIGINT
                   THEN 1 ELSE 0 END) AS n
    FROM weighted
)
SELECT doc_id, source, r AS rep
FROM counted, unnest(range(n)) AS t(r)
WHERE n > 0
"""
