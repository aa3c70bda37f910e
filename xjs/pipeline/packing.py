"""Sequence packing: assign documents to fixed-token-budget training
bins (concat-and-chop semantics — the standard LLM pretraining
packing: documents are concatenated in a deterministic order and the
stream is chopped every ``budget`` tokens, so a document may straddle
a bin boundary; ``bin_id``/``bin_offset`` say where each document
STARTS).

Shape: one running prefix-sum window per stratum (here ``lang``) —
a single shuffle on the stratum key, ordered by doc_id for
determinism.  At 10^12 documents a single global prefix sum would
serialize on one reducer; stratifying bounds each window at the
stratum's row count, and the 100 TB form of the same operator is the
classic two-stage prefix sum: per-partition local cumsums + a tiny
broadcast of per-partition offsets (noted in SCALE.md).  Token counts
reuse the whitespace tokenizer whose Spark/DuckDB parity is already
oracle-proven (text_tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from xjs.pipeline.text import token_count

BUDGET = 256  # tokens per training bin (tiny for the word-salad corpus)


def pack_sequences(
    df: DataFrame,
    stratum: str,
    order_col: str,
    text_col: str = "text",
    budget: int = BUDGET,
) -> DataFrame:
    """(order_col, stratum, n_tokens, bin_id, bin_offset) — bin_id is
    the budget-chunk index where the document starts within its
    stratum's concatenation stream; bin_offset the token offset inside
    that bin."""
    w = Window.partitionBy(stratum).orderBy(order_col)
    n_tok = token_count(F.col(text_col))
    cum = F.sum(n_tok).over(w)  # inclusive prefix sum
    start = (cum - n_tok).cast("long")
    return df.select(
        F.col(order_col),
        F.col(stratum),
        n_tok.cast("long").alias("n_tokens"),
        F.floor(start / budget).alias("bin_id"),
        (start % budget).alias("bin_offset"),
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, "lang", "doc_id")


def oracle_pack_sequences_sql() -> str:
    n_tok = (
        "(CASE WHEN length(trim(text)) = 0 THEN 0 "
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)"
    )
    return f"""
WITH toks AS (
    SELECT doc_id, lang, CAST({n_tok} AS BIGINT) AS n_tokens FROM documents
),
cum AS (
    SELECT doc_id, lang, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) - n_tokens
                AS BIGINT) AS start  -- DuckDB windowed SUM widens to HUGEINT
    FROM toks
)
SELECT doc_id, lang, n_tokens,
       CAST(floor(start / {BUDGET}) AS BIGINT) AS bin_id,
       start % {BUDGET} AS bin_offset
FROM cum
"""
