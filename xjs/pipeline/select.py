"""Training-set selection: the end-to-end composition a data pipeline
actually runs — quality gate ∧ language gate ∧ dedup-survivor gate —
as one declarative DataFrame query (every stage is one of the
already-oracle-checked operators; Catalyst fuses the narrow parts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xjs.pipeline.text import STOPWORDS, quality_features

MIN_TOKENS = 30
MIN_STOPWORD_RATIO = 0.05


def select_training_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stopword_ratio, quality_score) for docs that
    pass the selection gates, exact-dup survivors only (min doc_id per
    identical text)."""
    feats = quality_features(docs)
    survivors = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    return (
        feats.join(survivors.select("doc_id"), "doc_id")
        .filter(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("stopword_ratio") >= MIN_STOPWORD_RATIO)
        )
        .select("doc_id", "n_tokens", "stopword_ratio", "quality_score")
    )


def q_select_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xjs.pipeline.dedup import dedup_corpus

    return select_training_docs(dedup_corpus(spark, sf_dir))


def oracle_select_training_sql() -> str:
    from xjs.pipeline.dedup import DUCKDB_CORPUS_CTE

    return f"""
WITH {DUCKDB_CORPUS_CTE.strip()},
t AS (
    SELECT doc_id, text,
           length(text) AS n_chars,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
           len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
               x -> list_contains({STOPWORDS!r}, x))) AS n_stop,
           length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct
    FROM corpus
),
feats AS (
    SELECT doc_id, n_tokens,
           ROUND(n_stop / GREATEST(n_tokens, 1)::DOUBLE, 4) AS stopword_ratio,
           ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.4
                 + ROUND(n_stop / GREATEST(n_tokens, 1)::DOUBLE, 4) * 0.4
                 + (1 - ROUND(n_punct / GREATEST(n_chars, 1)::DOUBLE, 4)) * 0.2, 4) AS quality_score
    FROM t
),
survivors AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY text)
SELECT f.doc_id, f.n_tokens, f.stopword_ratio, f.quality_score
FROM feats f JOIN survivors s ON s.doc_id = f.doc_id
WHERE f.n_tokens >= {MIN_TOKENS} AND f.stopword_ratio >= {MIN_STOPWORD_RATIO}
"""
