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


# ---------------------------------------------------------------------------
# full curation composition (round 2): adds the substring-dedup and
# decontamination gates to the quality + exact-survivor pipeline
# ---------------------------------------------------------------------------

def curate_corpus(docs: DataFrame) -> DataFrame:
    """The complete curation funnel as ONE declarative query:
    exact-dup survivor ∧ not-a-substring-duplicate ∧ not contaminated
    ∧ quality gates.  All gates are the already-oracle-checked
    operators; the anti-joins are left_anti on small flagged sets
    (Catalyst broadcasts them when they fit)."""
    from xjs.pipeline.decontam import BENCH_RESIDUE, contaminated_docs
    from xjs.pipeline.dedup import substring_duplicates

    survivors = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    base = docs.join(survivors.select("doc_id"), "doc_id")

    substr_dups = substring_duplicates(base).select("doc_id")
    bench = base.filter(F.col("doc_id") % BENCH_RESIDUE == 0)
    corpus = base.filter(F.col("doc_id") % BENCH_RESIDUE != 0)
    contaminated = contaminated_docs(corpus, bench).select("doc_id")

    kept = (
        corpus.join(substr_dups, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
    )
    feats = quality_features(kept)
    return feats.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("stopword_ratio") >= MIN_STOPWORD_RATIO)
    ).select("doc_id", "n_tokens", "stopword_ratio", "quality_score")


def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xjs.pipeline.dedup import dedup_corpus

    return curate_corpus(dedup_corpus(spark, sf_dir))


def oracle_curate_corpus_sql() -> str:
    from xjs.pipeline.decontam import BENCH_RESIDUE, NGRAM
    from xjs.pipeline.dedup import DUCKDB_CORPUS_CTE, SUBSTR_W

    def grams_cte(name: str, w: int) -> str:
        return f"""
{name} AS (
    SELECT DISTINCT doc_id,
           list_aggregate(t[i:i+{w - 1}], 'string_agg', ' ') AS gram
    FROM toks, unnest(range(1, len(t) - {w} + 2)) AS r(i)
)"""

    return f"""
WITH {DUCKDB_CORPUS_CTE.strip()},
survivors AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY text),
base AS (SELECT c.* FROM corpus c JOIN survivors s USING (doc_id)),
toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM base
),
{grams_cte('sgrams', SUBSTR_W).strip()},
owners AS (SELECT gram, MIN(doc_id) AS own FROM sgrams GROUP BY gram),
substr_dups AS (
    SELECT DISTINCT g.doc_id FROM sgrams g JOIN owners o USING (gram)
    WHERE g.doc_id > o.own
),
{grams_cte('dgrams', NGRAM).strip()},
bench AS (
    SELECT DISTINCT gram FROM dgrams WHERE doc_id % {BENCH_RESIDUE} = 0
),
contaminated AS (
    SELECT DISTINCT g.doc_id FROM dgrams g JOIN bench b USING (gram)
    WHERE g.doc_id % {BENCH_RESIDUE} <> 0
),
kept AS (
    SELECT b.doc_id, b.text FROM base b
    WHERE b.doc_id % {BENCH_RESIDUE} <> 0
      AND b.doc_id NOT IN (SELECT doc_id FROM substr_dups)
      AND b.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
t2 AS (
    SELECT doc_id, text,
           length(text) AS n_chars,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
           len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
               x -> list_contains({STOPWORDS!r}, x))) AS n_stop,
           length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct
    FROM kept
)
SELECT doc_id, n_tokens,
       ROUND(n_stop / GREATEST(n_tokens, 1)::DOUBLE, 4) AS stopword_ratio,
       ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.4
             + ROUND(n_stop / GREATEST(n_tokens, 1)::DOUBLE, 4) * 0.4
             + (1 - ROUND(n_punct / GREATEST(n_chars, 1)::DOUBLE, 4)) * 0.2, 4)
           AS quality_score
FROM t2
WHERE n_tokens >= {MIN_TOKENS}
  AND ROUND(n_stop / GREATEST(n_tokens, 1)::DOUBLE, 4) >= {MIN_STOPWORD_RATIO}
"""
