"""JSONL crawl ingestion with corrupt-record quarantine.

Real crawl corpora arrive as newline-delimited JSON (WET/WAT exports,
crawler sidecars), not parquet — and a validation engine's first job
on such input is separating three row classes without losing any:

  clean        every field parses; goes to the table
  corrupt      the LINE is not valid JSON; Spark PERMISSIVE mode
               captures the raw line in ``columnNameOfCorruptRecord``
  bad value    valid JSON whose field fails a typed parse (here: an
               unparseable ``warc_ts`` — ``try_to_timestamp`` yields
               NULL instead of an ANSI error)

``read_jsonl_webpages`` returns (clean, quarantine): quarantine rows
carry a ``reason`` and the raw line (corrupt) or recovered doc_id
(bad value), so nothing is silently dropped — the same
reason-attributed ledger contract as jobs/curate_corpus.py.

Fixture + constructive oracle: ``write_jsonl_fixture`` derives the
JSONL deterministically from the driver's ``documents`` table with
corruption injected at fixed doc_id residues (%11==3: line truncated
by 5 chars -> invalid JSON; %11==7: warc_ts := 'not-a-timestamp').
Because the generator is a stated formula over ``documents``, the
DuckDB oracle reproduces the expected CLEAN rows and quarantine
counts from ``documents`` directly — no JSON parsing in the oracle,
so the green row proves the Spark reader + splitter inverts the
generator exactly (the html_extract oracle pattern).

100 TB shape: ``spark.read.json`` with an EXPLICIT schema is a single
narrow scan (no sampling pass — schema inference over a crawl would
read everything twice); the clean/quarantine split is two filters of
one projection, no shuffle, and both sinks append partition-parallel.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = "2024-01-01 00:00:00"
CORRUPT_MOD = 11
RES_TRUNCATED = 3   # doc_id % 11 == 3 -> line truncated (invalid JSON)
RES_BAD_TS = 7      # doc_id % 11 == 7 -> warc_ts unparseable
JSONL_VERSION = 1   # bump to rebuild cached fixtures

_SCHEMA = (
    "doc_id long, url string, warc_ts string, text string, lang string, "
    "_corrupt string"
)


def _line(doc_id, source, text, lang):
    """One JSON line as a Column — field order fixed by the struct."""
    url = F.concat(
        F.lit("https://"), source, F.lit(".example.com/doc/"),
        doc_id.cast("string"),
    )
    ts = F.when(
        doc_id % CORRUPT_MOD == RES_BAD_TS, F.lit("not-a-timestamp")
    ).otherwise(
        F.date_format(
            F.to_timestamp(F.lit(EPOCH))
            + F.make_interval(secs=doc_id.cast("double")),
            "yyyy-MM-dd HH:mm:ss",
        )
    )
    line = F.to_json(
        F.struct(
            doc_id.alias("doc_id"),
            url.alias("url"),
            ts.alias("warc_ts"),
            text.alias("text"),
            lang.alias("lang"),
        )
    )
    return F.when(
        doc_id % CORRUPT_MOD == RES_TRUNCATED,
        F.substring(line, 1, F.length(line) - F.lit(5)),
    ).otherwise(line)


def write_jsonl_fixture(spark: SparkSession, sf_dir: str, out_path: str) -> str:
    """documents.parquet -> JSONL text files (cached; _SUCCESS guard)."""
    if not os.path.exists(os.path.join(out_path, "_SUCCESS")):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        d.select(
            _line(F.col("doc_id"), F.col("source"), F.col("text"),
                  F.col("lang")).alias("value")
        ).write.mode("overwrite").text(out_path)
    return out_path


def read_jsonl_webpages(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) from a JSONL crawl directory.

    clean:      doc_id, url, warc_ts (timestamp), text, lang
    quarantine: doc_id (NULL for unparseable lines), reason
                ('corrupt_json' | 'bad_timestamp'), raw (the offending
                line for corrupt rows, the bad field value otherwise)
    """
    raw = (
        spark.read.schema(_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    ts = F.try_to_timestamp(F.col("warc_ts"))
    parsed = raw.select(
        "doc_id", "url", ts.alias("_ts"), "text", "lang",
        "warc_ts", "_corrupt",
    )
    clean = parsed.filter(
        F.col("_corrupt").isNull() & F.col("_ts").isNotNull()
    ).select(
        "doc_id", "url", F.col("_ts").alias("warc_ts"), "text", "lang"
    )
    quarantine = parsed.filter(
        F.col("_corrupt").isNotNull() | F.col("_ts").isNull()
    ).select(
        "doc_id",
        F.when(F.col("_corrupt").isNotNull(), F.lit("corrupt_json"))
        .otherwise(F.lit("bad_timestamp")).alias("reason"),
        F.coalesce(F.col("_corrupt"), F.col("warc_ts")).alias("raw"),
    )
    return clean, quarantine


# --------------------------------------------------------------------------
# queries + constructive oracles
# --------------------------------------------------------------------------


def _fixture_path(sf_dir: str) -> str:
    import re

    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    tag = re.sub(r"\W+", "_", sf_dir.strip("/").split("/")[-1])
    os.makedirs(os.path.join(repo, ".tmp"), exist_ok=True)
    return os.path.join(repo, ".tmp", f"jsonl-{tag}-v{JSONL_VERSION}")


def q_jsonl_ingest_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = write_jsonl_fixture(spark, sf_dir, _fixture_path(sf_dir))
    clean, _ = read_jsonl_webpages(spark, path)
    return clean


def q_jsonl_ingest_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = write_jsonl_fixture(spark, sf_dir, _fixture_path(sf_dir))
    _, quarantine = read_jsonl_webpages(spark, path)
    return quarantine.groupBy("reason").agg(F.count(F.lit(1)).alias("n"))


def oracle_jsonl_clean_sql() -> str:
    # the generator's formula restated over documents: rows outside the
    # two corruption residues, with url/warc_ts derived identically
    return f"""
SELECT doc_id,
       'https://' || source || '.example.com/doc/' || doc_id AS url,
       TIMESTAMP '{EPOCH}' + doc_id * INTERVAL 1 SECOND AS warc_ts,
       text,
       lang
FROM documents
WHERE doc_id % {CORRUPT_MOD} NOT IN ({RES_TRUNCATED}, {RES_BAD_TS})
"""


def oracle_jsonl_quarantine_sql() -> str:
    return f"""
SELECT reason, COUNT(*) AS n FROM (
    SELECT CASE WHEN doc_id % {CORRUPT_MOD} = {RES_TRUNCATED}
                THEN 'corrupt_json' ELSE 'bad_timestamp' END AS reason
    FROM documents
    WHERE doc_id % {CORRUPT_MOD} IN ({RES_TRUNCATED}, {RES_BAD_TS})
) GROUP BY reason
"""
