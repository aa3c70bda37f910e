"""Deterministic web-pages table (the BASELINE.json ``input_hint`` shape)
derived from the driver's ``documents`` parquet.

Columns: ``url:string, warc_ts:timestamp, html:binary, text:string,
lang:string, partition_id:int`` — Common-Crawl-style pages with
*injected violations* at fixed doc_id residues, so every flagship
check detects a known, SQL-replicable set of offenders:

=============  =============================  =========================
residue        injection                      tripped check
=============  =============================  =========================
doc_id%97==0   scheme ``htp://``              url pattern (htp IS a
                                              valid uri scheme per the
                                              reference's algorithm)
doc_id%157==0  no scheme (and doc_id>0)       url pattern + format:uri
doc_id%50==0   path ``/doc/dup``              url uniqueness (2 hot
                                              urls -> skew fixture)
doc_id%89==0   warc_ts jumps back 2h          timestamp monotonicity
doc_id%131==0  text := ''                     text minLength
doc_id%211==0  html := NULL                   html required
doc_id%113==0  lang := 'xx'                   lang enum
=============  =============================  =========================

``html`` is a deterministic wrap of ``text``; the extraction inverse
(strip the wrapper) reproduces ``text`` byte-identically — the
per-row invariant the driver's pytest asserts (BASELINE.json
``input_hint``).

The SAME derivation exists as a DuckDB CTE (``DUCKDB_CTE``) so every
Spark-side query over webpages has an exact SQL oracle.  Keep the two
in lock-step; ``tests/test_webpages_source.py`` cross-checks them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = "2024-01-01 00:00:00"
HTML_PREFIX = "<html><body>"
HTML_SUFFIX = "</body></html>"

N_PARTITIONS = 16


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def webpages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> web-pages table, all built-in expressions (one
    narrow projection; at scale this is a parquet scan + codegen map)."""
    return _derive(load_documents(spark, sf_dir))


def _derive(d: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    text_mod = F.when(doc_id % 131 == 0, F.lit("")).otherwise(F.col("text"))
    url = F.concat(
        F.when(doc_id % 97 == 0, F.lit("htp://"))
        .when((doc_id % 157 == 0) & (doc_id > 0), F.lit(""))  # scheme-less: trips format:uri
        .otherwise(F.lit("https://")),
        F.col("source"),
        F.lit(".example.com/doc/"),
        F.when(doc_id % 50 == 0, F.lit("dup")).otherwise(doc_id.cast("string")),
    )
    warc_ts = F.to_timestamp(F.lit(EPOCH)) + F.make_interval(
        secs=(doc_id + F.when((doc_id % 89 == 0) & (doc_id > 0), -7200).otherwise(0)).cast("double")
    )
    html = F.when(
        doc_id % 211 == 0, F.lit(None).cast("binary")
    ).otherwise(
        F.concat(F.lit(HTML_PREFIX), text_mod, F.lit(HTML_SUFFIX)).cast("binary")
    )
    lang = F.when(doc_id % 113 == 0, F.lit("xx")).otherwise(F.col("lang"))
    return d.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text_mod.alias("text"),
        lang.alias("lang"),
        F.pmod(doc_id, F.lit(N_PARTITIONS)).cast("int").alias("partition_id"),
        doc_id.alias("doc_id"),
        F.col("source").alias("source"),
    )


def webpages_scaled(
    spark: SparkSession, sf_dir: str, factor: int, parallelism: int | None = None
) -> DataFrame:
    """Deterministic scale-up for benching: replicate the documents
    table ``factor``× with a doc_id stride larger than any base table,
    so injection residues stay diverse and the derived table is a pure
    function of (sf_dir, factor).

    Parallelism note: a naive ``crossJoin(documents, range(factor))``
    plans a BroadcastNestedLoopJoin streaming the (single-file!) parquet
    side — ONE task regardless of cores, which killed scaling at
    local[32].  Instead the driver of parallelism is an explicitly
    partitioned ``spark.range(n_base*factor)`` broadcast-hash-joined to
    the small documents table: every core gets range splits, and the
    join is narrow."""
    d = load_documents(spark, sf_dir)
    n_base = d.count()  # small dimension table; one cheap job
    par = parallelism or spark.sparkContext.defaultParallelism * 4
    ids = spark.range(0, n_base * factor, 1, par)
    keyed = ids.select(
        (F.col("id") % n_base).alias("_base"),
        (F.col("id") / n_base).cast("long").alias("_rep"),
    )
    # documents doc_id is dense 0..n_base-1, so _base == doc_id
    dim = F.broadcast(d.withColumn("_base", F.col("doc_id")).drop("doc_id"))
    joined = keyed.join(dim, "_base")
    docs = (
        joined.withColumn("doc_id", F.col("_base") + F.col("_rep") * F.lit(1_000_000))
        .drop("_base", "_rep")
    )
    return _derive(docs)


def extract_text(html_col):
    """The extraction inverse: html bytes -> text, byte-identical to the
    ``text`` column (the input_hint invariant).  Pure built-ins."""
    s = html_col.cast("string")
    return F.regexp_replace(
        F.regexp_replace(s, "^" + HTML_PREFIX.replace("<", "[<]"), ""),
        HTML_SUFFIX.replace("<", "[<]") + "$",
        "",
    )


#: DuckDB CTE producing the identical table (html omitted: DuckDB blob
#: hashing isn't needed — oracles compare url/ts/text/lang/partition).
DUCKDB_CTE = f"""
webpages AS (
    SELECT
        (CASE WHEN doc_id % 97 = 0 THEN 'htp://'
              WHEN doc_id % 157 = 0 AND doc_id > 0 THEN ''
              ELSE 'https://' END)
          || source || '.example.com/doc/'
          || (CASE WHEN doc_id % 50 = 0 THEN 'dup' ELSE CAST(doc_id AS VARCHAR) END) AS url,
        TIMESTAMP '{EPOCH}'
          + INTERVAL (doc_id + (CASE WHEN doc_id % 89 = 0 AND doc_id > 0 THEN -7200 ELSE 0 END)) SECOND AS warc_ts,
        CASE WHEN doc_id % 211 = 0 THEN NULL
             ELSE '{HTML_PREFIX}' || (CASE WHEN doc_id % 131 = 0 THEN '' ELSE text END) || '{HTML_SUFFIX}'
        END AS html_str,
        CASE WHEN doc_id % 131 = 0 THEN '' ELSE text END AS text,
        CASE WHEN doc_id % 113 = 0 THEN 'xx' ELSE lang END AS lang,
        CAST(doc_id % {N_PARTITIONS} AS INTEGER) AS partition_id,
        doc_id,
        source
    FROM documents
)
"""
