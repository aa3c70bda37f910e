"""PII scanning + redaction over the documents table — the
scrub-before-training pass of an LLM data pipeline.

Detection and redaction are pure Catalyst regex expressions
(``regexp_count`` / ``regexp_replace``): a narrow map stage fused into
the parquet scan, zero shuffle, zero Python — at 100 TB this runs at
scan speed alongside the validation predicates.

Patterns are deliberately restricted to the regex subset with
identical semantics in Java's engine (Spark) and RE2 (DuckDB): ASCII
character classes, bounded quantifiers, ``\\b`` word boundaries — no
lookaround (RE2 has none), no Unicode classes.  Counts are measured
independently per pattern on the original text; redaction applies the
patterns sequentially (email -> ipv4 -> phone), and the redacted text
is proven byte-identical against the SQL oracle via ``md5`` —
native codegen in Spark AND a built-in in DuckDB with identical hex
output, so the byte-identity proof costs one hash pass (r4: the
previous polynomial char_hash was an interpreted per-CHARACTER
Catalyst fold — ~320M interpreted lambda steps at 1M docs, 18.5s of
the bench row; md5 swaps it for JVM-native hashing with the same
proof strength).

The raw word-salad test corpus contains no PII, so the query injects
deterministic PII strings at fixed doc_id residues — same fixture
convention as the webpages violation injections
(xjs/sources/webpages.py) — applied identically in Spark and the
oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: (name, regex, replacement) — applied in this order for redaction
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_counts(text: Column) -> list[Column]:
    return [
        F.regexp_count(text, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def redact(text: Column) -> Column:
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


#: cheap literal/class markers a match REQUIRES: every pattern's regex
#: contains the literal '@' (email) or at least one digit (ipv4,
#: phone), so a doc without the marker provably has zero matches and
#: the expensive pass can be skipped.  Markers are checked against the
#: ORIGINAL text; replacements introduce neither '@' nor digits, so
#: the guard stays sound across the sequential redaction chain.
_GUARDS = {"email": "at", "ipv4": "digit", "phone": "digit"}


def pii_scan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefilter: bool = True,
) -> DataFrame:
    """(id, per-pattern counts, pii_total, redacted_len, redacted_hash).

    ``prefilter=True`` (default) short-circuits each regex pass behind
    its marker check — ``contains('@')`` is a plain substring scan and
    ``rlike('[0-9]')`` early-exits at the first digit, both far
    cheaper than the full pattern automaton.  Results are identical
    either way (the oracle row runs against this default); the flag
    exists so the equivalence is testable."""
    t = F.col(text_col)
    if not prefilter:
        counts = pii_counts(t)
        red = redact(t)
    else:
        has = {
            "at": t.contains("@"),
            "digit": t.rlike("[0-9]"),
        }
        # NULL-faithful: for NULL text regexp_count returns NULL, so
        # the guarded form must too — the inner when() yields NULL
        # (not 0) when the text itself is NULL
        counts = [
            F.when(has[_GUARDS[name]], F.regexp_count(t, F.lit(pat)))
            .otherwise(F.when(t.isNotNull(), 0))
            .alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS
        ]
        # any marker -> full sequential chain; no marker (the common
        # clean-doc case) -> the text unchanged, zero regex passes
        red = F.when(has["at"] | has["digit"], redact(t)).otherwise(t)
    total = None
    for c in [F.col(f"n_{name}") for name, _, _ in PII_PATTERNS]:
        total = c if total is None else total + c
    return df.select(
        F.col(id_col), *counts, red.alias("_red")
    ).select(
        id_col,
        *[f"n_{name}" for name, _, _ in PII_PATTERNS],
        total.alias("pii_total"),
        F.length("_red").alias("redacted_len"),
        F.md5(F.col("_red")).alias("redacted_hash"),
    )


def _inject_pii(doc_id: Column, text: Column) -> Column:
    """Deterministic PII fixture at fixed doc_id residues (no real PII
    in the corpus; identical arithmetic in ``_INJECT_SQL``)."""
    return F.concat(
        text,
        F.when(doc_id % 7 == 0, F.concat(F.lit(" contact user"), doc_id.cast("string"), F.lit("@example.com now"))).otherwise(F.lit("")),
        F.when(doc_id % 11 == 0, F.concat(F.lit(" from 10."), (doc_id % 256).cast("string"), F.lit(".0."), (doc_id % 100).cast("string"))).otherwise(F.lit("")),
        F.when(doc_id % 13 == 0, F.concat(F.lit(" call 555-123-"), F.lpad((doc_id % 10000).cast("string"), 4, "0"))).otherwise(F.lit("")),
    )


_INJECT_SQL = (
    "text"
    " || (CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END)"
    " || (CASE WHEN doc_id % 11 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END)"
    " || (CASE WHEN doc_id % 13 = 0 THEN ' call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END)"
)


def q_text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    injected = docs.select(
        "doc_id", _inject_pii(F.col("doc_id"), F.col("text")).alias("text")
    )
    return pii_scan(injected)


def oracle_text_pii_sql() -> str:
    count_exprs = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    red = "text"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
WITH injected AS (
    SELECT doc_id, {_INJECT_SQL} AS text FROM documents
),
counted AS (
    SELECT doc_id, {count_exprs}, {red} AS redacted FROM injected
)
SELECT doc_id, n_email, n_ipv4, n_phone,
       ({total}) AS pii_total,
       length(redacted) AS redacted_len,
       md5(redacted) AS redacted_hash
FROM counted
"""
