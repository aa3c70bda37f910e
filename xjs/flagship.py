"""The flagship job: validate the web-pages table.

Compiles WEBPAGES_SCHEMA once on the driver (compile-then-validate,
like reference validator.py:20-23) and runs it as pure Catalyst
predicates — plus the engine-level constraint classes from
BASELINE.json's north_star (stats / uniqueness / referential / drift /
monotonicity) which live in ``xjs.checks``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from xjs.plan import compile_static
from xjs.runtime import violations as _violations
from xjs.sources.webpages import webpages

#: draft-04 schema for the web-pages table (input_hint columns).
#: `pattern` is prefix-anchored like the reference's re.match.
WEBPAGES_SCHEMA = {
    "type": "object",
    "required": ["url", "warc_ts", "html"],
    "properties": {
        "url": {
            "type": "string",
            "pattern": "https://",
            "format": "uri",
            "maxLength": 2048,
        },
        "text": {"type": "string", "minLength": 10, "maxLength": 1000000},
        "lang": {"enum": ["en", "de", "fr", "es", "ru", "zh"]},
        "html": {"type": "string", "minLength": 1},
    },
}


# ---------------------------------------------------------------------------
# DuckDB oracle: one row per check, kept in lock-step with the compiled
# plan (same path/keyword/value_json/reason strings, equivalent SQL
# conditions over the DUCKDB_CTE webpages derivation).
# ---------------------------------------------------------------------------

_ENUM_JSON = '["en", "de", "fr", "es", "ru", "zh"]'
_REQ_JSON = '["url", "warc_ts", "html"]'

#: (path, keyword, value_json, reason, violation_cond, applicable_cond)
ORACLE_CHECKS = [
    ("url", "required", _REQ_JSON, "required column `url` is null/absent",
     "url IS NULL", "TRUE"),
    ("warc_ts", "required", _REQ_JSON, "required column `warc_ts` is null/absent",
     "warc_ts IS NULL", "TRUE"),
    ("html", "required", _REQ_JSON, "required column `html` is null/absent",
     "html_str IS NULL", "TRUE"),
    ("url", "maxLength", "2048", "length > 2048",
     "url IS NOT NULL AND strlen(url) > 2048", "url IS NOT NULL"),
    ("url", "pattern", '"https://"', "does not match /https:///",
     "url IS NOT NULL AND NOT regexp_matches(url, '^(?:https://)')", "url IS NOT NULL"),
    ("url", "format", '"uri"', "not a valid uri",
     "url IS NOT NULL AND NOT regexp_matches(url, '^[a-zA-Z][a-zA-Z0-9.+-]*://')",
     "url IS NOT NULL"),
    ("text", "minLength", "10", "length < 10",
     "text IS NOT NULL AND length(text) < 10", "text IS NOT NULL"),
    ("text", "maxLength", "1000000", "length > 1000000",
     "text IS NOT NULL AND length(text) > 1000000", "text IS NOT NULL"),
    ("lang", "enum", _ENUM_JSON, "value not in enum(6)",
     "lang IS NOT NULL AND lang NOT IN ('en','de','fr','es','ru','zh')", "lang IS NOT NULL"),
    ("html", "minLength", "1", "length < 1",
     "html_str IS NOT NULL AND strlen(html_str) < 1", "html_str IS NOT NULL"),
]


def oracle_violations_sql(cte: str) -> str:
    selects = [
        f"SELECT url AS id, '{p}' AS path, '{k}' AS keyword, '{_q(vj)}' AS value_json, "
        f"'{_q(r)}' AS reason, partition_id FROM webpages WHERE {cond}"
        for p, k, vj, r, cond, _app in ORACLE_CHECKS
    ]
    return f"WITH {cte} " + " UNION ALL ".join(selects)


def oracle_verdicts_sql(cte: str) -> str:
    selects = [
        f"SELECT partition_id, '{p}.{k}' AS check_name, "
        f"COUNT(*) FILTER (WHERE {cond}) = 0 AS pass, "
        f"COUNT(*) FILTER (WHERE {app}) AS n_checked, "
        f"COUNT(*) FILTER (WHERE {cond}) AS n_violations "
        f"FROM webpages GROUP BY partition_id"
        for p, k, vj, r, cond, app in ORACLE_CHECKS
    ]
    return f"WITH {cte} " + " UNION ALL ".join(selects)


def _q(s: str) -> str:
    return s.replace("'", "''")


def compile_plan(df: DataFrame):
    return compile_static(WEBPAGES_SCHEMA, df.schema, id_col="url", partition_col="partition_id")


def flagship_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    wp = webpages(spark, sf_dir)
    return _violations(wp, compile_plan(wp))


def flagship_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xjs.runtime import verdicts

    wp = webpages(spark, sf_dir)
    return verdicts(wp, compile_plan(wp))


def flagship_quarantine_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xjs.runtime import quarantine

    wp = webpages(spark, sf_dir)
    return quarantine(wp, compile_plan(wp))[1]


def flagship_quarantine_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xjs.runtime import quarantine

    wp = webpages(spark, sf_dir)
    clean = quarantine(wp, compile_plan(wp))[0]
    return clean.select("url", "partition_id")


def oracle_quarantine_dirty_sql(cte: str) -> str:
    cases = ", ".join(
        f"CASE WHEN {cond} THEN '{p}.{k}' END"
        for p, k, vj, r, cond, _app in ORACLE_CHECKS
    )
    return f"""
WITH {cte},
flags AS (
    SELECT url AS id, partition_id,
           list_sort(list_filter([{cases}], x -> x IS NOT NULL)) AS fl
    FROM webpages
)
SELECT id, partition_id, array_to_string(fl, ',') AS failed_checks,
       len(fl) AS n_failed
FROM flags WHERE len(fl) > 0
"""


def oracle_quarantine_clean_sql(cte: str) -> str:
    any_fail = " OR ".join(f"({cond})" for _p, _k, _vj, _r, cond, _a in ORACLE_CHECKS)
    return f"""
WITH {cte}
SELECT url, partition_id FROM webpages WHERE NOT ({any_fail})
"""
