"""Dynamic mode on Spark: validate a JSON-string column with the
compiled closure evaluator inside an Arrow-batched pandas UDF.

This is the heterogeneous-documents path (SURVEY.md §1.3 mode (b)):
schemas whose type dispatch can't be resolved statically (mixed-type
arrays, open objects, nested composition) run the SAME evaluator that
is parity-tested against the reference — compiled ONCE on the driver,
shipped in the UDF closure, applied per Arrow batch.

Scale notes: this is deliberately the slow path — per-doc Python after
Arrow transfer — reserved for columns where Catalyst can't express the
semantics.  The flagship web-pages checks never come here.  Batch size
via spark.sql.execution.arrow.maxRecordsPerBatch; the stage stays
narrow (no shuffle), so it scales linearly with executors like any
map stage.
"""

from __future__ import annotations

import json
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from xjs.dynamic import build_evaluator
from xjs.frontend import compile_frontend

_ERRORS_TYPE = "array<struct<path:string,keyword:string,value_json:string>>"


def json_errors_udf(schema: dict):
    """Compile ``schema`` once; return a Column-function mapping a JSON
    string column to an array of error structs (NULL input -> NULL,
    unparseable input -> one `$malformed` error)."""
    node = compile_frontend(schema)  # driver-side SchemaError surface
    evaluate = build_evaluator(node)

    @pandas_udf(_ERRORS_TYPE)
    def _validate(s: pd.Series) -> pd.Series:
        def run(txt: Optional[str]):
            if txt is None:
                return None
            try:
                doc = json.loads(txt)
            except (ValueError, TypeError):
                return [("", "$malformed", "null")]
            return [
                (
                    ".".join(str(p) for p in e["path"]),
                    e["keyword"],
                    json.dumps(e["value"], default=str),
                )
                for e in evaluate(doc)
            ]

        return s.map(run)

    return _validate


def dynamic_violations(
    df: DataFrame,
    schema: dict,
    json_col: str,
    id_col: str,
) -> DataFrame:
    """(id, path, keyword, value_json) — one row per error per doc,
    with the reference's error multiplicity/paths preserved."""
    errs = json_errors_udf(schema)(F.col(json_col))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(errs).alias("e"))
        .select(
            "id",
            F.col("e.path").alias("path"),
            F.col("e.keyword").alias("keyword"),
            F.col("e.value_json").alias("value_json"),
        )
    )


# --- driver-table query: validate events.props ----------------------------

PROPS_SCHEMA = {
    "type": "object",
    "required": ["k"],
    "properties": {
        "k": {"type": "integer", "minimum": 0, "maximum": 80, "multipleOf": 3},
    },
    "additionalProperties": False,
}


def q_dynamic_props(spark, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return dynamic_violations(ev, PROPS_SCHEMA, "props", "event_id")


#: DuckDB oracle replicating the evaluator's error multiplicity for
#: this schema over {"k": <int>} documents: maximum and multipleOf
#: each produce one error with path "k"; value_json matches json.dumps.
ORACLE_DYNAMIC_PROPS_SQL = """
WITH e AS (
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
)
SELECT event_id AS id, 'k' AS path, 'maximum' AS keyword, '80' AS value_json
FROM e WHERE k > 80
UNION ALL
SELECT event_id AS id, 'k' AS path, 'multipleOf' AS keyword, '3' AS value_json
FROM e WHERE k % 3 <> 0
"""


# --- composition keywords as a static oracle-checked query -----------------

COMPOSITION_SCHEMA = {
    "type": "object",
    "properties": {
        "n_chars": {
            # anyOf: short docs OR round hundreds
            "anyOf": [{"maximum": 200}, {"multipleOf": 100}],
        },
        "doc_id": {
            # oneOf: exactly one of (small id) xor (multiple of 3)
            "oneOf": [{"maximum": 100}, {"multipleOf": 3}],
        },
    },
}


def q_static_composition(spark, sf_dir: str) -> DataFrame:
    """allOf/anyOf/oneOf predicate algebra compiled statically over the
    documents table."""
    from xjs.plan import compile_static
    from xjs.runtime import violations

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars",
        F.pmod(F.col("doc_id"), F.lit(16)).cast("int").alias("partition_id"),
    )
    plan = compile_static(
        COMPOSITION_SCHEMA, d.schema, id_col="doc_id", partition_col="partition_id"
    )
    return violations(d, plan)


ORACLE_STATIC_COMPOSITION_SQL = """
WITH d AS (
    SELECT doc_id, n_chars, CAST(doc_id % 16 AS INTEGER) AS partition_id FROM documents
)
SELECT doc_id AS id, 'n_chars' AS path, 'anyOf' AS keyword,
       '[{"maximum": 200}, {"multipleOf": 100}]' AS value_json,
       'no subschema passes' AS reason, partition_id
FROM d WHERE NOT (n_chars <= 200 OR n_chars % 100 = 0)
UNION ALL
SELECT doc_id AS id, 'doc_id' AS path, 'oneOf' AS keyword,
       '[{"maximum": 100}, {"multipleOf": 3}]' AS value_json,
       'subschema pass count != 1' AS reason, partition_id
FROM d WHERE (CASE WHEN doc_id <= 100 THEN 1 ELSE 0 END
            + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) <> 1
"""


# --- static MapType mode: open objects as map<string,long> columns --------

MAP_PROPS_SCHEMA = {
    "type": "object",
    "properties": {
        "propsmap": {
            "type": "object",
            "minProperties": 1,
            "maxProperties": 2,
            "required": ["k"],
            "properties": {"k": {"type": "integer", "minimum": 5}},
            "additionalProperties": False,
        }
    },
}


def q_static_props_map(spark, sf_dir: str) -> DataFrame:
    """Object keywords compiled STATICALLY over a MapType column
    (from_json of events.props): minProperties / maxProperties /
    required / properties / additionalProperties as map_* expressions."""
    from xjs.plan import compile_static
    from xjs.runtime import violations

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        F.pmod(F.col("event_id"), F.lit(16)).cast("int").alias("partition_id"),
        F.from_json(F.col("props"), "map<string,bigint>").alias("propsmap"),
    )
    plan = compile_static(
        MAP_PROPS_SCHEMA, ev.schema, id_col="event_id", partition_col="partition_id"
    )
    return violations(ev, plan)


ORACLE_STATIC_PROPS_MAP_SQL = """
WITH e AS (
    SELECT event_id, CAST(event_id % 16 AS INTEGER) AS partition_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
)
SELECT event_id AS id, 'propsmap.k' AS path, 'properties' AS keyword,
       '{"k": {"type": "integer", "minimum": 5}}' AS value_json,
       'value of `k` fails its subschema' AS reason, partition_id
FROM e WHERE k < 5
"""


# --- static StructType object keywords (round-2: driver-side field
# --- resolution of patternProperties / additionalProperties / deps) --------

STRUCT_OBJECT_SCHEMA = {
    "type": "object",
    "properties": {
        "o": {
            "properties": {"name": {"minLength": 2}},
            "patternProperties": {"^x_": {"minimum": 100}},
            "additionalProperties": False,
            "dependencies": {"x_mod": {"required": ["x_len"]}},
        }
    },
}


def q_static_struct_object(spark, sf_dir: str) -> DataFrame:
    """Closed-struct object keywords compiled STATICALLY: field names
    regex-resolved on the driver (patternProperties), the unclaimed
    field set computed at compile time (additionalProperties: false),
    and a schema-form dependency — all over a struct column derived
    deterministically from the documents table (NULL field = absent
    key)."""
    from xjs.plan import compile_static
    from xjs.runtime import violations

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(16)).cast("int").alias("partition_id"),
        F.struct(
            F.col("lang").alias("name"),
            F.when(F.col("doc_id") % 2 == 0, F.col("n_chars")).alias("x_len"),
            F.when(F.col("doc_id") % 3 == 0, F.col("doc_id") % 200).alias("x_mod"),
            F.when(F.col("doc_id") % 5 == 0, F.col("source")).alias("extra"),
        ).alias("o"),
    )
    plan = compile_static(
        STRUCT_OBJECT_SCHEMA, d.schema, id_col="doc_id", partition_col="partition_id"
    )
    return violations(d, plan)


ORACLE_STATIC_STRUCT_OBJECT_SQL = """
WITH d AS (
    SELECT doc_id, CAST(doc_id % 16 AS INTEGER) AS partition_id,
           CASE WHEN doc_id % 2 = 0 THEN n_chars END AS x_len,
           CASE WHEN doc_id % 3 = 0 THEN doc_id % 200 END AS x_mod,
           CASE WHEN doc_id % 5 = 0 THEN source END AS extra
    FROM documents
)
SELECT doc_id AS id, 'o.x_len' AS path, 'minimum' AS keyword,
       '100' AS value_json, 'value < 100' AS reason, partition_id
FROM d WHERE x_len < 100
UNION ALL
SELECT doc_id AS id, 'o.x_mod' AS path, 'minimum' AS keyword,
       '100' AS value_json, 'value < 100' AS reason, partition_id
FROM d WHERE x_mod < 100
UNION ALL
SELECT doc_id AS id, 'o' AS path, 'additionalProperties' AS keyword,
       'false' AS value_json, 'unexpected extra field `extra`' AS reason, partition_id
FROM d WHERE extra IS NOT NULL
UNION ALL
SELECT doc_id AS id, 'o' AS path, 'dependencies' AS keyword,
       '{"x_mod": {"required": ["x_len"]}}' AS value_json,
       '`x_mod` present but its dependency subschema fails' AS reason, partition_id
FROM d WHERE x_mod IS NOT NULL AND x_len IS NULL
"""


# --- static complex-value enum (round-2: typed literals + <=>) -------------

ENUM_COMPLEX_SCHEMA = {
    "type": "object",
    "properties": {
        # mixed member shapes: two matchable pairs, a string that can
        # never inhabit array<string>, and a size-1 array that matches
        # no 2-element value — deep_equal type-strictness throughout
        "pair": {"enum": [["en", "src1"], ["de", "src2"], "never", ["fr"]]}
    },
}


def q_static_enum_complex(spark, sf_dir: str) -> DataFrame:
    """Complex-value enum compiled statically: array members become
    typed array literals compared with <=> (reference keywords.py:67-94
    via deep_equal); members that cannot inhabit the column type are
    dropped at compile time."""
    from xjs.plan import compile_static
    from xjs.runtime import violations

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(16)).cast("int").alias("partition_id"),
        F.array(F.col("lang"), F.col("source")).alias("pair"),
    )
    plan = compile_static(
        ENUM_COMPLEX_SCHEMA, d.schema, id_col="doc_id", partition_col="partition_id"
    )
    return violations(d, plan)


ORACLE_STATIC_ENUM_COMPLEX_SQL = """
SELECT doc_id AS id, 'pair' AS path, 'enum' AS keyword,
       '[["en", "src1"], ["de", "src2"], "never", ["fr"]]' AS value_json,
       'value not in enum(4)' AS reason,
       CAST(doc_id % 16 AS INTEGER) AS partition_id
FROM documents
WHERE NOT ((lang = 'en' AND source = 'src1') OR (lang = 'de' AND source = 'src2'))
"""


# --- static uniqueItems with per-duplicate multiplicity (round-2) ----------

UNIQUE_TOKENS_SCHEMA = {
    "type": "object",
    "properties": {"toks": {"uniqueItems": True}},
}


def q_static_unique_items(spark, sf_dir: str) -> DataFrame:
    """uniqueItems over the first 8 tokens of each document, emitting
    one violation row PER duplicate index beyond the first occurrence
    (reference tools.py:50-65 multiplicity) — the static analog of the
    dynamic evaluator's per-duplicate errors."""
    from xjs.plan import compile_static
    from xjs.runtime import violations

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(16)).cast("int").alias("partition_id"),
        F.slice(F.split(F.col("text"), " "), 1, 8).alias("toks"),
    )
    plan = compile_static(
        UNIQUE_TOKENS_SCHEMA, d.schema, id_col="doc_id", partition_col="partition_id"
    )
    return violations(d, plan)


ORACLE_STATIC_UNIQUE_ITEMS_SQL = """
WITH d AS (
    SELECT doc_id, CAST(doc_id % 16 AS INTEGER) AS partition_id,
           string_split(text, ' ')[1:8] AS toks
    FROM documents
),
c AS (
    SELECT doc_id, partition_id,
           len(toks) - len(list_distinct(toks)) AS dups
    FROM d
)
SELECT doc_id AS id, 'toks' AS path, 'uniqueItems' AS keyword,
       'true' AS value_json, 'duplicate elements' AS reason, partition_id
FROM c, UNNEST(range(c.dups))
"""
