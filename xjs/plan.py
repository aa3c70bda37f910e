"""Static backend: SchemaNode × StructType -> CheckPlan of Column predicates.

The 100 TB path.  The schema is reconciled against the DataFrame's
StructType on the driver (the analog of the reference's compile step,
validator.py:20-23): all type dispatch and property-key resolution
happens at compile time, and every keyword becomes a Catalyst
``Column`` predicate — whole-stage-codegen'd, pushdown-eligible, zero
Python in the row loop.

Null semantics (SURVEY.md §7.4 #6): a NULL column value models a JSON
document with the key *absent*, so per-property checks are vacuous on
NULL (predicate evaluates to NULL => not a violation), while
``required`` compiles to ``isNotNull``.  This matches the reference's
``properties`` behavior (absent keys pass, keywords.py:483) and its
``required`` (keywords.py:660-666).

Regex notes: the reference's ``pattern`` uses ``re.match`` —
prefix-anchored, end-unanchored (keywords.py:829-832) — so we compile
to ``rlike('^(?:...)')`` (rlike is search-semantics).  Patterns with
Python-only syntax fall back to a vectorized pandas UDF.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import List, Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xjs import formats
from xjs.errors import PlanError
from xjs.frontend import SchemaNode, compile_frontend

# ---------------------------------------------------------------------------

#: JSON type name -> acceptable Spark types (static reconciliation)
_SPARK_OK = {
    "string": (T.StringType, T.VarcharType, T.CharType, T.BinaryType),
    "integer": (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
    "number": (T.DoubleType, T.FloatType, T.DecimalType),
    "boolean": (T.BooleanType,),
    "array": (T.ArrayType,),
    "object": (T.StructType, T.MapType),
    # timestamps/dates are an engine extension, accepted under "string"
    # bounds-style checks only via engine checks, never draft-04 type.
}

# Python-regex-only constructs that Java regex cannot run: fall back to
# a pandas UDF for exact parity.
_PY_ONLY_RE = re.compile(r"\(\?P[=<]|\(\?\(|\\Z")


@dataclass
class RowCheck:
    """One compiled keyword check over one column.

    ``pred`` is the PASS condition; NULL pred = vacuous (key absent).
    A violation is ``pred <=> False``.

    ``count`` (optional) is the violation *multiplicity* when the check
    fails — e.g. uniqueItems emits one error per duplicate index in the
    reference (tools.py:50-65), so its count is
    ``size(e) - size(array_distinct(e))``.  None = multiplicity 1.

    ``paths`` (optional) is an array<string> of per-instance violation
    paths when the check fails — e.g. ``items`` emits one row per
    failing element with the element index in the path ("arr.3"), the
    static analog of the reference's runtime index paths
    (keywords.py:227-237).  Takes precedence over ``count``.
    """

    name: str                 # "url.format:uri"
    column: str
    path: str                 # data path, dotted
    keyword: str
    value_json: str           # schema value, for the violation payload
    reason: str
    pred: Column
    uses_python: bool = False  # True when a pandas-UDF fallback is used
    count: Optional[Column] = None
    paths: Optional[Column] = None


@dataclass
class CheckPlan:
    checks: List[RowCheck]
    id_col: str
    partition_col: Optional[str]

    def pass_all(self) -> Column:
        p = F.lit(True)
        for c in self.checks:
            p = p & ~c.pred.eqNullSafe(F.lit(False))
        return p

    def explain(self) -> str:
        """Human-readable compiled program — the analog of the
        reference's ``repr(validator)`` printing the generated source
        (validator.py:39-40): one line per check with its Catalyst
        predicate SQL."""
        lines = [f"CheckPlan(id={self.id_col!r}, partition={self.partition_col!r}, checks={len(self.checks)})"]
        for c in self.checks:
            tag = " [pandas-udf]" if c.uses_python else ""
            mult = (
                " [per-element]" if c.paths is not None
                else " [multiplicity]" if c.count is not None
                else ""
            )
            lines.append(f"  {c.name}{tag}{mult}: {_pred_sql(c.pred)}")
        return "\n".join(lines)

    def __repr__(self) -> str:  # pragma: no cover - convenience
        return self.explain()


def _pred_sql(pred: Column) -> str:
    """Best-effort SQL rendering of a Column predicate."""
    try:
        s = pred._jc.toString()
    except Exception:
        s = str(pred)
    return s if len(s) <= 400 else s[:397] + "..."


def compile_static(
    schema: Union[dict, SchemaNode],
    spark_schema: T.StructType,
    *,
    id_col: str = "url",
    partition_col: Optional[str] = "partition_id",
) -> CheckPlan:
    """Compile a top-level object schema against a flat table schema.

    Top-level ``properties`` map to columns; ``required`` maps to
    non-null checks.  Nested keywords compile recursively on the
    column expression (arrays via ``forall``/``size``, etc.).
    """
    node = schema if isinstance(schema, SchemaNode) else compile_frontend(schema)
    fields = {f.name: f.dataType for f in spark_schema.fields}
    checks: List[RowCheck] = []

    if node.required:
        for key in node.required:
            if key not in fields:
                # column missing entirely: compile-time verdict — every row violates
                pred = F.lit(False)
            else:
                pred = F.col(key).isNotNull()
            checks.append(
                RowCheck(
                    name=f"{key}.required",
                    column=key,
                    path=key,
                    keyword="required",
                    value_json=json.dumps(node.required),
                    reason=f"required column `{key}` is null/absent",
                    pred=pred,
                )
            )

    for key, child in (node.properties or {}).items():
        if key not in fields:
            continue  # absent column = key never present = all checks vacuous
        checks.extend(_compile_property(child, key, F.col(key), fields[key]))

    return CheckPlan(checks=checks, id_col=id_col, partition_col=partition_col)


def _compile_property(
    node: SchemaNode, colname: str, e: Column, dt: T.DataType,
    prefix: str = "", elem: bool = False,
) -> List[RowCheck]:
    """Compile one subschema over expression ``e`` of Spark type ``dt``.

    Null semantics are mode-dependent (SURVEY.md §7.4 #6):

    * ``elem=False`` (column / struct-field position): NULL models an
      *absent key*, so every keyword is vacuous on NULL (pred NULL).
    * ``elem=True`` (array element / map value position): NULL models
      *JSON null* — ``type`` without "null" in its union must fail it,
      ``enum`` matches it only when null is a member, and
      type-dispatched keywords (numeric/string/...) stay vacuous, per
      draft-04's applies-only-to-matching-types rule (the dynamic
      evaluator's by-type dispatch, dynamic.py:74-78).
    """
    path = prefix or colname
    out: List[RowCheck] = []

    def add(keyword: str, value, pred: Column, reason: str,
            uses_python: bool = False, count: Optional[Column] = None,
            paths: Optional[Column] = None):
        out.append(
            RowCheck(
                name=f"{path}.{keyword}",
                column=colname,
                path=path,
                keyword=keyword,
                value_json=json.dumps(value, default=str),
                reason=reason,
                pred=pred,
                uses_python=uses_python,
                count=count,
                paths=paths,
            )
        )

    def _elem_index_paths(pred_fn, lo: Column, hi_exclusive: Column) -> Column:
        """array<string> of "<path>.<i>" for elements in [lo, hi) whose
        element predicate fails — per-element violation paths with the
        runtime index, matching the reference's error paths."""
        idx = F.when(
            hi_exclusive > lo, F.sequence(lo, hi_exclusive - 1)
        ).otherwise(F.array().cast("array<int>"))
        bad = F.filter(idx, lambda i: ~pred_fn(F.element_at(e, i + 1)))
        return F.transform(
            bad, lambda i: F.concat(F.lit(path + "."), i.cast("string"))
        )

    # ---- type: resolved entirely at compile time --------------------------
    if node.type_names:
        spark_ok = any(isinstance(dt, _SPARK_OK.get(t, ())) for t in node.type_names)
        null_ok = "null" in node.type_names
        reason = f"column `{colname}` has Spark type {dt.simpleString()}, schema wants {node.type_names}"
        if elem:
            # JSON-null element semantics: a NULL element passes only
            # when "null" is in the union; present values pass only
            # when the Spark type matches a declared type.
            if spark_ok and not null_ok:
                add("type", node.keywords["type"], e.isNotNull(), reason)
            elif not spark_ok and null_ok:
                add("type", node.keywords["type"], e.isNull(), reason)
            elif not spark_ok and not null_ok:
                add("type", node.keywords["type"], F.lit(False), reason)
            # spark_ok and null_ok: statically satisfied
        else:
            # absent-key semantics: NULL always passes (vacuous); a
            # mismatched Spark type means every PRESENT value violates.
            # NB: "null" in the union must NOT disable the check — the
            # union still rejects present values of a wrong type
            # (round-1 ADVICE: {"type": ["null","integer"]} on a string
            # column was passing all strings).
            if not spark_ok:
                add("type", node.keywords["type"], e.isNull(), reason)

    # ---- enum -------------------------------------------------------------
    if node.enum_values is not None:
        # deep_equal parity (jsonval.py): type-strict at every level —
        # members that cannot inhabit this Spark type match nothing and
        # are dropped; complex members become typed literals compared
        # with <=> (reference keywords.py:67-94 via is_equal).
        lits = []
        isin_vals = []
        none_member = False
        for v in node.enum_values:
            if v is None:
                none_member = True
                continue
            tl = _typed_lit(v, dt)
            if tl is None:
                continue
            if isinstance(v, (list, dict)):
                lits.append(tl)
            else:
                isin_vals.append(v)
        pred = F.lit(False)
        if isin_vals:
            pred = pred | e.isin(*isin_vals)
        for tl in lits:
            pred = pred | e.eqNullSafe(tl)
        if elem:
            # JSON-null element: matches the enum iff null is a member
            pred = F.when(e.isNull(), F.lit(none_member)).otherwise(pred)
            add("enum", node.enum_values, pred, f"value not in enum({len(node.enum_values)})")
        else:
            add("enum", node.enum_values, F.when(e.isNotNull(), pred),
                f"value not in enum({len(node.enum_values)})")

    # ---- string ----------------------------------------------------------
    is_stringish = isinstance(dt, (T.StringType, T.VarcharType, T.CharType))
    is_binary = isinstance(dt, T.BinaryType)
    strlen = F.octet_length(e) if is_binary else F.length(e)
    if node.min_length is not None and node.min_length > 0 and (is_stringish or is_binary):
        add("minLength", node.min_length, strlen >= node.min_length, f"length < {node.min_length}")
    if node.max_length is not None and (is_stringish or is_binary):
        add("maxLength", node.max_length, strlen <= node.max_length, f"length > {node.max_length}")
    if node.pattern is not None and is_stringish:
        raw, _rx = node.pattern
        if _PY_ONLY_RE.search(raw):
            pred = _pandas_match_pred(e, raw)
            add("pattern", raw, pred, f"does not match /{raw}/", uses_python=True)
        else:
            # (?U) = Java UNICODE_CHARACTER_CLASS: makes \d/\w/\b match
            # Python re's default unicode semantics (parity-tested on
            # non-ASCII digits in tests/test_static_nested.py)
            add("pattern", raw, e.rlike(f"(?U)^(?:{raw})"), f"does not match /{raw}/")
    if node.format is not None and is_stringish:
        add("format", node.format, _format_pred(e, node.format), f"not a valid {node.format}")

    # ---- numeric ---------------------------------------------------------
    is_numeric = isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType,
                                 T.DoubleType, T.FloatType, T.DecimalType))
    if node.minimum is not None and is_numeric:
        op, v = node.minimum
        add("minimum", v, (e > v) if op == "gt" else (e >= v),
            f"value {'<=' if op == 'gt' else '<'} {v}")
    if node.maximum is not None and is_numeric:
        op, v = node.maximum
        add("maximum", v, (e < v) if op == "lt" else (e <= v),
            f"value {'>=' if op == 'lt' else '>'} {v}")
    if node.multiple_of is not None and is_numeric and node.multiple_of != 0:
        add("multipleOf", node.multiple_of, F.pmod(e, F.lit(node.multiple_of)) == 0,
            f"not a multiple of {node.multiple_of}")

    # ---- array -----------------------------------------------------------
    if isinstance(dt, T.ArrayType):
        if node.min_items is not None:
            add("minItems", node.min_items, F.size(e) >= node.min_items, f"size < {node.min_items}")
        if node.max_items is not None:
            add("maxItems", node.max_items, F.size(e) <= node.max_items, f"size > {node.max_items}")
        if node.unique_items:
            # one violation PER duplicate index beyond the first
            # occurrence (reference tools.py:50-65; dynamic.py:238-241)
            add("uniqueItems", True, F.size(e) == F.size(F.array_distinct(e)),
                "duplicate elements",
                count=F.size(e) - F.size(F.array_distinct(e)))
        if node.items_schema is not None:
            elem_pred = _subschema_pred(node.items_schema, dt.elementType)
            if elem_pred is not None:
                add("items", node.keywords.get("items"), F.forall(e, elem_pred),
                    "an element fails the items subschema",
                    paths=_elem_index_paths(elem_pred, F.lit(0), F.size(e)))
        if node.items_tuple is not None:
            # tuple form: element i checked only when present
            # (reference keywords.py:239-247); a present NULL element is
            # JSON null (elem semantics — vacuous keywords pass it)
            for i, child in enumerate(node.items_tuple):
                cp = _subschema_pred_col(child, F.element_at(e, i + 1), dt.elementType, elem=True)
                if cp is None:
                    continue
                add("items", child.raw,
                    F.when(F.size(e) > i, F.coalesce(cp, F.lit(True))).otherwise(F.lit(True)),
                    f"element {i} fails its tuple subschema")
            ai = node.additional_items
            if ai is False:
                n = len(node.items_tuple)
                # one violation per extra index (dynamic.py:198-201)
                add("additionalItems", False, F.size(e) <= n, f"more than {n} elements",
                    count=F.greatest(F.size(e) - n, F.lit(0)))
            elif ai is not None:
                n = len(node.items_tuple)
                extra = F.slice(e, n + 1, F.greatest(F.size(e) - n, F.lit(0)))
                ep = _subschema_pred(ai, dt.elementType)
                if ep is not None:
                    add("additionalItems", ai.raw, F.forall(extra, ep),
                        f"an element beyond {n} fails the additionalItems subschema",
                        paths=_elem_index_paths(ep, F.lit(n), F.size(e)))

    # ---- nested objects over StructType ------------------------------------
    if isinstance(dt, T.StructType):
        sub_fields = {f.name: f.dataType for f in dt.fields}
        if node.required:
            # struct-field presence = non-null (SURVEY.md §7.4 #6)
            for k in node.required:
                pred = (
                    e.getField(k).isNotNull() if k in sub_fields else F.when(e.isNotNull(), F.lit(False))
                )
                add("required", node.required, F.when(e.isNotNull(), pred),
                    f"missing required field `{k}`")
        for k, child in (node.properties or {}).items():
            if k not in sub_fields:
                continue
            out.extend(
                _compile_property(child, colname, e.getField(k), sub_fields[k],
                                  prefix=f"{path}.{k}")
            )
        # patternProperties: field names are known at compile time for
        # a StructType, so the regex match is resolved driver-side —
        # the exact analog of the reference's per-key resolution
        # (keywords.py:488-546).  Keys declared by a sibling
        # `properties` are skipped (dynamic.py:301-315).
        declared_keys = set((node.properties or {}).keys())
        pat_claimed: set = set()
        for pat, rx, child in (node.pattern_properties or []):
            for fname in sub_fields:
                if rx.match(fname):
                    pat_claimed.add(fname)
                    if fname in declared_keys:
                        continue
                    out.extend(
                        _compile_property(child, colname, e.getField(fname),
                                          sub_fields[fname], prefix=f"{path}.{fname}")
                    )
        # additionalProperties over a closed struct: the unclaimed
        # field set is computed at compile time (keywords.py:549-645).
        if node.additional_properties is not None:
            unclaimed = [
                f for f in sub_fields
                if f not in declared_keys and f not in pat_claimed
            ]
            if node.additional_properties is False:
                for fname in unclaimed:
                    # presence of the field (non-NULL under the
                    # absent-key model) is the violation
                    add("additionalProperties", False,
                        F.when(e.isNotNull(), e.getField(fname).isNull()),
                        f"unexpected extra field `{fname}`")
            else:
                ap = node.additional_properties
                for fname in unclaimed:
                    out.extend(
                        _compile_property(ap, colname, e.getField(fname),
                                          sub_fields[fname], prefix=f"{path}.{fname}")
                    )
        if node.dependencies:
            for k in sorted(node.dependencies):
                kind, payload = node.dependencies[k]
                guard = e.getField(k).isNotNull() if k in sub_fields else F.lit(False)
                if kind == "list":
                    # one check per co-key, path carrying the MISSING
                    # key (reference keywords.py:736-744; dynamic.py
                    # _k_dependencies emits path + [item])
                    for co in payload:
                        present = (
                            e.getField(co).isNotNull() if co in sub_fields else F.lit(False)
                        )
                        out.append(RowCheck(
                            name=f"{path}.{co}.dependencies",
                            column=colname,
                            path=f"{path}.{co}",
                            keyword="dependencies",
                            value_json=json.dumps(node.keywords["dependencies"]),
                            reason=f"`{k}` present but dependent field `{co}` is missing",
                            pred=F.when(e.isNotNull() & guard, present).otherwise(F.lit(True)),
                        ))
                else:
                    # schema-form: when `k` is present the WHOLE object
                    # must satisfy the subschema (keywords.py:746-768;
                    # dynamic.py:404-405 evaluates payload on `data`)
                    sub = _subschema_pred_col(payload, e, dt)
                    if sub is None:
                        continue
                    add("dependencies", node.keywords["dependencies"],
                        F.when(e.isNotNull() & guard,
                               F.coalesce(sub, F.lit(True))).otherwise(F.lit(True)),
                        f"`{k}` present but its dependency subschema fails")

    # ---- object keywords over MapType (open objects) ----------------------
    if isinstance(dt, T.MapType):
        keys = F.map_keys(e)
        if node.min_properties is not None and node.min_properties > 0:
            add("minProperties", node.min_properties, F.size(keys) >= node.min_properties,
                f"fewer than {node.min_properties} keys")
        if node.max_properties is not None:
            add("maxProperties", node.max_properties, F.size(keys) <= node.max_properties,
                f"more than {node.max_properties} keys")
        if node.required:
            for k in node.required:
                add("required", node.required, F.map_contains_key(e, F.lit(k)),
                    f"missing required key `{k}`")
        def key_paths(fail_fn) -> Column:
            """array<string> of "<path>.<key>" for failing map entries —
            the runtime-key violation paths the dynamic evaluator emits
            (dynamic.py:307-315, 340-344)."""
            return F.transform(
                F.filter(F.map_entries(e), fail_fn),
                lambda ent: F.concat(F.lit(path + "."), ent.getField("key")),
            )

        for k, child in (node.properties or {}).items():
            # a present key with NULL value is JSON null: elem semantics
            child_pred = _subschema_pred_col(child, e.getItem(k), dt.valueType, elem=True)
            if child_pred is not None:
                add("properties", {k: child.raw},
                    F.when(F.map_contains_key(e, F.lit(k)),
                           F.coalesce(child_pred, F.lit(True))).otherwise(F.lit(True)),
                    f"value of `{k}` fails its subschema",
                    paths=F.when(
                        F.map_contains_key(e, F.lit(k)), F.array(F.lit(f"{path}.{k}"))
                    ).otherwise(F.array().cast("array<string>")))
        for pat, _rx, child in (node.pattern_properties or []):
            def mk_pp(pat, child):
                def fn(ent):
                    cp = _subschema_pred_col(child, ent.getField("value"), dt.valueType, elem=True)
                    base = ~ent.getField("key").rlike(f"^(?:{pat})")
                    return base if cp is None else (base | F.coalesce(cp, F.lit(True)))
                return fn
            def mk_fail(f):
                # closure factory: no default-arg lambdas (pyspark
                # counts lambda params) and no late binding
                return lambda ent: ~f(ent)

            ok_fn = mk_pp(pat, child)
            add("patternProperties", {pat: child.raw},
                F.forall(F.map_entries(e), ok_fn),
                f"a key matching /{pat}/ has an invalid value",
                paths=key_paths(mk_fail(ok_fn)))
        if node.additional_properties is not None:
            declared = list((node.properties or {}).keys())
            pats = [p for p, _r, _c in (node.pattern_properties or [])]

            def claimed(k: Column) -> Column:
                c = k.isin(*declared) if declared else F.lit(False)
                for p in pats:
                    c = c | k.rlike(f"^(?:{p})")
                return c

            if node.additional_properties is False:
                # one violation per unclaimed key (dynamic.py:330-334)
                add("additionalProperties", False,
                    F.forall(keys, lambda k: claimed(k)),
                    "unexpected extra key",
                    count=F.size(F.filter(keys, lambda k: ~claimed(k))))
            else:
                ap = node.additional_properties

                def unclaimed_ok(ent):
                    cp = _subschema_pred_col(ap, ent.getField("value"), dt.valueType, elem=True)
                    if cp is None:
                        return F.lit(True)
                    return claimed(ent.getField("key")) | F.coalesce(cp, F.lit(True))

                add("additionalProperties", ap.raw,
                    F.forall(F.map_entries(e), unclaimed_ok),
                    "an extra key's value fails the additionalProperties subschema",
                    paths=key_paths(lambda ent: ~unclaimed_ok(ent)))

    # ---- composition (predicate algebra) ----------------------------------
    # A child pred that is NULL at runtime means every keyword in the
    # child was vacuous on this value — the child PASSES (the dynamic
    # evaluator's _child_ok: no errors = ok).  coalesce(p, True) makes
    # that explicit so oneOf counting and `not` negation are exact.
    def child_pass(c: SchemaNode) -> Optional[Column]:
        p = _subschema_pred_col(c, e, dt, elem=elem)
        return None if p is None else F.coalesce(p, F.lit(True))

    def guard(pred: Column) -> Column:
        # column position: composition is vacuous on an absent key;
        # element position: NULL is JSON null and the children have
        # already produced definite verdicts on it
        return pred if elem else F.when(e.isNotNull(), pred)

    if node.all_of:
        preds = [child_pass(c) for c in node.all_of]
        preds = [p for p in preds if p is not None]
        if preds:
            total = preds[0]
            for p in preds[1:]:
                total = total & p
            add("allOf", node.keywords["allOf"], guard(total), "a subschema fails")
    if node.any_of:
        preds = [child_pass(c) for c in node.any_of]
        if all(p is not None for p in preds) and preds:
            total = preds[0]
            for p in preds[1:]:
                total = total | p
            add("anyOf", node.keywords["anyOf"], guard(total), "no subschema passes")
    if node.one_of:
        preds = [child_pass(c) for c in node.one_of]
        counted = [
            (p if p is not None else F.lit(True)).cast("int") for p in preds
        ]
        total = counted[0]
        for p in counted[1:]:
            total = total + p
        add("oneOf", node.keywords["oneOf"], guard(total == 1),
            "subschema pass count != 1")
    if node.not_ is not None:
        p = child_pass(node.not_)
        pred = F.lit(False) if p is None else ~p  # always-true subschema => always fail
        add("not", node.keywords["not"], guard(pred), "`not` subschema passes")

    return out


def _subschema_pred_col(
    node: SchemaNode, e: Column, dt: T.DataType, elem: bool = False
) -> Optional[Column]:
    """Compile a subschema to a single boolean pass-Column over e.
    Returns None when the subschema is vacuous for this Spark type
    (always-true).  NULL-safe: caller wraps with isNotNull (column
    position) or coalesces NULL to pass (element position)."""
    checks = _compile_property(node, "_", e, dt, elem=elem)
    if not checks:
        return None
    total = checks[0].pred
    for c in checks[1:]:
        total = total & c.pred
    return total


def _subschema_pred(node: SchemaNode, elem_dt: T.DataType):
    """Element-level lambda for forall().

    Element position = JSON-null semantics: the `type` keyword produces
    a definite verdict on NULL elements (elem=True branch above), while
    type-dispatched keywords stay vacuous on them — so a remaining NULL
    conjunction means "no applicable keyword" and coalesces to pass
    (draft-04: keywords apply only to matching types; [null] against
    items:{"minimum":0} is valid)."""
    # typed null: getField/getItem on an untyped VOID literal fails analysis
    probe = _compile_property(node, "_elem", F.lit(None).cast(elem_dt), elem_dt, elem=True)
    if not probe:
        return None

    def fn(x: Column) -> Column:
        checks = _compile_property(node, "_elem", x, elem_dt, elem=True)
        total = checks[0].pred
        for c in checks[1:]:
            total = total & c.pred
        return F.coalesce(total, F.lit(True))

    return fn


#: Spark types an enum scalar of each Python type can inhabit under
#: deep_equal's type-strict comparison (jsonval.py: True != 1, 1.0 != 1)
_LIT_OK = {
    bool: (T.BooleanType,),
    int: (T.LongType, T.IntegerType, T.ShortType, T.ByteType, T.DecimalType),
    float: (T.DoubleType, T.FloatType),
    str: (T.StringType, T.VarcharType, T.CharType),
}


def _typed_lit(v, dt: T.DataType) -> Optional[Column]:
    """Build a typed literal Column for a JSON enum member against a
    Spark type, honoring deep_equal's type-strictness.  Returns None
    when the member cannot inhabit ``dt`` (it can then never equal any
    value of the column and contributes nothing to the isin/<=> pred).

    Struct members follow the absent-key model: dict keys missing from
    the struct become NULL fields, so ``{"a": 1}`` equals a struct row
    ``{a: 1, b: NULL}`` — the same modeling used by `required`.

    Raises PlanError for object members over MapType columns: Spark
    defines no equality on maps, so static mode cannot answer —
    callers should use the dynamic backend (round-1 ADVICE: never
    silently compile a wrong predicate)."""
    if v is None:
        return F.lit(None).cast(dt)
    # NB: bool before int — bool is an int subclass in Python
    for py_t, spark_ts in _LIT_OK.items():
        if type(v) is py_t:
            return F.lit(v).cast(dt) if isinstance(dt, spark_ts) else None
    if isinstance(v, list):
        if not isinstance(dt, T.ArrayType):
            return None
        elems = [_typed_lit(x, dt.elementType) for x in v]
        if any(el is None for el in elems):
            return None
        if not elems:
            return F.array().cast(dt)
        return F.array(*elems)
    if isinstance(v, dict):
        if isinstance(dt, T.MapType):
            raise PlanError(
                "enum with object members over a MapType column is not "
                "supported in static mode (Spark defines no map equality); "
                "use the dynamic backend"
            )
        if not isinstance(dt, T.StructType):
            return None
        fnames = {f.name for f in dt.fields}
        if not set(v).issubset(fnames):
            return None
        cols = []
        for f in dt.fields:
            if f.name in v:
                fl = _typed_lit(v[f.name], f.dataType)
                if fl is None:
                    return None
                cols.append(fl.alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return F.struct(*cols)
    return None


def _format_pred(e: Column, fmt: str) -> Column:
    """Catalyst translations of the six format algorithms
    (xjs.formats pins the Python-side semantics; tests cross-check)."""
    if fmt == "date-time":
        return e.rlike(formats.JAVA_DATETIME_RLIKE)
    if fmt == "ipv4":
        return e.rlike(formats.JAVA_IPV4_RLIKE)
    if fmt == "uri":
        return e.rlike(formats.JAVA_URI_RLIKE)
    if fmt == "hostname":
        return (F.length(e) > 0) & ~e.rlike(formats.JAVA_BAD_HOSTNAME)
    if fmt == "email":
        at = F.instr(e, "@")
        name = F.substring_index(e, "@", 1)  # split("@", 1)[0]
        domain = F.substr(e, at + 1)         # split("@", 1)[1]
        return (
            (at > 0)
            & (F.length(name) > 0)
            & (F.length(domain) > 0)
            & ~name.rlike(formats.JAVA_BAD_EMAIL_NAME)
            & ~domain.rlike(formats.JAVA_BAD_EMAIL_DOMAIN)
        )
    if fmt == "ipv6":
        parts = F.split(e, ":", -1)
        hexpart = "^(0|[1-9a-fA-F][0-9a-fA-F]{0,3})$"
        n_empty = F.size(F.filter(parts, lambda p: p == ""))
        return (
            (F.size(parts) < 9)
            & F.forall(parts, lambda p: (p == "") | p.rlike(hexpart))
            & ~((n_empty > 3) | ((n_empty > 1) & (F.size(parts) > 4)))
        )
    raise PlanError(f"unknown format {fmt}")


def _pandas_match_pred(e: Column, pattern: str) -> Column:
    """Vectorized pandas-UDF fallback for Python-only regex syntax."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # NB: no type hints — `from __future__ import annotations` turns
    # them into strings pyspark can't resolve with pandas imported
    # locally; the explicit SCALAR type is equivalent.
    @pandas_udf("boolean", PandasUDFType.SCALAR)
    def _match(s):
        rx = re.compile(pattern)
        return s.str.match(rx).astype("boolean")

    return _match(e)
