"""Dynamic backend: SchemaNode -> a compiled Python evaluator.

Compile-once / run-many, like the reference (validator.py:20-23), but
built as a tree of closures instead of generated source.  Used for:

* exact keyword-parity with the reference oracle (error dicts
  ``{path, keyword, value}``, multiplicity, ordering — SURVEY.md §2);
* the Arrow-batched pandas-UDF path over JSON-string columns
  (``xjs.plan.dynamic_violations``) for heterogeneous documents.

Semantics pinned to the *unoptimized* reference program: strict type
checks (``type(x) == T``), type-strict deep equality, no
isinstance-drift (SURVEY.md §4.2).  Valid data always returns ``[]``
(the reference's single-error optimization returns ``None``; we
normalize — SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

from xjs.formats import CHECKERS
from xjs.frontend import KEYWORD_TYPES, SchemaNode, compile_frontend
from xjs.jsonval import PY_TYPE, deep_equal, duplicate_indices

NoneType = type(None)

# evaluator signature: (data, path, errors) -> None
EvalFn = Callable[[Any, list, list], None]


def build_evaluator(node_or_schema) -> Callable[[Any], List[dict]]:
    """Compile a schema (dict or SchemaNode) into ``fn(data) -> errors``."""
    node = (
        node_or_schema
        if isinstance(node_or_schema, SchemaNode)
        else compile_frontend(node_or_schema)
    )
    body = _compile(node)

    def run(data: Any) -> List[dict]:
        errors: List[dict] = []
        body(data, [], errors)
        return errors

    return run


def _err(path: list, keyword: str, value: Any) -> dict:
    return {"path": list(path), "keyword": keyword, "value": value}


def _compile(node: SchemaNode) -> EvalFn:
    """Build the per-schema evaluator: general keywords first, then
    type-dispatched keywords, both in schema-dict order (mirrors the
    reference's program layout, program.py:53-69)."""
    general: List[EvalFn] = []
    by_type: Dict[type, List[EvalFn]] = {}

    for name in node.keywords:
        fns = _KEYWORD_COMPILERS.get(name)
        if fns is None:
            continue
        fn = fns(node)
        if fn is None:  # no-op elision (e.g. minLength: 0)
            continue
        applicable = KEYWORD_TYPES[name]
        if applicable is None:
            general.append(fn)
        else:
            for tname in applicable:
                by_type.setdefault(PY_TYPE[tname], []).append(fn)

    def evaluate(data, path, errors):
        for fn in general:
            fn(data, path, errors)
        for fn in by_type.get(type(data), ()):
            fn(data, path, errors)

    # "compiles to empty code" in the reference = always-true program;
    # composition keywords change behavior on it (anyOf elision, not's
    # unconditional error).
    evaluate.is_empty = not (general or by_type)
    return evaluate


def _child_ok(child_fn: EvalFn, data, path) -> bool:
    probe: List[dict] = []
    child_fn(data, path, probe)
    return not probe


# --- keyword compilers: SchemaNode -> EvalFn | None ------------------------

def _k_type(node: SchemaNode) -> Optional[EvalFn]:
    raw = node.keywords["type"]
    types = tuple(PY_TYPE[t] for t in node.type_names)

    def fn(data, path, errors):
        if type(data) not in types:
            errors.append(_err(path, "type", raw))

    return fn


def _k_enum(node: SchemaNode) -> Optional[EvalFn]:
    values = node.enum_values

    def fn(data, path, errors):
        for v in values:
            if deep_equal(data, v):
                return
        errors.append(_err(path, "enum", values))

    return fn


def _k_allof(node: SchemaNode) -> Optional[EvalFn]:
    children = [_compile(c) for c in node.all_of]

    def fn(data, path, errors):
        for c in children:
            c(data, path, errors)

    return fn


def _k_anyof(node: SchemaNode) -> Optional[EvalFn]:
    raw = node.keywords["anyOf"]
    children = [_compile(c) for c in node.any_of]
    # an always-true subschema (or an empty list) elides the whole
    # anyOf in the reference (keywords.py:135-139 returns "")
    if not children or any(c.is_empty for c in children):
        return None

    def fn(data, path, errors):
        if not any(_child_ok(c, data, path) for c in children):
            errors.append(_err(path, "anyOf", raw))

    return fn


def _k_oneof(node: SchemaNode) -> Optional[EvalFn]:
    raw = node.keywords["oneOf"]
    children = [_compile(c) for c in node.one_of]

    def fn(data, path, errors):
        n = 0
        for c in children:
            if _child_ok(c, data, path):
                n += 1
                if n >= 2:
                    break
        if n != 1:
            errors.append(_err(path, "oneOf", raw))

    return fn


def _k_not(node: SchemaNode) -> Optional[EvalFn]:
    raw = node.keywords["not"]
    child = _compile(node.not_)

    def fn(data, path, errors):
        if _child_ok(child, data, path):
            errors.append(_err(path, "not", raw))

    return fn


def _k_items(node: SchemaNode) -> Optional[EvalFn]:
    if node.items_schema is not None:
        child = _compile(node.items_schema)

        def fn(data, path, errors):
            for i, elem in enumerate(data):
                child(elem, path + [i], errors)

        return fn

    children = [_compile(c) for c in node.items_tuple]

    def fn_tuple(data, path, errors):
        for i, c in enumerate(children):
            if len(data) > i:
                c(data[i], path + [i], errors)

    return fn_tuple


def _k_additional_items(node: SchemaNode) -> Optional[EvalFn]:
    ai = node.additional_items
    if ai is None:  # schema-form items or True: no-op (keywords.py:286-292)
        return None
    n = len(node.items_tuple)
    if ai is False:

        def fn(data, path, errors):
            # one error PER extra index (reference keywords.py:265-269)
            for _ in range(max(len(data) - n, 0)):
                errors.append(_err(path, "additionalItems", False))

        return fn

    child = _compile(ai)

    def fn_schema(data, path, errors):
        for i in range(n, len(data)):
            child(data[i], path + [i], errors)

    return fn_schema


def _k_min_items(node: SchemaNode) -> Optional[EvalFn]:
    v = node.min_items

    def fn(data, path, errors):
        if len(data) < v:
            errors.append(_err(path, "minItems", v))

    return fn


def _k_max_items(node: SchemaNode) -> Optional[EvalFn]:
    v = node.max_items

    def fn(data, path, errors):
        if len(data) > v:
            errors.append(_err(path, "maxItems", v))

    return fn


def _k_unique_items(node: SchemaNode) -> Optional[EvalFn]:
    if not node.unique_items:  # uniqueItems: false => no-op (keywords.py:353-354)
        return None

    def fn(data, path, errors):
        # one error PER duplicate index, path excludes the index
        for _ in duplicate_indices(data):
            errors.append(_err(path, "uniqueItems", True))

    return fn


def _k_multiple_of(node: SchemaNode) -> Optional[EvalFn]:
    v = node.multiple_of

    def fn(data, path, errors):
        if data % v != 0:
            errors.append(_err(path, "multipleOf", v))

    return fn


def _k_minimum(node: SchemaNode) -> Optional[EvalFn]:
    op, v = node.minimum
    if op == "gt":

        def fn(data, path, errors):
            if data <= v:
                errors.append(_err(path, "minimum", v))

    else:

        def fn(data, path, errors):
            if data < v:
                errors.append(_err(path, "minimum", v))

    return fn


def _k_maximum(node: SchemaNode) -> Optional[EvalFn]:
    op, v = node.maximum
    if op == "lt":

        def fn(data, path, errors):
            if data >= v:
                errors.append(_err(path, "maximum", v))

    else:

        def fn(data, path, errors):
            if data > v:
                errors.append(_err(path, "maximum", v))

    return fn


def _k_properties(node: SchemaNode) -> Optional[EvalFn]:
    children = {k: _compile(c) for k, c in node.properties.items()}

    def fn(data, path, errors):
        for key, c in children.items():
            if key in data:  # absent keys vacuously pass (keywords.py:483)
                c(data[key], path + [key], errors)

    return fn


def _k_pattern_properties(node: SchemaNode) -> Optional[EvalFn]:
    pats = [(rx, _compile(c)) for _, rx, c in node.pattern_properties]
    # keys declared by a sibling `properties` are skipped entirely
    # (reference keywords.py:521-531)
    skip = frozenset(node.properties.keys()) if node.properties else frozenset()

    def fn(data, path, errors):
        for key, value in data.items():
            if key in skip:
                continue
            for rx, c in pats:
                if rx.match(key):
                    c(value, path + [key], errors)

    return fn


def _k_additional_properties(node: SchemaNode) -> Optional[EvalFn]:
    ap = node.additional_properties
    if ap is None:  # True => no-op (keywords.py:613-614)
        return None
    declared = frozenset(node.properties.keys()) if node.properties else frozenset()
    pats = [rx for _, rx, _c in (node.pattern_properties or [])]

    def claimed(key: str) -> bool:
        return key in declared or any(rx.match(key) for rx in pats)

    if ap is False:

        def fn(data, path, errors):
            # one (identical) error per unclaimed key (keywords.py:557-607)
            for key in data.keys():
                if not claimed(key):
                    errors.append(_err(path, "additionalProperties", False))

        return fn

    child = _compile(ap)

    def fn_schema(data, path, errors):
        for key, value in data.items():
            if not claimed(key):
                child(value, path + [key], errors)

    return fn_schema


def _k_required(node: SchemaNode) -> Optional[EvalFn]:
    req = node.required
    if not req:  # empty list => no-op (keywords.py:668-669)
        return None

    def fn(data, path, errors):
        # one error per missing key; value is the WHOLE list (keywords.py:660-666)
        for key in req:
            if key not in data:
                errors.append(_err(path, "required", req))

    return fn


def _k_min_properties(node: SchemaNode) -> Optional[EvalFn]:
    v = node.min_properties
    if v == 0:  # no-op (keywords.py:683-684)
        return None

    def fn(data, path, errors):
        if len(data.keys()) < v:
            errors.append(_err(path, "minProperties", v))

    return fn


def _k_max_properties(node: SchemaNode) -> Optional[EvalFn]:
    v = node.max_properties

    def fn(data, path, errors):
        if len(data.keys()) > v:
            errors.append(_err(path, "maxProperties", v))

    return fn


def _k_dependencies(node: SchemaNode) -> Optional[EvalFn]:
    raw = node.keywords["dependencies"]
    # iteration sorted by key (reference keywords.py:739, 762)
    plans = []
    for key in sorted(node.dependencies):
        kind, payload = node.dependencies[key]
        if kind == "list":
            plans.append((key, "list", payload))
        else:
            plans.append((key, "schema", _compile(payload)))

    def fn(data, path, errors):
        for key, kind, payload in plans:
            if key not in data:
                continue
            if kind == "list":
                for item in payload:
                    if item not in data:
                        # path carries the MISSING co-key (keywords.py:736-744)
                        errors.append(_err(path + [item], "dependencies", raw))
            else:
                payload(data, path, errors)

    return fn


def _k_min_length(node: SchemaNode) -> Optional[EvalFn]:
    v = node.min_length
    if v == 0:  # no-op (keywords.py:783-784)
        return None

    def fn(data, path, errors):
        if len(data) < v:
            errors.append(_err(path, "minLength", v))

    return fn


def _k_max_length(node: SchemaNode) -> Optional[EvalFn]:
    # reference v0.1.0 crashes here (NameError, keywords.py:806-810);
    # we implement the intended semantics (SURVEY.md §2.7).
    v = node.max_length

    def fn(data, path, errors):
        if len(data) > v:
            errors.append(_err(path, "maxLength", v))

    return fn


def _k_pattern(node: SchemaNode) -> Optional[EvalFn]:
    raw, rx = node.pattern

    def fn(data, path, errors):
        # prefix-anchored, end-unanchored: re.match (keywords.py:829-832)
        if not rx.match(data):
            errors.append(_err(path, "pattern", raw))

    return fn


def _k_format(node: SchemaNode) -> Optional[EvalFn]:
    # reference v0.1.0 crashes at compile time for every format
    # (unbound {value} placeholder); intended semantics implemented in
    # xjs.formats (SURVEY.md §2.7).
    name = node.format
    checker = CHECKERS[name]

    def fn(data, path, errors):
        if not checker(data):
            errors.append(_err(path, "format", name))

    return fn


_KEYWORD_COMPILERS: Dict[str, Callable[[SchemaNode], Optional[EvalFn]]] = {
    "type": _k_type,
    "enum": _k_enum,
    "allOf": _k_allof,
    "anyOf": _k_anyof,
    "oneOf": _k_oneof,
    "not": _k_not,
    "items": _k_items,
    "additionalItems": _k_additional_items,
    "minItems": _k_min_items,
    "maxItems": _k_max_items,
    "uniqueItems": _k_unique_items,
    "multipleOf": _k_multiple_of,
    "minimum": _k_minimum,
    "maximum": _k_maximum,
    "properties": _k_properties,
    "patternProperties": _k_pattern_properties,
    "additionalProperties": _k_additional_properties,
    "required": _k_required,
    "minProperties": _k_min_properties,
    "maxProperties": _k_max_properties,
    "dependencies": _k_dependencies,
    "minLength": _k_min_length,
    "maxLength": _k_max_length,
    "pattern": _k_pattern,
    "format": _k_format,
}
