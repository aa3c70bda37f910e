"""Differential parity: xjs dynamic evaluator vs the reference oracle.

Runs ``extendedjsonschema.Validator(schema).run(doc)`` (the reference
itself, importable from /root/reference) against
``xjs.build_evaluator(schema)(doc)`` on a per-keyword corpus and
asserts identical error sets *with multiplicity* (order-normalized:
the reference emits in generated-code order which we don't promise to
reproduce bit-for-bit; set+multiplicity+paths+values are the
contract — SURVEY.md §5.2).

``maxLength`` / ``format`` crash in the reference v0.1.0 (SURVEY.md
§2.7) — those get pinned *intended-semantics* golden tests instead.
"""

import json

import pytest

from xjs import build_evaluator

ejs = pytest.importorskip("extendedjsonschema")


def norm(errors):
    if errors is None:  # reference single-check quirk (SURVEY.md §3.2)
        return []
    return sorted(
        ({"path": e["path"], "keyword": e["keyword"], "value": e["value"]} for e in errors),
        key=lambda e: (json.dumps(e["path"], default=str), e["keyword"], json.dumps(e["value"], default=str)),
    )


# (schema, [docs...]) — each doc is validated by both engines.
CORPUS = [
    # type — strict semantics: int is not "number", bool is not "integer"
    ({"type": "string"}, ["a", "", 1, 1.0, True, None, [], {}]),
    ({"type": "number"}, [3, 3.0, "3", True, None]),
    # NOTE: bool probes excluded for sole-type()-comparison schemas — the
    # reference's isinstance rewrite lets True pass "integer" there
    # (optimizer.py:32-47); we keep strict semantics (divergence test below).
    ({"type": "integer"}, [3, 3.0, None]),
    ({"type": "null"}, [None, 0, False, ""]),
    ({"type": "boolean"}, [True, False, 0, 1, "true"]),
    ({"type": ["integer", "string"]}, [1, "a", 1.5, None]),
    ({"type": "array"}, [[], [1], {}, "x"]),
    ({"type": "object"}, [{}, {"a": 1}, [], "x"]),
    # enum — type-strict deep equality
    ({"enum": [1, "a", [2], {"k": 1}]}, [1, 1.0, "a", [2], [2.0], {"k": 1}, {"k": 1.0}, None, True]),
    ({"enum": [True]}, [True, 1, 1.0]),
    ({"enum": [[1, [2, "x"]]]}, [[1, [2, "x"]], [1, [2, "y"]], [1, [2]]]),
    # composition
    ({"allOf": [{"type": "integer"}, {"minimum": 3}]}, [5, 2, "x", 3]),
    ({"anyOf": [{"type": "integer"}, {"type": "string"}]}, [5, "x", 1.5, None]),
    ({"oneOf": [{"type": "integer"}, {"minimum": 3}]}, [2, 5, 3.5, "x"]),
    ({"not": {"type": "integer"}}, [5, "x", 1.5]),
    ({"not": {}}, [5, "x"]),  # always-true subschema => unconditional error
    ({"oneOf": [{"minimum": 3}]}, ["x", 2, 5]),  # vacuous truth for strings
    # arrays
    ({"items": {"type": "integer"}}, [[1, 2], [1, "a", 2, "b"], [], "zz"]),
    ({"items": {"type": "string", "minLength": 2}}, [["ab", "c"], ["ab"], [1]]),
    ({"items": [{"type": "integer"}, {"type": "string"}]}, [[1, "a"], ["a", 1], [1], [], [1, "a", 9, 9]]),
    ({"items": [{"type": "integer"}], "additionalItems": False}, [[1], [1, 2, 3, 4], []]),
    ({"items": [{"type": "integer"}], "additionalItems": {"type": "string"}},
     [[1, "a", "b"], [1, 2, "a"], [1]]),
    ({"items": {"type": "integer"}, "additionalItems": False}, [[1, 2, 3]]),  # no-op additionalItems
    ({"minItems": 2}, [[1], [1, 2], []]),
    ({"maxItems": 1}, [[1], [1, 2]]),
    ({"uniqueItems": True}, [[1, 2, 1, 3, 2, 1], [1, 2], [], [[1], [1]], [1, 1.0], [True, 1]]),
    ({"uniqueItems": False}, [[1, 1]]),
    # numeric
    ({"multipleOf": 3}, [9, 10, 7.5, 7.3]),
    ({"minimum": 3}, [2, 3, 4, 2.5, 3.0]),
    ({"minimum": 3, "exclusiveMinimum": True}, [3, 4, 3.0]),
    ({"maximum": 3}, [2, 3, 4, 3.5]),
    ({"maximum": 3, "exclusiveMaximum": True}, [3, 2, 2.9]),
    ({"type": "integer", "minimum": 2, "maximum": 4}, [1, 2, 3, 4, 5, "x", 3.0]),
    # objects
    ({"properties": {"a": {"type": "integer", "minimum": 5}}}, [{"a": 7}, {"a": 3}, {"a": "x"}, {}, {"b": 1}]),
    ({"properties": {"a": {"properties": {"b": {"type": "string"}}}}},
     [{"a": {"b": "x"}}, {"a": {"b": 1}}, {"a": {}}]),
    ({"required": ["a", "b"]}, [{"a": 1, "b": 2}, {"a": 1}, {}]),
    ({"minProperties": 1}, [{}, {"a": 1}]),
    ({"maxProperties": 1}, [{"a": 1}, {"a": 1, "b": 2}]),
    ({"patternProperties": {"^x": {"type": "integer"}}}, [{"xa": 1}, {"xa": "s"}, {"ya": "s"}, {}]),
    ({"patternProperties": {"^x": {"type": "integer"}, "a$": {"type": "string"}}},
     [{"xa": 1}, {"xa": "s"}, {"ba": "s"}, {"ba": 1}]),
    ({"properties": {"xa": {"type": "string"}}, "patternProperties": {"^x": {"type": "integer"}}},
     [{"xa": "ok"}, {"xb": 1}, {"xb": "bad"}]),
    ({"additionalProperties": False, "properties": {"a": {"type": "integer"}}},
     [{"a": 1}, {"a": 1, "b": 2, "c": 3}]),
    ({"additionalProperties": False}, [{}, {"a": 1, "b": 2}]),
    ({"additionalProperties": {"type": "integer"}, "properties": {"a": {"type": "string"}}},
     [{"a": "x", "b": 1}, {"a": "x", "b": "y"}]),
    # NOTE: `{"a": {}}` (empty property subschema) makes the reference's
    # codegen emit a dangling `if` (IndentationError) — use non-empty
    # subschemas here; empty-subschema semantics pinned in
    # test_ap_with_pattern_props_xjs below.
    ({"additionalProperties": False, "properties": {"a": {"type": "integer"}},
      "patternProperties": {"^x": {"type": "integer"}}},
     [{"a": 1, "xq": 2}, {"a": 1, "zz": 2}, {"xq": 2, "zz": 3, "yy": 4}]),
    ({"dependencies": {"a": ["b", "c"]}}, [{"a": 1, "b": 2, "c": 3}, {"a": 1}, {"a": 1, "b": 2}, {"b": 2}]),
    ({"dependencies": {"a": {"required": ["b"]}}}, [{"a": 1, "b": 2}, {"a": 1}, {}]),
    ({"dependencies": {"b": ["a"], "a": ["z"]}}, [{"a": 1, "b": 1}]),
    # strings
    ({"minLength": 3}, ["abc", "ab", ""]),
    ({"minLength": 0}, ["", "a"]),
    ({"pattern": "a+b"}, ["aab", "aabxx", "xxaab", "b", ""]),
    ({"pattern": "^[a-z]{2}$"}, ["ab", "abc", "AB"]),
    # nesting
    ({"properties": {"arr": {"items": {"properties": {"v": {"minimum": 1}}}}}},
     [{"arr": [{"v": 2}, {"v": 0}]}, {"arr": []}, {}]),
    ({"items": {"items": {"type": "integer"}}}, [[[1, 2], [3]], [[1, "x"]], []]),
    # empty / unknown keywords
    ({}, [1, "x", None, {}]),
    ({"unknownKw": 123}, [1, "x"]),
    ({"type": "string", "minimum": 3}, ["ab", 2]),  # dead-rule elimination
]


@pytest.mark.parametrize("schema,docs", CORPUS, ids=lambda x: json.dumps(x)[:60] if isinstance(x, dict) else None)
def test_keyword_parity(schema, docs):
    """EXACT parity including error ORDER (generated-code order:
    general keywords, then type-specific in schema-dict order —
    program.py:53-69); the evaluator reproduces it 1:1."""
    ref = ejs.Validator(schema)
    mine = build_evaluator(schema)
    for doc in docs:
        expected = ref.run(doc) or []  # None-vs-[] normalized only
        actual = mine(doc)
        assert actual == expected, f"schema={schema} doc={doc!r}\nref={expected}\nxjs={actual}"


# --- intended-semantics pins for the reference's broken keywords -----------

def test_maxlength_intended():
    ev = build_evaluator({"maxLength": 3})
    assert ev("abc") == []
    assert ev("abcd") == [{"path": [], "keyword": "maxLength", "value": 3}]
    ev2 = build_evaluator({"minLength": 2, "maxLength": 3})
    assert ev2("a") == [{"path": [], "keyword": "minLength", "value": 2}]
    assert ev2("abcd") == [{"path": [], "keyword": "maxLength", "value": 3}]


@pytest.mark.parametrize(
    "fmt,good,bad",
    [
        # NOTE: the reference's "bad-" regexes are used with re.match
        # (prefix-anchored), so only *leading* defects are caught — e.g.
        # "a..b@c.d" passes email.  Faithfully reproduced.
        ("date-time", ["2024-01-02T03:04:05Z", "2024-01-02t03:04:05.123+01:30", "2024-01-02T03:04:05+0130"],
         ["2024-41-02T03:04:05Z", "2024-01-02 03:04:05Z", "x", "2024-01-02T03:04:05"]),
        ("email", ["a@b.com", "a.b+c@my-host.org", "a b@c.d", "a..b@c.d"],
         ["@b.com", "a@", ".a@c.d", "a@-c.d", "nodomain"]),
        ("hostname", ["example.com", "a-b.c9", "bad..com", "bad_host"], ["", "-bad.com", ".x", "_x"]),
        ("ipv4", ["1.2.3.4", "255.255.255.255", "0.0.0.0"],
         ["1.2.3", "1.2.3.4.5", "256.1.1.1", "01.2.3.4", "a.b.c.d", ""]),
        ("ipv6", ["2001:db8:85a3:1:2:8a2e:370:7334", "::1", "fe80::1"],
         ["1:2:3:4:5:6:7:8:9", "02001::1", "g::1", "1::2::3::4"]),
        ("uri", ["http://example.com", "ftp://h/p", "a+b://x"],
         ["example.com", "http:/x", "1http://x", "://x", "http:"]),
    ],
)
def test_format_intended(fmt, good, bad):
    ev = build_evaluator({"format": fmt})
    for s in good:
        assert ev(s) == [], f"{fmt}: {s!r} should pass"
    for s in bad:
        assert ev(s) == [{"path": [], "keyword": "format", "value": fmt}], f"{fmt}: {s!r} should fail"
    # non-strings are untouched (format is a string keyword)
    assert ev(123) == []


def test_ap_with_pattern_props_xjs():
    """additionalProperties=False with empty property subschemas (the
    reference's codegen crashes on these — IndentationError on a
    dangling if): keys claimed by `properties` or a matching
    patternProperties regex are exempt; others error once each."""
    ev = build_evaluator(
        {"additionalProperties": False, "properties": {"a": {}}, "patternProperties": {"^x": {}}}
    )
    assert ev({"a": 1, "xq": 2}) == []
    assert ev({"a": 1, "zz": 2}) == [
        {"path": [], "keyword": "additionalProperties", "value": False}
    ]


def test_bool_integer_divergence():
    """Documented divergence (SURVEY.md §4.2): the reference's optimizer
    rewrites a sole type() comparison to isinstance, so True passes
    {"type": "integer"} there.  We keep strict (unoptimized) semantics."""
    assert norm(ejs.Validator({"type": "integer"}).run(True)) == []
    assert build_evaluator({"type": "integer"})(True) == [
        {"path": [], "keyword": "type", "value": "integer"}
    ]
