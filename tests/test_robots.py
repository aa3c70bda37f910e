"""robots.txt exclusion: RFC 9309 longest-match semantics (longer
prefix beats shorter, allow wins length ties, no match means allowed),
the whole-site-disallow profile, rule-less domains, and broadcast vs
shuffle join equivalence."""

import duckdb
import pytest
from pyspark.sql import functions as F

from xjs.pipeline.robots import (
    BLOCKED_SOURCE,
    oracle_robots_filter_sql,
    q_robots_filter,
    robots_filter,
    robots_rules,
)


def _rules(spark, rows):
    return spark.createDataFrame(
        rows, "domain string, prefix string, allow boolean")


def test_longest_match_and_no_match_default(spark):
    rules = _rules(spark, [
        ("d.com", "/doc/1", False),
        ("d.com", "/doc/12", True),
    ])
    docs = spark.createDataFrame(
        [(1, "https://d.com/doc/10"),   # /doc/1 matches -> blocked
         (2, "https://d.com/doc/120"),  # /doc/12 longer -> allowed
         (3, "https://d.com/doc/13"),   # /doc/1 -> blocked
         (4, "https://d.com/doc/2"),    # no match -> allowed
         (5, "https://other.com/doc/1")],  # rule-less domain -> allowed
        "doc_id long, url string")
    got = {r.doc_id: (r.allowed, r.matched_prefix)
           for r in robots_filter(docs, rules).collect()}
    assert got == {
        1: (False, "/doc/1"),
        2: (True, "/doc/12"),
        3: (False, "/doc/1"),
        4: (True, None),
        5: (True, None),
    }


def test_allow_wins_length_ties(spark):
    rules = _rules(spark, [
        ("d.com", "/a/x", False),
        ("d.com", "/a/y", True),   # same length, different path
        ("d.com", "/b/1", True),
        ("d.com", "/b/2", False),
    ])
    # a genuine tie needs two same-length rules matching ONE path:
    tie = _rules(spark, [
        ("t.com", "/doc", False),
        ("t.com", "/doc", True),
    ])
    docs = spark.createDataFrame(
        [(1, "https://t.com/doc/5")], "doc_id long, url string")
    got = robots_filter(docs, tie).collect()[0]
    assert got.allowed is True  # RFC tie-break: allow wins


def test_whole_site_disallow_with_reallow(spark, sf_dir):
    out = q_robots_filter(spark, sf_dir)
    blocked_domain = out.filter(
        F.col("url").contains(f"https://{BLOCKED_SOURCE}.example.com/"))
    rows = blocked_domain.collect()
    if not rows:
        pytest.skip(f"{BLOCKED_SOURCE} absent from this sf fixture")
    for r in rows:
        doc = r.url.rsplit("/", 1)[1]
        assert r.allowed == doc.startswith("12"), r


def test_matches_duckdb_oracle(spark, sf_dir):
    got = sorted(map(tuple, q_robots_filter(spark, sf_dir).collect()))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    want = sorted(map(tuple, con.sql(oracle_robots_filter_sql()).fetchall()))
    assert got == want
    assert any(not a for (_, _, a, _) in got)   # the gate has real work
    assert any(a for (_, _, a, _) in got)


def test_broadcast_and_shuffle_joins_agree(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.select(
        "doc_id",
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"))
    rules = robots_rules(spark, sf_dir)
    a = robots_filter(corpus, rules, broadcast_rules=True)
    b = robots_filter(corpus, rules, broadcast_rules=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
