"""Crawl snapshot diff (xjs/pipeline/diff.py): status contract,
NULL-text content states, churn-proportional output, and the
digest-before-shuffle plan shape."""

from pyspark.sql import functions as F

from xjs.pipeline import diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_status_contract(spark):
    old = _snap(spark, [
        ("u1", "same"), ("u2", "before"), ("u3", "gone"),
        ("u5", None), ("u6", None), ("u7", "now null"),
    ])
    new = _snap(spark, [
        ("u1", "same"), ("u2", "after"), ("u4", "fresh"),
        ("u5", None), ("u6", "was null"), ("u7", None),
    ])
    out = {r["url"]: r["status"] for r in diff.crawl_diff(old, new).collect()}
    assert out == {
        "u2": "changed",
        "u3": "removed",
        "u4": "added",
        # NULL text is a content state: NULL == NULL is unchanged,
        # NULL <-> text is changed
        "u6": "changed",
        "u7": "changed",
    }
    assert "u1" not in out and "u5" not in out


def test_digests_travel_not_text(spark):
    """Both join inputs must be projected to (url, digest) before the
    Exchange — page text never shuffles."""
    old = _snap(spark, [("u1", "aaa")])
    new = _snap(spark, [("u1", "bbb")])
    df = diff.crawl_diff(old, new)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "text" not in m.group(0)
    # and it is a real two-sided shuffle join (no broadcast assumption
    # between two corpus-sized snapshots at scale)
    assert "Exchange" in plan


def test_fixture_query_counts(spark, sf_dir):
    rows = diff.q_crawl_diff(spark, sf_dir).groupBy("status").count().collect()
    got = {r["status"]: r["count"] for r in rows}
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n7 = d.filter(F.col("doc_id") % 7 == 0).count()
    n11 = d.filter(F.col("doc_id") % 11 == 0).count()
    n_changed = d.filter((F.col("doc_id") % 5 == 0)
                         & (F.col("doc_id") % 7 != 0)
                         & F.col("text").isNotNull()).count()
    assert got["removed"] == n7
    assert got["added"] == n11
    assert got["changed"] == n_changed
