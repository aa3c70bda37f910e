"""Hyperlink extraction + link-graph degrees: the kept/dropped
contract (absolute http(s), root-relative resolution, junk schemes
dropped), both quoting styles and attr cases, null pages, and the
constructive oracles."""

import duckdb
from pyspark.sql import functions as F

from xjs.pipeline.links import (
    html_extract_links,
    link_graph_degrees,
    oracle_html_links_sql,
    oracle_link_graph_degrees_sql,
    q_html_links,
    q_link_graph_degrees,
)


def test_kept_and_dropped_contract(spark):
    docs = spark.createDataFrame(
        [(1, "https://a.example.com/doc/1",
          "<a href=\"/x/1\">r</a>"
          "<A HREF='HTTPS://B.com/y'>abs-keeps-case-of-value</A>"
          "<a href=\"http://c.com/z\">plain</a>"
          "<a href=\"//proto.rel/x\">drop</a>"
          "<a href=\"#f\">drop</a>"
          "<a href='mailto:m@x'>drop</a>"
          "<a href=\"javascript:void(0)\">drop</a>"
          "<a href=\"doc/rel\">drop-not-root-relative</a>"
          "<a href=''>drop-empty</a>"),
         (2, "https://a.example.com/doc/2", None)],
        "doc_id long, url string, html string")
    got = sorted((r.doc_id, r.link)
                 for r in html_extract_links(docs).collect())
    assert got == [
        (1, "http://c.com/z"),
        (1, "https://a.example.com/x/1"),
    ]


def test_uppercase_scheme_policy_is_pinned(spark):
    """rlike('^https?://') is case-SENSITIVE: uppercase-scheme hrefs
    are dropped (they also never appear in canonicalized crawl html).
    Pinned so nobody flips it silently."""
    docs = spark.createDataFrame(
        [(1, "https://a.com/", "<a href=\"HTTPS://B.com/y\">x</a>")],
        "doc_id long, url string, html string")
    assert html_extract_links(docs).count() == 0


def test_null_pages_contribute_nothing(spark, sf_dir):
    links = q_html_links(spark, sf_dir)
    ids = {r.doc_id for r in links.select("doc_id").distinct().collect()}
    assert all(i % 211 != 0 for i in ids)


def test_three_links_per_live_page(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_live = d.filter(F.col("doc_id") % 211 != 0).count()
    per_doc = q_html_links(spark, sf_dir).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"))
    assert per_doc.filter(F.col("n") != 3).count() == 0
    assert per_doc.count() == n_live


def test_matches_constructive_oracles(spark, sf_dir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    got = sorted(map(tuple, q_html_links(spark, sf_dir).collect()))
    want = sorted(map(tuple, con.sql(oracle_html_links_sql()).fetchall()))
    assert got == want
    gotd = sorted(map(tuple, q_link_graph_degrees(spark, sf_dir).collect()))
    wantd = sorted(map(tuple,
                       con.sql(oracle_link_graph_degrees_sql()).fetchall()))
    assert gotd == wantd


def test_hub_domains_carry_the_skew(spark, sf_dir):
    """The fixture's three hub domains absorb one cross-domain link
    per live page — the hot-key profile; degree aggregation must
    still be exact (partial-agg absorbs it map-side)."""
    deg = {r.target_domain: r.in_links
           for r in q_link_graph_degrees(spark, sf_dir).collect()}
    hubs = {d: n for d, n in deg.items() if d.startswith("hub")}
    assert set(hubs) == {"hub0.example.com", "hub1.example.com",
                         "hub2.example.com"}
    others = [n for d, n in deg.items() if not d.startswith("hub")]
    assert min(hubs.values()) > max(others)
