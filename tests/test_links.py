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


# ---------------------------------------------------------------------------
# integer PageRank
# ---------------------------------------------------------------------------


def _pr_reference(edges, iterations=3, scale=1_000_000, damping=85):
    """Pure-python restatement of the integer contract."""
    e = sorted({(s, d) for s, d in edges if s != d})
    outd = {}
    for s, _ in e:
        outd[s] = outd.get(s, 0) + 1
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    base = scale * (100 - damping) // 100
    score = {n: scale for n in nodes}
    for _ in range(iterations):
        recv = {n: 0 for n in nodes}
        for s, d in e:
            recv[d] += score[s] // outd[s]
        score = {n: base + (damping * recv[n]) // 100 for n in nodes}
    return score


def test_pagerank_matches_pure_python_reference(spark):
    from xjs.pipeline.links import pagerank_int

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
             ("d", "c"),              # d is a source-only node
             ("c", "c"),              # self loop: removed
             ("a", "b")]              # duplicate: removed
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.score for r in pagerank_int(df, 3).collect()}
    assert got == _pr_reference(edges, 3)
    # the sink-less cycle member with two in-edges ranks highest
    assert max(got, key=got.get) == "c"


def test_pagerank_query_matches_unrolled_oracle(spark, sf_dir):
    from xjs.pipeline.links import oracle_link_pagerank_sql, q_link_pagerank

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    got = sorted(map(tuple, q_link_pagerank(spark, sf_dir).collect()))
    want = sorted(map(tuple,
                      con.sql(oracle_link_pagerank_sql()).fetchall()))
    assert got == want
    # hubs absorb one cross-domain link per live page across 150 hub
    # urls (~3.4 in-links each) vs <=2 for page urls: the hub MEAN
    # must beat the page mean (per-node dominance is not implied at
    # url grain and is deliberately not asserted)
    scores = dict(got)
    hub = [v for k, v in scores.items() if "//hub" in k]
    page = [v for k, v in scores.items() if "//hub" not in k]
    assert sum(hub) / len(hub) > sum(page) / len(page)


def test_anchor_pairs_alignment_and_drops(spark):
    """Each kept href pairs with ITS OWN anchor text (positional zip of
    the two extract passes); nested-tag anchors and junk hrefs drop."""
    from xjs.pipeline.links import html_anchor_pairs

    docs = spark.createDataFrame(
        [(1, "https://a.example.com/doc/1",
          "<a href=\"/x\">first text</a>"
          "<a href=\"#frag\">dropped by href</a>"
          "<A HREF='https://b.com/y'>second text</A>"
          "<a href=\"/nested\"><b>bold</b></a>"       # nested tag: drop
          "<a href=\"/empty\"></a>")],                 # kept, empty anchor
        "doc_id long, url string, html string",
    )
    rows = sorted(
        (r["link"], r["anchor"])
        for r in html_anchor_pairs(docs).collect())
    assert rows == [
        ("https://a.example.com/empty", ""),
        ("https://a.example.com/x", "first text"),
        ("https://b.com/y", "second text"),
    ]


def test_anchor_pairs_plan_zero_exchange(spark, sf_dir):
    from xjs.pipeline.links import anchor_pages_from, html_anchor_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "source")
    df = html_anchor_pairs(anchor_pages_from(d))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_anchor_terms_topk_semantics(spark):
    from xjs.pipeline.links import anchor_text_terms

    pairs = spark.createDataFrame(
        [
            (1, "u", "https://d.com/a", "alpha beta"),
            (2, "u", "https://d.com/b", "alpha  gamma"),
            (3, "u", "https://d.com/c", "alpha beta"),
            (4, "u", "https://e.com/a", "   "),        # blank: no terms
            (5, "u", "https://e.com/b", "solo"),
        ],
        "doc_id long, url string, link string, anchor string",
    )
    out = anchor_text_terms(pairs, k=2).collect()
    d = {(r["target_domain"], r["rank"]): (r["term"], r["cnt"]) for r in out}
    assert d[("d.com", 1)] == ("alpha", 3)
    assert d[("d.com", 2)] == ("beta", 2)    # beats gamma on cnt
    assert d[("e.com", 1)] == ("solo", 1)
    assert ("e.com", 2) not in d
    assert len(out) == 3


def test_anchor_terms_match_constructive_oracle(spark, sf_dir):
    from xjs.pipeline.links import (
        oracle_html_anchor_terms_sql, q_html_anchor_terms,
    )

    mine = q_html_anchor_terms(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    ora = con.sql(oracle_html_anchor_terms_sql()).df()
    key = ["target_domain", "rank"]
    a = mine.sort_values(key).reset_index(drop=True)
    b = ora.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["term"].values == b["term"].values).all()
    assert (a["cnt"].astype(int).values == b["cnt"].astype(int).values).all()
