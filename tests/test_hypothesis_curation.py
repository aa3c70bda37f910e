"""Property-based checks for the round-2 curation ops against
pure-Python reference implementations: stratified quota sampling and
exact-substring (window-grain) duplicate detection.

Small randomized inputs (derandomized for reproducibility), one Spark
round-trip per example — the same protocol as the other hypothesis
suites.
"""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from xjs.pipeline import sampling
from xjs.pipeline.dedup import substring_duplicates
from xjs.pipeline.hashing import MOD, hash_params

SETTINGS = dict(
    max_examples=12, deadline=None, derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)

# --- stratified quota -------------------------------------------------------

rows_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 500)),
    min_size=1, max_size=40, unique_by=lambda t: t[1],
)


def py_stratified(rows, quota):
    a, b = hash_params(0)
    out = {}
    by_g = {}
    for g, i in rows:
        by_g.setdefault(g, []).append(i)
    for g, ids in by_g.items():
        ids.sort(key=lambda i: ((i * a + b) % MOD, i))
        for rank, i in enumerate(ids[:quota], start=1):
            out[(g, i)] = rank
    return out


@settings(**SETTINGS)
@given(rows=rows_strategy, quota=st.integers(1, 6))
def test_stratified_quota_matches_python(spark, rows, quota):
    df = spark.createDataFrame([Row(g=g, i=i) for g, i in rows])
    got = {
        (r["g"], r["i"]): r["sample_rank"]
        for r in sampling.stratified_quota(df, "g", "i", quota, n_salts=3).collect()
    }
    assert got == py_stratified(rows, quota)


# --- substring duplicates ----------------------------------------------------

texts_strategy = st.lists(
    st.lists(st.sampled_from(list("pqrs")), min_size=0, max_size=8).map(" ".join),
    min_size=1, max_size=12,
)


def py_substring_dups(texts, w):
    grams = []
    for i, t in enumerate(texts):
        toks = t.strip().split()
        gs = {" ".join(toks[j:j + w]) for j in range(len(toks) - w + 1)}
        grams.append(gs)
    owner = {}
    for i, gs in enumerate(grams):
        for g in gs:
            owner.setdefault(g, i)
    out = {}
    for i, gs in enumerate(grams):
        shared = [g for g in gs if owner[g] < i]
        if shared:
            out[i] = (len(shared), min(owner[g] for g in shared))
    return out


@settings(**SETTINGS)
@given(texts=texts_strategy, w=st.integers(2, 4))
def test_substring_duplicates_match_python(spark, texts, w):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {
        r["doc_id"]: (r["n_shared_windows"], r["earliest_owner"])
        for r in substring_duplicates(df, w=w).collect()
    }
    assert got == py_substring_dups(texts, w)


# --- canonical_url ------------------------------------------------------------

import re

from pyspark.sql import functions as F

from xjs.pipeline import urls


def py_canonical(u):
    u = re.sub(r"#.*", "", u, flags=re.DOTALL)
    u = re.sub(r"(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*&?", "", u)
    u = re.sub(r"[?&]+$", "", u)
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", u)
    prefix = m.group(0) if m else ""
    rest = u[len(prefix):]
    prefix = prefix.lower()
    prefix = prefix.replace("://www.", "://", 1)
    prefix = re.sub(r":(80|443)$", "", prefix)
    rest = re.sub(r"/+$", "", rest)
    return prefix + rest


url_strategy = st.builds(
    lambda scheme, www, host, port, path, slash, query, frag: (
        f"{scheme}://{'www.' if www else ''}{host}{port}/{path}{'/' if slash else ''}"
        f"{query}{frag}"
    ),
    scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"]),
    www=st.booleans(),
    host=st.sampled_from(["Example.COM", "example.com", "a.b.example"]),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.sampled_from(["x", "X/y", "doc/1", ""]),
    slash=st.booleans(),
    query=st.sampled_from(["", "?q=1", "?utm_source=a", "?utm_source=a&q=1",
                           "?q=1&utm_campaign=b&fbclid=z"]),
    frag=st.sampled_from(["", "#f", "#a/b?c"]),
)


@settings(**SETTINGS)
@given(us=st.lists(url_strategy, min_size=1, max_size=25))
def test_canonical_url_matches_python(spark, us):
    df = spark.createDataFrame([Row(u=u) for u in us])
    got = {r["u"]: r["c"] for r in df.select(
        "u", urls.canonical_url(F.col("u")).alias("c")).collect()}
    for u in us:
        assert got[u] == py_canonical(u), f"mismatch on {u!r}"


# --- decontamination ----------------------------------------------------------

from xjs.pipeline.decontam import contaminated_docs


def py_contaminated(corpus, bench, n):
    def grams(t):
        toks = t.strip().split()
        return {" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)}

    bench_grams = set().union(*(grams(t) for _, t in bench)) if bench else set()
    out = {}
    for i, t in corpus:
        hits = grams(t) & bench_grams
        if hits:
            out[i] = len(hits)
    return out


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(list("mn")), min_size=0, max_size=7).map(" ".join),
        min_size=2, max_size=10,
    ),
    n=st.integers(2, 3),
)
def test_decontam_matches_python(spark, texts, n):
    rows = list(enumerate(texts))
    bench = [(i, t) for i, t in rows if i % 3 == 0]
    corpus = [(i, t) for i, t in rows if i % 3 != 0]
    bench_df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in bench])
    corpus_df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in corpus])
    got = {
        r["doc_id"]: r["n_hit_grams"]
        for r in contaminated_docs(corpus_df, bench_df, n=n).collect()
    }
    assert got == py_contaminated(corpus, bench, n)
