"""Property-based differential test: substring_spans / substring_remove
vs an independent brute-force python mirror (dict-of-grams owner scan +
interval union) on random small-vocabulary corpora — small vocabularies
force real cross-doc window collisions, exercising merge boundaries the
fixture corpus can't."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xjs.pipeline.dedup import substring_remove, substring_spans

W = 4  # small window so 30-token docs produce many overlap shapes


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(2, 6))
    docs = []
    for i in range(n_docs):
        toks = draw(st.lists(st.sampled_from("abcde"), min_size=0, max_size=30))
        docs.append((i, " ".join(toks)))
    return docs


def brute_spans(docs, w):
    """Reference: flag window positions whose gram occurred in a
    lower-id doc; union overlapping/adjacent windows into maximal
    half-open spans."""
    owner = {}
    for doc_id, text in docs:
        toks = text.split() if text else []
        for p in range(len(toks) - w + 1):
            g = " ".join(toks[p : p + w])
            owner.setdefault(g, doc_id)
    out = []
    for doc_id, text in docs:
        toks = text.split() if text else []
        flagged = [
            p
            for p in range(len(toks) - w + 1)
            if owner[" ".join(toks[p : p + w])] < doc_id
        ]
        spans = []
        for p in flagged:
            if spans and p <= spans[-1][1]:  # overlap or touch: merge
                spans[-1][1] = max(spans[-1][1], p + w)
            else:
                spans.append([p, p + w])
        out.extend((doc_id, s, e) for s, e in spans)
    return sorted(out)


def brute_clean(docs, spans, w):
    cover = {}
    for doc_id, s, e in spans:
        cover.setdefault(doc_id, []).append((s, e))
    out = {}
    for doc_id, text in docs:
        toks = text.split() if text else []
        kept = [
            t
            for i, t in enumerate(toks)
            if not any(s <= i < e for s, e in cover.get(doc_id, []))
        ]
        out[doc_id] = " ".join(kept)
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus())
def test_spans_and_removal_match_bruteforce(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got_spans = sorted(
        (r["doc_id"], r["token_start"], r["token_end"])
        for r in substring_spans(df, w=W).collect()
    )
    want_spans = brute_spans(docs, W)
    assert got_spans == want_spans

    got_clean = {
        r["doc_id"]: r["clean_text"]
        for r in substring_remove(df, substring_spans(df, w=W)).collect()
    }
    assert got_clean == brute_clean(docs, want_spans, W)


@st.composite
def chunk_docs(draw):
    n_docs = draw(st.integers(1, 5))
    # words + raw whitespace chars: exercises Java-\s split edges
    # (leading/trailing empty tokens, runs of mixed separators)
    alphabet = st.sampled_from(["aa", "b", "ccc", " ", "\t", "\n"])
    return [
        (i, "".join(draw(st.lists(alphabet, min_size=0, max_size=40))))
        for i in range(n_docs)
    ]


def _java_tokens(text):
    """Mirror split(trim(text), '\\s+'): strip 0x20 only, ASCII \\s
    class, keep leading empty field (xjs.pipeline.grams tokenizer
    parity rules)."""
    import re

    return re.split(r"[ \t\n\x0b\f\r]+", text.strip(" "))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(chunk_docs())
def test_chunk_documents_matches_bruteforce(spark, docs):
    from xjs.pipeline.packing import chunk_documents

    C, S = 7, 5
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["token_start"], r["token_end"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=C, stride=S).collect()
    )
    want = []
    for doc_id, text in docs:
        toks = _java_tokens(text)
        n = len(toks)
        for cid, start in enumerate(range(0, max(n, 1), S)):
            if start >= n:
                break
            end = min(start + C, n)
            want.append((doc_id, cid, start, end, " ".join(toks[start:end])))
    assert got == sorted(want)
