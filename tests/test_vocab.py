"""Vocabulary builder + broadcast-IDF top-terms (xjs/pipeline/vocab.py)."""

from pyspark.sql import functions as F

from xjs.pipeline import vocab


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "a cat and a dog"),
            (4, None),
            (5, "   "),
        ],
        "doc_id long, text string",
    )


def test_word_frequencies_counts_and_df(spark):
    f = {r["token"]: (r["cnt"], r["df"])
         for r in vocab.word_frequencies(_docs(spark)).collect()}
    assert f["the"] == (3, 2)       # 2x doc1 + 1x doc2
    assert f["cat"] == (2, 2)
    assert f["a"] == (2, 1)         # twice in doc3 only
    assert f["mat"] == (1, 1)
    # null/blank docs contribute nothing, no empty-string token
    assert "" not in f


def test_top_vocab_rank_tiebreak_and_coverage(spark):
    top = vocab.top_vocab(vocab.word_frequencies(_docs(spark)), v=3).collect()
    ranked = [(r["rank"], r["token"]) for r in top]
    # cnt desc, token asc: the(3), then cnt=2 group a < cat < dog < sat
    assert ranked == [(1, "the"), (2, "a"), (3, "cat")]
    # integer ppm coverage: total tokens = 14 (6+3+5)
    cov = {r["token"]: r["cum_cov_ppm"] for r in top}
    assert cov["the"] == 3 * vocab.PPM // 14
    assert cov["cat"] == (3 + 2 + 2) * vocab.PPM // 14
    covs = [r["cum_cov_ppm"] for r in sorted(top, key=lambda r: r["rank"])]
    assert covs == sorted(covs)


def test_top_vocab_plan_is_take_ordered(spark):
    """The top-V cut must compile to TakeOrderedAndProject (local
    k-heaps), never a global sort of the frequency table."""
    df = vocab.top_vocab(vocab.word_frequencies(_docs(spark)), v=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_tfidf_top_terms_exact_small_case(spark):
    d = _docs(spark)
    voc = vocab.top_vocab(vocab.word_frequencies(d), v=100)
    out = vocab.tfidf_top_terms(d, voc, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # n_docs = 3 (docs with tokens); doc3: 'a' tf=2 df=1 ->
    # score 2*(3*PPM//1) = 6M beats any tf=1 term
    d3 = sorted(by_doc[3], key=lambda r: r["rank"])
    assert d3[0]["term"] == "a" and d3[0]["score"] == 2 * (3 * vocab.PPM)
    # every doc emits at most k rows, ranks dense from 1
    for rows in by_doc.values():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert len(rows) <= 2


def test_tfidf_idf_side_broadcasts(spark):
    """The catalyst reference impl: the vocabulary idf table is
    bounded -> the tf join must be a BroadcastHashJoin, never a
    term-keyed shuffle join (stopword keys are the hottest in any
    corpus)."""
    d = _docs(spark)
    voc = vocab.top_vocab(vocab.word_frequencies(d), v=100)
    df = vocab.tfidf_top_terms(d, voc, k=2, impl="catalyst")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_arrow_plan_is_shuffle_free(spark):
    """The production (arrow) impl is one narrow kernel: no Exchange,
    no Window, no join anywhere in the plan (r6)."""
    d = _docs(spark)
    voc = vocab.top_vocab(vocab.word_frequencies(d), v=100)
    df = vocab.tfidf_top_terms(d, voc, k=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    for node in ("Exchange", "Window", "Join"):
        assert node not in plan, node


def _edge_docs(spark):
    # ties (equal scores), multi-whitespace runs (empty-string token
    # from leading tab), unicode, and out-of-vocab tokens
    return spark.createDataFrame(
        [
            (1, "aa bb aa bb cc"),
            (2, "\tbb cc dd"),
            (3, "zz aa éé zz"),
            (4, None),
            (5, "   "),
            (6, "cc cc cc notinvocab"),
        ],
        "doc_id long, text string",
    )


def test_word_frequencies_arrow_equals_catalyst(spark):
    d = _edge_docs(spark)
    a = sorted(map(tuple, vocab.word_frequencies(d).collect()))
    c = sorted(map(tuple,
                   vocab.word_frequencies(d, impl="catalyst").collect()))
    assert a == c and len(a) > 0


def test_tfidf_arrow_equals_catalyst(spark):
    d = _edge_docs(spark)
    voc = vocab.top_vocab(vocab.word_frequencies(d), v=5)
    a = sorted(map(tuple, vocab.tfidf_top_terms(d, voc, k=3).collect()))
    c = sorted(map(tuple, vocab.tfidf_top_terms(
        d, voc, k=3, impl="catalyst").collect()))
    assert a == c and len(a) > 0


def test_corpus_token_total_equals_freq_sum(spark):
    d = _docs(spark)
    narrow = vocab.corpus_token_total(d).collect()[0]["total"]
    via_freqs = (vocab.word_frequencies(d)
                 .agg(F.sum("cnt")).collect()[0][0])
    assert narrow == via_freqs == 14
    # and top_vocab with the narrow total matches the derived-total form
    freqs = vocab.word_frequencies(d)
    a = sorted(vocab.top_vocab(freqs, v=3).collect())
    b = sorted(vocab.top_vocab(freqs, v=3,
                               total=vocab.corpus_token_total(d)).collect())
    assert a == b
