"""Pipeline ops: semantic assertions (the exact-oracle equivalence is
exercised by scripts/check_oracles.py — these pin that the algorithms
actually DO their job on the injected fixtures)."""

from pyspark.sql import functions as F

from xjs.pipeline import dedup, similarity, text
from xjs.pipeline.hashing import char_hash


def test_exact_dedup_finds_injected_copies(spark, sf_dir):
    out = dedup.q_dedup_exact(spark, sf_dir).collect()
    # doc_id%60==0 copies: 0,60,...,480 -> 9 groups of exactly 2
    assert len(out) == 9
    assert all(r["n_docs"] == 2 for r in out)
    assert {r["keep_doc_id"] for r in out} == {i for i in range(0, 500, 60)}


def test_minhash_finds_near_duplicates(spark, sf_dir):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.q_dedup_minhash(spark, sf_dir).collect()}
    # every exact copy pair must be found with jaccard 1.0
    for i in range(0, 500, 60):
        assert pairs.get((i, i + 2_000_000)) == 1.0, f"exact pair {i} missed"
    # near-dup pairs (appended 3-token tail) must be found with high jaccard
    found_near = [
        (a, b) for (a, b) in pairs
        if b == a + 1_000_000 and a % 40 == 0
    ]
    assert len(found_near) >= 10  # LSH recall: most of the 13 injected
    for a, b in found_near:
        # 3 appended tokens on a short doc can dip to ~0.78
        assert pairs[(a, b)] >= 0.75


def test_simhash_exact_copies_distance_zero(spark, sf_dir):
    sims = {r["doc_id"]: r["sim"] for r in dedup.q_dedup_simhash(spark, sf_dir).collect()}
    for i in range(0, 500, 60):
        assert sims[i] == sims[i + 2_000_000]
    assert all(0 <= v < 2 ** dedup.SIM_BITS for v in sims.values())


def test_simhash_candidate_rate_bounded(spark, sf_dir):
    """Scale guard (round-1 verdict): the chunk-equality candidate join
    must emit ~linear candidate volume, not a constant fraction of N^2.
    At 8-bit chunks over distinct-token signatures this was 28% of all
    pairs; shingle features + 15-bit chunks measured 0.05%."""
    df = dedup.dedup_corpus(spark, sf_dir)
    n = df.count()
    sims = df.select("doc_id", dedup.simhash(F.col("text")).alias("sim"))
    chunks = sims.select(
        "doc_id",
        F.posexplode(F.array(*[
            (F.shiftright(F.col("sim"), dedup.CHUNK_BITS * c) % (2 ** dedup.CHUNK_BITS))
            for c in range(dedup.SIM_CHUNKS)
        ])).alias("chunk", "val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cands = (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.val") == F.col("b.val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select("a.doc_id", "b.doc_id").distinct().count()
    )
    assert cands / (n * (n - 1) / 2) < 0.02


def test_minhash_candidate_rate_bounded(spark, sf_dir):
    """Scale guard (r2 verdict #4, mirroring the simhash bound): the
    capped band-bucket join must emit ~linear candidate volume — a
    constant fraction of N^2 here means the LSH banding has collapsed
    and the verify stage inherits a quadratic join."""
    from xjs.pipeline.dedup import MINHASH_MAX_BUCKET, minhash_candidate_pairs

    df = dedup.dedup_corpus(spark, sf_dir)
    n = df.count()
    cands = minhash_candidate_pairs(df, max_bucket=MINHASH_MAX_BUCKET).count()
    assert cands / (n * (n - 1) / 2) < 0.02


def test_minhash_cap_drops_only_oversized_buckets(spark, sf_dir):
    """With the cap far above every bucket on this corpus, capped ==
    uncapped; with cap=1 no self-join survivors remain.  Pins that the
    cap filters buckets, not pairs."""
    from xjs.pipeline.dedup import minhash_candidate_pairs

    df = dedup.dedup_corpus(spark, sf_dir)
    uncapped = minhash_candidate_pairs(df).count()
    assert minhash_candidate_pairs(df, max_bucket=10_000).count() == uncapped
    assert minhash_candidate_pairs(df, max_bucket=1).count() == 0


def test_simhash_two_step_api_equals_composition(spark, sf_dir):
    """signatures-in/pairs-out == the one-shot composition (r2 #6)."""
    from xjs.pipeline.dedup import (
        simhash_pairs,
        simhash_pairs_from_signatures,
        simhash_signatures,
    )

    df = dedup.dedup_corpus(spark, sf_dir)
    one_shot = simhash_pairs(df)
    two_step = simhash_pairs_from_signatures(simhash_signatures(df))
    assert one_shot.exceptAll(two_step).count() == 0
    assert two_step.exceptAll(one_shot).count() == 0


def test_simhash_pairs_recall_and_precision(spark, sf_dir):
    """Banding recall: every hamming<=HAMMING_T pair (computed exactly
    via cross join on signatures) must be found by the chunk join —
    the pigeonhole guarantee with 4 chunks and hamming <= 3."""
    found = {(r["doc_a"], r["doc_b"]) for r in dedup.q_dedup_simhash_pairs(spark, sf_dir).collect()}
    sims = dedup.q_dedup_simhash(spark, sf_dir)
    sa = sims.toDF("doc_a", "sim_a")
    sb = sims.toDF("doc_b", "sim_b")
    true_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in sa.crossJoin(sb)
        .filter((F.col("doc_a") < F.col("doc_b"))
                & (F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))) <= dedup.HAMMING_T))
        .collect()
    }
    assert found == true_pairs
    # the injected exact copies are all hamming-0 pairs
    for i in range(0, 500, 60):
        assert (i, i + 2_000_000) in found


def test_brute_force_topk_shape(spark, sf_dir):
    out = similarity.brute_force_topk(spark, sf_dir).collect()
    assert len(out) == similarity.N_QUERIES * similarity.TOP_K
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        scores = [r["score"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_lsh_topk_is_subset_semantics(spark, sf_dir):
    """ANN results come from the query's bucket and scores match the
    exact scores for those neighbors."""
    exact = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in similarity.brute_force_topk(spark, sf_dir).collect()
    }
    buckets = {r["vec_id"]: r["bucket"] for r in similarity.lsh_buckets(spark, sf_dir).collect()}
    for r in similarity.lsh_topk(spark, sf_dir).collect():
        assert buckets[r["neighbor_id"]] == buckets[r["query_id"]]
        if (r["query_id"], r["neighbor_id"]) in exact:
            assert exact[(r["query_id"], r["neighbor_id"])] == r["score"]


def test_langid_on_real_phrases(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is in a house"),
            (2, "der hund und die katze ist nicht da"),
            (3, "le chat et la maison des gens est grande"),
            (4, "xyzzy qwerty plugh"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang"] for r in df.select("doc_id", text.langid(F.col("text")).alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_monotonic_in_stopwords(spark):
    df = spark.createDataFrame(
        [(1, "the of and to a in is done right"), (2, "zz yy xx ww vv uu tt ss rr")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["quality_score"] for r in text.quality_features(df).collect()}
    assert out[1] > out[2]


def test_fingerprint_prefix_invariance(spark):
    """Same first 256 chars => same fingerprint; different => different."""
    base = "word " * 60  # > 256 chars
    df = spark.createDataFrame(
        [(1, base + "tail one"), (2, base + "other ending"), (3, "completely different text here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fp"] for r in df.select("doc_id", text.fingerprint(F.col("text")).alias("fp")).collect()}
    assert out[1] == out[2]
    assert out[3] != out[1]


def test_char_hash_deterministic(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    [r] = df.select(char_hash(F.col("s")).alias("h")).collect()
    assert r["h"] == 304891  # pinned: matches the DuckDB oracle value


def test_multimodal_arrow_roundtrip(spark, sf_dir):
    from xjs.pipeline import multimodal as mm
    from xjs.sources.webpages import webpages

    wp = webpages(spark, sf_dir)
    out = mm.multimodal_meta(wp)
    rows = out.collect()
    assert len(rows) == 500
    sample = [r for r in rows if r["n_bytes"] > 0][0]
    assert sample["magic"] == "<html>"
    assert sample["feat1"] == ord("<")
    # null binary rows survive with n_bytes 0
    assert any(r["n_bytes"] == 0 for r in rows)


def test_decode_stub_raises():
    import pytest

    from xjs.pipeline import multimodal as mm

    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")


def test_embedding_near_duplicates(spark, sf_dir):
    """All-pairs LSH-bucket dedup over embeddings: injected exact
    copies at cosine 1.0, near copies (cyclic 0.95/1.0/1.05 coordinate
    scaling) close to 1.0, and no natural pairs (base corpus max
    pairwise cosine ~0.51)."""
    out = {(r["vec_a"], r["vec_b"]): r["cos"]
           for r in similarity.q_dedup_embedding(spark, sf_dir).collect()}
    for i in range(0, 500, 50):
        assert out.get((i, i + 20_000)) == 1.0, f"exact pair {i} missed"
    near_found = [(a, b) for (a, b) in out if b == a + 10_000 and a % 30 == 0]
    assert len(near_found) >= 15  # 17 injected; LSH bucket recall
    for a, b in near_found:
        assert out[(a, b)] >= similarity.COSINE_T
    # nothing from the natural (near-orthogonal) corpus: every pair
    # involves an injected copy (vec_id >= 10_000)
    assert all(b >= 10_000 for a, b in out)


def test_multimodal_resize_plumbing(spark, sf_dir):
    """Binary-in/binary-out Arrow mechanics: fixed-size output buffers,
    NULL propagation, deterministic content."""
    from xjs.pipeline import multimodal as mm
    from xjs.sources.webpages import webpages

    wp = webpages(spark, sf_dir)
    out = mm.resize_images(wp, width=4, height=4).collect()
    assert len(out) == wp.count()
    for r in out:
        assert (r["width"], r["height"]) == (4, 4)
        if r["pixels"] is not None:
            assert len(r["pixels"]) == 16
    # null binary rows propagate as null rasters
    n_null_in = wp.filter(F.col("html").isNull()).count()
    assert sum(1 for r in out if r["pixels"] is None) == n_null_in
    # deterministic: same inputs -> same buffers (urls can repeat, so
    # compare as sorted multisets)
    def key(rows):
        return sorted((r["url"], bytes(r["pixels"]) if r["pixels"] is not None else None)
                      for r in rows)

    assert key(out) == key(mm.resize_images(wp, 4, 4).collect())


def test_substring_duplicates_flags_injected(spark, sf_dir):
    """Exact copies and appended-tail near-dups share >=16-token
    windows with their base doc, so every copy is flagged with an
    owner no later than its base.  (Base docs themselves can also be
    flagged: the corpus generator genuinely repeats multi-token spans
    across docs — those are true positives, verified by the DuckDB
    oracle.)"""
    out = {r["doc_id"]: r for r in dedup.q_dedup_substring(spark, sf_dir).collect()}
    base = dedup.dedup_corpus(spark, sf_dir)
    n_toks = {r["doc_id"]: r["n"] for r in base.select(
        "doc_id", F.size(F.split(F.trim("text"), "\\s+")).alias("n")).collect()}
    for i in range(0, 500, 60):         # exact copies
        if n_toks[i] >= dedup.SUBSTR_W:
            r = out[i + 2_000_000]
            assert r["earliest_owner"] <= i
            # all of the copy's (distinct) windows are shared with its base
            assert r["n_shared_windows"] >= 1
    for i in range(0, 500, 40):         # near-dups (tail appended)
        if n_toks[i] >= dedup.SUBSTR_W:
            assert out[i + 1_000_000]["earliest_owner"] <= i
    # every flagged doc points at a strictly earlier owner
    assert all(r["earliest_owner"] < d for d, r in out.items())


def test_pq_codes_and_adc_recall(spark, sf_dir):
    """PQ codes are bounded per subspace; ADC top-k overlaps
    meaningfully with exact brute-force neighbors (4x16-dim codebooks
    at K=8 are coarse, so require overlap, not equality)."""
    codes = similarity.pq_codes(spark, sf_dir)
    n_vecs = codes.select("vec_id").distinct().count()
    assert codes.count() == n_vecs * similarity.M_PQ
    assert codes.filter(
        (F.col("code") < 0) | (F.col("code") >= similarity.K_PQ)
    ).count() == 0

    pq = similarity.pq_topk(spark, sf_dir).collect()
    exact = similarity.brute_force_topk(spark, sf_dir).collect()
    pq_sets = {}
    for r in pq:
        pq_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ex_sets = {}
    for r in exact:
        ex_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(pq_sets) == set(ex_sets)
    # per-query ranks are dense 1..k
    for q, s in pq_sets.items():
        assert len(s) == similarity.TOP_K
    overlap = sum(len(pq_sets[q] & ex_sets[q]) for q in ex_sets)
    total = sum(len(ex_sets[q]) for q in ex_sets)
    assert overlap / total >= 0.2, f"ADC recall collapsed: {overlap}/{total}"


def test_substring_spans_excise_not_drop(spark):
    """A doc quoting a w-token span of an earlier doc keeps its own
    prose with only the quoted span cut — the Lee et al. 2022 removal
    semantics (whole-doc dropping would delete the original tail)."""
    w = dedup.SUBSTR_W
    quoted = " ".join(f"q{i}" for i in range(w))          # 16-token span
    own_head = "alpha beta gamma delta"
    own_tail = "epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (1, f"source text {quoted} and more source prose"),
            (2, f"{own_head} {quoted} {own_tail}"),
        ],
        "doc_id long, text string",
    )
    spans = dedup.substring_spans(df)
    rows = spans.collect()
    # only doc 2 is flagged, with exactly the quoted token range
    assert {r["doc_id"] for r in rows} == {2}
    (s,) = rows
    assert s["token_start"] == 4 and s["token_end"] == 4 + w
    cleaned = {r["doc_id"]: r["clean_text"]
               for r in dedup.substring_remove(df, spans).collect()}
    # owner doc keeps its text (normalized rejoin)
    assert quoted in cleaned[1]
    # quoting doc survives with the span excised, not dropped whole
    assert cleaned[2] == f"{own_head} {own_tail}"


def test_substring_spans_merge_overlapping_windows(spark):
    """Consecutive duplicated windows merge into ONE maximal span."""
    w = dedup.SUBSTR_W
    span = " ".join(f"s{i}" for i in range(w + 5))        # 21 dup tokens
    df = spark.createDataFrame(
        [(1, f"{span} owner suffix"), (2, f"prefix {span} tail words")],
        "doc_id long, text string",
    )
    rows = dedup.substring_spans(df).collect()
    assert len(rows) == 1                                  # merged, not 6 spans
    (s,) = rows
    assert s["doc_id"] == 2
    assert s["token_end"] - s["token_start"] == w + 5


def test_decontaminate_tau_spares_incidental_hit(spark):
    """One incidental gram collision passes at tau=0.05; a heavily
    overlapping doc is still flagged; tau->0 recovers any-hit."""
    from xjs.pipeline import decontam

    n = decontam.NGRAM
    bench_text = " ".join(f"b{i}" for i in range(20))
    # 1 shared gram out of ~97 grams -> frac ~0.01 < 0.05
    incidental = " ".join(f"x{i}" for i in range(50)) + " " \
        + " ".join(f"b{i}" for i in range(n)) + " " \
        + " ".join(f"y{i}" for i in range(50))
    # mostly benchmark text -> frac >> 0.05
    heavy_overlap = bench_text + " tail0 tail1"
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, incidental), (2, heavy_overlap)], "doc_id long, text string"
    )
    flagged = {r["doc_id"]: r for r in
               decontam.contaminated_docs_tau(corpus, bench, tau=0.05).collect()}
    assert 1 not in flagged
    assert 2 in flagged and flagged[2]["overlap_frac"] > 0.5
    anyhit = {r["doc_id"] for r in
              decontam.contaminated_docs_tau(corpus, bench, tau=0.0).collect()}
    assert anyhit == {1, 2}


def test_normalized_dedup_collapses_case_punct_ws_variants(spark):
    """The normalized tier must merge case/punctuation/whitespace
    variants that byte-exact dedup cannot see, keep the min id, and
    NOT merge genuinely different texts."""
    from pyspark.sql import functions as F

    from xjs.pipeline.dedup import exact_duplicates, normalized_duplicates

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "ALPHA, beta!!  GAMMA."),      # case + punct + ws variant
            (3, "alpha\tbeta\ngamma"),          # whitespace-class variant
            (4, "alpha beta delta"),            # different content
            (5, "unrelated text entirely"),
        ],
        "doc_id long, text string",
    )
    norm = normalized_duplicates(df).collect()
    assert len(norm) == 1
    assert norm[0]["n_docs"] == 3 and norm[0]["keep_doc_id"] == 1
    # byte-exact sees nothing (all five texts differ)
    assert exact_duplicates(df).count() == 0


def test_normalize_text_ascii_contract(spark):
    from pyspark.sql import functions as F

    from xjs.pipeline.dedup import normalize_text

    df = spark.createDataFrame(
        [("  A-b.C  déf 42! ",)], "text string"
    )
    got = df.select(normalize_text(F.col("text")).alias("t")).first()["t"]
    # lowercase, punctuation dropped, non-ASCII letters dropped (the
    # documented contract), whitespace collapsed + trimmed
    assert got == "abc df 42"
