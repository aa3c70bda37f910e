"""Line-grain dedup: owner semantics, reassembly fidelity, scale
shape (text never rides the wide stages)."""

from xjs.pipeline.lines import (
    duplicated_lines,
    line_corpus,
    line_dedup_remove,
    line_rows,
)


def _mini(spark):
    rows = [
        (1, "unique alpha line\nshared banner line\nshort"),
        (2, "shared banner line\nunique beta line"),
        (3, "shared banner line\nunique gamma line\nshort"),
        (4, "only unique content here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicated_lines_owner_and_counts(spark):
    d = duplicated_lines(_mini(spark)).collect()
    assert len(d) == 1  # 'short' is below MIN_CHARS despite 2 copies
    row = d[0]
    assert row.n_lines == 3 and row.n_docs == 3
    # owner = lowest (doc, line_no): doc 1 line 1
    assert (row.owner_doc, row.owner_line) == (1, 1)


def test_remove_keeps_owner_occurrence_only(spark):
    out = {
        r.doc_id: r.clean_text
        for r in line_dedup_remove(_mini(spark)).collect()
    }
    assert out[1] == "unique alpha line\nshared banner line\nshort"
    assert out[2] == "unique beta line"
    assert out[3] == "unique gamma line\nshort"
    assert out[4] == "only unique content here"


def test_remove_precomputed_dups_table_equivalent(spark):
    df = _mini(spark)
    dups = duplicated_lines(df)
    a = sorted(line_dedup_remove(df).collect())
    b = sorted(line_dedup_remove(df, dups=dups, broadcast_dups=True).collect())
    assert a == b


def test_clean_lines_are_ordered_subsequence(spark, sf_dir):
    """Reassembly keeps surviving lines in original order and bytes —
    split/rejoin must not normalize anything (sf0.001: 500 docs,
    driver-side check is test-only)."""
    corpus = line_corpus(spark, sf_dir)
    joined = corpus.join(line_dedup_remove(corpus), "doc_id")
    rows = joined.select("doc_id", "text", "clean_text").collect()
    assert len(rows) == corpus.count()
    n_trimmed = 0
    for r in rows:
        orig = r.text.split("\n")
        clean_lines = r.clean_text.split("\n") if r.clean_text else []
        n_trimmed += len(orig) - len(clean_lines)
        it = iter(orig)
        assert all(line in it for line in clean_lines), r.doc_id
    assert n_trimmed > 0  # the injected banner/footers actually came out


def test_line_rows_preserves_trailing_empty(spark):
    df = spark.createDataFrame([(1, "a\nb\n")], "doc_id long, text string")
    got = [(r.line_no, r.line) for r in line_rows(df).collect()]
    assert got == [(0, "a"), (1, "b"), (2, "")]


def test_no_text_in_wide_stages(spark, sf_dir):
    """The flagged-position plan (everything before reassembly) must
    not carry the line text through the exchanges: its aggregate/join
    inputs project to ids + digest only."""
    corpus = line_corpus(spark, sf_dir)
    dups = duplicated_lines(corpus)
    plan = dups._jdf.queryExecution().executedPlan().toString()
    # the hash aggregate keys on the digest, never on the raw line
    assert "line_md5" in plan
    assert plan.count("Exchange") <= 2  # partial-agg shuffle (+AQE read)


# --- incremental (cross-run) state ---

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from xjs.pipeline.lines import (
    duplicated_from_state,
    line_corpus,
    line_state_update,
)


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp(prefix="xjs-lines-", dir="/root/repo/.tmp")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _fold(spark, corpus, base, n_slices=3):
    prev = None
    for day in range(n_slices):
        out = os.path.join(base, f"day{day}")
        line_state_update(
            spark, corpus.filter(F.col("doc_id") % n_slices == day), out, prev
        )
        prev = out
    return prev


def test_incremental_bootstrap_equals_batch(spark, sf_dir, tmp):
    corpus = line_corpus(spark, sf_dir)
    line_state_update(spark, corpus, f"{tmp}/all", None)
    got = sorted(duplicated_from_state(spark, f"{tmp}/all").collect())
    want = sorted(duplicated_lines(corpus).collect())
    assert got == want


def test_incremental_fold_equals_full_recompute(spark, sf_dir, tmp):
    corpus = line_corpus(spark, sf_dir)
    final = _fold(spark, corpus, tmp)
    got = sorted(duplicated_from_state(spark, final).collect())
    want = sorted(duplicated_lines(corpus).collect())
    assert got == want and len(got) > 0


def test_incremental_replay_is_noop(spark, sf_dir, tmp):
    corpus = line_corpus(spark, sf_dir)
    out = f"{tmp}/day0"
    slice0 = corpus.filter(F.col("doc_id") % 3 == 0)
    line_state_update(spark, slice0, out, None)
    before = sorted(spark.read.parquet(out).collect())
    # a re-submitted run with DIFFERENT input must not double-apply
    line_state_update(spark, corpus, out, None)
    assert sorted(spark.read.parquet(out).collect()) == before


def test_retro_clean_any_slice_equals_batch_restriction(spark, sf_dir, tmp):
    """Cleaning a slice against the FINAL state == the batch removal
    over the full corpus restricted to that slice's docs."""
    corpus = line_corpus(spark, sf_dir)
    final = _fold(spark, corpus, tmp)
    dups = duplicated_from_state(spark, final)
    batch = line_dedup_remove(corpus)
    for day in range(3):
        sl = corpus.filter(F.col("doc_id") % 3 == day)
        got = sorted(line_dedup_remove(sl, dups=dups).collect())
        want = sorted(
            batch.join(sl.select("doc_id"), "doc_id").collect()
        )
        assert got == want


class TestParagraphGrain:
    def test_paragraph_owner_and_removal(self, spark):
        shared = "a shared paragraph body"
        docs = spark.createDataFrame(
            [
                (1, f"{shared}\n\nunique one"),
                (2, f"prefix two\n\n{shared}"),
                (3, f"{shared}\n\n{shared}"),
            ],
            "doc_id long, text string",
        )
        from xjs.pipeline.lines import (
            duplicated_paragraphs,
            paragraph_dedup_remove,
        )

        dups = {r.line_md5: r for r in duplicated_paragraphs(docs).collect()}
        assert len(dups) == 1
        d = next(iter(dups.values()))
        assert d.n_lines == 4 and d.owner_doc == 1 and d.owner_line == 0
        out = {r.doc_id: r.clean_text
               for r in paragraph_dedup_remove(docs).collect()}
        # owner occurrence (doc 1, para 0) survives; all others removed
        assert out[1] == f"{shared}\n\nunique one"
        assert out[2] == "prefix two"
        assert out[3] == ""
        # single newlines are NOT paragraph breaks
        docs2 = spark.createDataFrame(
            [(1, f"{shared}\nnot a break"), (2, f"{shared}\nnot a break")],
            "doc_id long, text string",
        )
        d2 = duplicated_paragraphs(docs2).collect()
        assert len(d2) == 1  # the whole two-line text is ONE paragraph

    def test_sep_split_edge_byte_faithful(self, spark):
        # 'a\n\n\nb': the \n\n match is non-overlapping left-to-right,
        # leaving '\nb' — split+rejoin must reproduce the bytes
        from xjs.pipeline.lines import line_dedup_remove

        docs = spark.createDataFrame(
            [(1, "a\n\n\nb"), (2, "c\n\nd")], "doc_id long, text string"
        )
        out = {r.doc_id: r.clean_text
               for r in line_dedup_remove(docs, sep="\n\n").collect()}
        assert out[1] == "a\n\n\nb" and out[2] == "c\n\nd"

    def test_sep_default_matches_line_functions(self, spark):
        from xjs.pipeline import lines as L

        docs = spark.createDataFrame(
            [(i, f"shared line one\nuniq {i}\nshared line two")
             for i in range(6)],
            "doc_id long, text string",
        )
        a = sorted(L.duplicated_lines(docs).collect())
        b = sorted(L.duplicated_lines(docs, sep="\n").collect())
        assert a == b
        ra = sorted(L.line_dedup_remove(docs).collect())
        rb = sorted(L.line_dedup_remove(docs, sep="\n").collect())
        assert ra == rb


class TestWithinDocDedup:
    def test_repeats_removed_first_kept(self, spark):
        from xjs.pipeline.lines import line_dedup_within_doc

        docs = spark.createDataFrame(
            [
                (1, "repeated line body\nunique middle\nrepeated line body"),
                # corpus-wide repeats across docs are NOT this op's job
                (2, "repeated line body\nother content here"),
                # sub-min_chars lines (blank separators) never removed
                (3, "long enough line\n\nlong enough line\n"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.clean_text
               for r in line_dedup_within_doc(docs).collect()}
        assert out[1] == "repeated line body\nunique middle"
        assert out[2] == "repeated line body\nother content here"
        # the duplicate long line drops; both empty lines survive
        assert out[3] == "long enough line\n\n"

    def test_triple_repeat_keeps_exactly_first(self, spark):
        from xjs.pipeline.lines import line_dedup_within_doc

        docs = spark.createDataFrame(
            [(1, "\n".join(["same exact line"] * 3 + ["tail line here"]))],
            "doc_id long, text string",
        )
        out = line_dedup_within_doc(docs).collect()[0].clean_text
        assert out == "same exact line\ntail line here"


def test_paragraph_incremental_fold_equals_batch(spark, tmp_path):
    """The cross-run state algebra is grain-agnostic: a 3-slice
    paragraph-grain fold equals the batch paragraph dedup — and the
    folded state drops straight into paragraph_dedup_remove."""
    from xjs.pipeline import lines as L

    docs = spark.createDataFrame(
        [(i,
          f"unique paragraph {i}\n\nshared banner paragraph"
          + ("\n\nextra shared block" if i % 2 == 0 else ""))
         for i in range(9)],
        "doc_id long, text string",
    )
    batch = sorted(L.duplicated_paragraphs(docs).collect())

    dirs = [str(tmp_path / f"s{k}") for k in range(3)]
    prev = None
    for k in range(3):
        L.line_state_update(
            spark, docs.filter(F.col("doc_id") % 3 == k),
            dirs[k], state_in=prev, sep=L.PARA_SEP,
        )
        prev = dirs[k]
    folded = sorted(L.duplicated_from_state(spark, dirs[2]).collect())
    assert folded == batch

    a = sorted(L.paragraph_dedup_remove(docs).collect())
    b = sorted(
        L.paragraph_dedup_remove(
            docs, dups=L.duplicated_from_state(spark, dirs[2])
        ).collect()
    )
    assert a == b
