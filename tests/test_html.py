"""HTML -> text extraction contract (xjs.pipeline.html)."""

from pyspark.sql import functions as F

from xjs.pipeline.html import extract_text_col, html_extract_text, page_corpus


def _one(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(extract_text_col(F.col("html")).alias("t")).first()["t"]


def test_webpages_fixture_invariant(spark, sf_dir):
    """On the driver's webpages table the wrapper strips back to the
    text column byte-for-byte (the input_hint per-row invariant) —
    word-salad text is single-spaced, so the whitespace collapse is an
    identity on it."""
    from xjs.sources.webpages import webpages

    w = webpages(spark, sf_dir).filter(F.col("html").isNotNull())
    bad = html_extract_text(w).filter(
        F.col("extracted_text") != F.col("text")
    )
    assert w.count() > 0
    assert bad.count() == 0


def test_script_and_style_subtrees_removed(spark):
    got = _one(
        spark,
        '<head><script a="b">var x = 1; if (x > 0) { f(); }</script>'
        "<STYLE>.c { color: red }</STYLE></head><body>kept</body>",
    )
    assert got == "kept"


def test_entity_encoded_markup_survives_as_text(spark):
    """&lt;script&gt; in body text is CONTENT, not markup — decode runs
    after stripping, so it must survive verbatim."""
    got = _one(spark, "<p>&lt;script&gt;evil()&lt;/script&gt;</p>")
    assert got == "<script>evil()</script>"


def test_double_encoded_amp_single_pass(spark):
    # &amp;lt; decodes to the literal &lt; (one pass, &amp; last)
    got = _one(spark, "<p>&amp;lt;</p>")
    assert got == "&lt;"


def test_nbsp_decodes_to_u00a0_not_collapsed(spark):
    got = _one(spark, "<p>a&nbsp;&nbsp;b</p>")
    assert got == "a  b"


def test_whitespace_collapse_and_trim(spark):
    got = _one(spark, "<div>\n  a\t\tb   <br>   c </div>")
    assert got == "a b c"


def test_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "html string")
    assert html_extract_text(df).first()["extracted_text"] is None


def test_naive_tag_limit_documented(spark):
    """'>' inside an attribute value truncates the tag early — the
    documented naive-extractor limitation; pin the behavior so a
    future smarter extractor changes this test consciously."""
    got = _one(spark, '<a href="x>y">link</a>')
    assert got == 'y">link'


def test_extraction_plan_is_narrow(spark, sf_dir):
    plan = (
        html_extract_text(page_corpus(spark, sf_dir))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # scan-fused projection, zero shuffle
