"""PII scan/redaction on handcrafted strings + the narrow plan shape."""

from pyspark.sql import functions as F

from xjs.pipeline.pii import pii_scan, redact


def test_pii_counts_and_redaction(spark):
    rows = [
        (1, "mail a@b.co and c.d+x@e-f.org end"),
        (2, "ip 10.0.0.1 and 255.255.255.255"),
        (3, "call 555-123-4567 or 555-000-1111"),
        (4, "mixed a@b.co 1.2.3.4 555-123-4567"),
        (5, "clean text with no pii at all"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (2, 0, 0)
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 2, 0)
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 2)
    assert out[4]["pii_total"] == 3
    assert out[5]["pii_total"] == 0
    assert out[6]["redacted_len"] == 0

    red = {
        r["doc_id"]: r["r"]
        for r in df.select("doc_id", redact(F.col("text")).alias("r")).collect()
    }
    assert red[4] == "mixed <EMAIL> <IP> <PHONE>"
    assert red[5] == rows[4][1]  # untouched


def test_pii_plan_is_narrow(spark, sf_dir):
    from xjs.pipeline.pii import q_text_pii

    plan = q_text_pii(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: fused into the scan


def test_pii_regex_parity_spark_vs_duckdb(spark):
    """Java regex (Spark) and RE2 (DuckDB) must agree on counts AND
    redacted bytes over adversarial near-miss strings, not just the
    fixture corpus."""
    import duckdb
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    alphabet = "ab1.-@ 25c%_+"

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(st.lists(st.text(alphabet, max_size=40), min_size=1, max_size=30))
    def run(texts):
        pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        df = spark.createDataFrame(pdf)
        got = (
            pii_scan(df).orderBy("doc_id")
            .select("n_email", "n_ipv4", "n_phone", "redacted_hash")
            .collect()
        )
        from xjs.pipeline.pii import PII_PATTERNS

        con = duckdb.connect()
        con.register("t", pdf)
        counts = ", ".join(
            f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
            for name, pat, _ in PII_PATTERNS
        )
        red = "text"
        for _, pat, repl in PII_PATTERNS:
            red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
        want = con.sql(
            f"SELECT {counts}, md5({red}) AS redacted_hash "
            "FROM t ORDER BY doc_id"
        ).fetchall()
        for g, w in zip(got, want):
            assert (g["n_email"], g["n_ipv4"], g["n_phone"], g["redacted_hash"]) == w

    run()


def test_prefilter_equivalence(spark, sf_dir):
    """The marker-guarded scan (prefilter=True, the default) must be
    row-identical to the unguarded reference on a corpus that mixes
    clean docs with every injected PII class."""
    from pyspark.sql import functions as F

    from xjs.pipeline.pii import _inject_pii, pii_scan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    injected = docs.select(
        "doc_id", _inject_pii(F.col("doc_id"), F.col("text")).alias("text")
    )
    # include a NULL-text row: guarded counts must stay NULL (not 0)
    injected = injected.unionByName(
        spark.createDataFrame([(99999999, None)], "doc_id long, text string")
    )
    a = pii_scan(injected, prefilter=True)
    b = pii_scan(injected, prefilter=False)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    nul = a.filter(F.col("doc_id") == 99999999).first()
    assert nul.n_email is None and nul.pii_total is None
    # guards actually skip something AND actually fire somewhere
    n_pii = a.filter(F.col("pii_total") > 0).count()
    assert 0 < n_pii < docs.count()
