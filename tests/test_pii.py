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
