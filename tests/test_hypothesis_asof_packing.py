"""Property-based differential tests: asof_join vs pandas.merge_asof,
pack_sequences vs a pure-Python prefix-sum mirror."""

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from xjs.pipeline.asof import asof_join
from xjs.pipeline.packing import pack_sequences

BASE = dt.datetime(2024, 1, 1)


# unique timestamps per side so merge_asof's tie rule (input order)
# can't diverge from our tiebreak rule; explicit tie cases are pinned
# in test_asof.py
@st.composite
def asof_case(draw):
    n_keys = draw(st.integers(1, 3))
    left_offs = draw(
        st.lists(st.integers(0, 500), min_size=1, max_size=25, unique=True)
    )
    right_offs = draw(
        st.lists(st.integers(0, 500), min_size=0, max_size=25, unique=True)
    )
    lrows = [
        (i, draw(st.integers(0, n_keys - 1)), BASE + dt.timedelta(minutes=m))
        for i, m in enumerate(left_offs)
    ]
    rrows = [
        (100 + i, draw(st.integers(0, n_keys - 1)), BASE + dt.timedelta(minutes=m), float(i))
        for i, m in enumerate(right_offs)
    ]
    return lrows, rrows


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(asof_case())
def test_asof_matches_pandas_merge_asof(spark, case):
    lrows, rrows = case
    left = spark.createDataFrame(lrows, "event_id bigint, k bigint, ts timestamp")
    right = spark.createDataFrame(
        rrows, "event_id bigint, k bigint, ts timestamp, value double"
    )
    got = {
        r["event_id"]: (r["m_id"], r["m_value"])
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            values={"event_id": "m_id", "value": "m_value"}, tiebreak="event_id",
        ).collect()
    }

    lp = pd.DataFrame(lrows, columns=["event_id", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["m_id", "k", "ts", "m_value"]).sort_values("ts")
    for p in (lp, rp):  # empty frames come up object-dtyped
        p["ts"] = pd.to_datetime(p["ts"])
        p["k"] = p["k"].astype("int64")
    rp["m_id"] = rp["m_id"].astype("float64")
    rp["m_value"] = rp["m_value"].astype("float64")
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for _, row in merged.iterrows():
        want = (
            None if pd.isna(row["m_id"]) else int(row["m_id"]),
            None if pd.isna(row["m_value"]) else float(row["m_value"]),
        )
        assert got[int(row["event_id"])] == want, (row["event_id"], got, merged)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["en", "de"]), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    ),
    st.integers(5, 50),
)
def test_packing_matches_python_mirror(spark, docs, budget):
    rows = [
        (i, lang, " ".join(f"w{j}" for j in range(ntok)))
        for i, (lang, ntok) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"], r["bin_offset"])
        for r in pack_sequences(df, "lang", "doc_id", budget=budget).collect()
    }
    cum: dict = {}
    for i, (lang, ntok) in enumerate(docs):
        start = cum.get(lang, 0)
        assert got[i] == (ntok, start // budget, start % budget), (i, got[i])
        cum[lang] = start + ntok
