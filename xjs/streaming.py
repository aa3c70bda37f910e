"""Structured Streaming wrapper: the compiled CheckPlan is
side-effect-free Column algebra, so the SAME plan validates a stream.

North_rule scope note: streaming is not required by the reference or
the north_rule (SURVEY.md §2.9) — this wrapper exists because the
compile-then-validate design makes it nearly free, and a production
CC-ingest pipeline would run exactly this: readStream from the landing
zone → violations/verdicts → append sinks, with a watermark for
late-arriving crawl records.

Shapes:

* ``stream_violations`` — narrow, stateless: violations append-sink.
* ``windowed_violation_counts`` — stateful: per (window, check) counts
  with a watermark bounding state; late rows beyond the watermark drop
  out of state instead of accumulating forever (the 10^12-row
  concern).
* ``run_availablenow`` — batch-equivalent execution of a file stream
  (what the tests assert against the batch engine).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xjs.plan import CheckPlan
from xjs.runtime import violations as _violations


def stream_violations(stream_df: DataFrame, plan: CheckPlan) -> DataFrame:
    """Stateless violation stream — identical expressions to batch."""
    return _violations(stream_df, plan)


def windowed_violation_counts(
    stream_df: DataFrame,
    plan: CheckPlan,
    ts_col: str,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """(window, path, keyword, n) with bounded state via watermark."""
    v = _violations(stream_df.withWatermark(ts_col, watermark), plan, keep_cols=[ts_col])
    return v.groupBy(
        F.window(F.col(ts_col), window).alias("window"), "path", "keyword"
    ).agg(F.count(F.lit(1)).alias("n"))


def run_availablenow(
    stream_df: DataFrame,
    plan: CheckPlan,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Drain all available input (Trigger.AvailableNow) into a parquet
    violations sink — exactly-once via the streaming checkpoint."""
    q = (
        stream_violations(stream_df, plan)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
