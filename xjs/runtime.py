"""Runtime: execute a CheckPlan over a DataFrame.

Violation emission is a single narrow projection (no shuffle): build
one ``array<array<struct>>`` of per-check violation payloads (inner
arrays carry multiplicity, e.g. uniqueItems' one-per-duplicate-index),
drop the nulls, flatten, explode.  Catalyst sees one scan with every
predicate inside one whole-stage-codegen span; column pruning reads
only the columns the compiled checks reference.

Verdicts are a single aggregation pass (one shuffle on the partition
column): per-check violation counts computed as conditional sums in
the same ``groupBy``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xjs.plan import CheckPlan

VIOLATION_COLUMNS = ["id", "path", "keyword", "value_json", "reason", "partition_id"]


@dataclass
class RunResult:
    violations: DataFrame
    verdicts: DataFrame


def violations(df: DataFrame, plan: CheckPlan, keep_cols=()) -> DataFrame:
    """(id, path, keyword, value_json, reason, partition_id[, keep_cols])
    — one row per failed check per document.  Narrow: scan → project →
    explode.  ``keep_cols`` are carried through (e.g. an event-time
    column for streaming windows)."""
    # single-instance checks keep the flat array<struct> + explode shape
    # (no flatten, one fewer allocation per violating row — measurable
    # at 16+ cores where the explode stage is GC-sensitive); the nested
    # shape is built only when some check carries multiplicity
    simple = all(c.count is None and c.paths is None for c in plan.checks)

    def payload_of(c):
        return F.struct(
            F.lit(c.path).alias("path"),
            F.lit(c.keyword).alias("keyword"),
            F.lit(c.value_json).alias("value_json"),
            F.lit(c.reason).alias("reason"),
        )

    def entry(c):
        payload = payload_of(c)
        failed = c.pred.eqNullSafe(F.lit(False))  # NULL pred = vacuous pass
        if simple:
            return F.when(failed, payload)
        if c.paths is not None:
            # per-instance paths (e.g. items: one row per failing
            # element with the runtime index, keywords.py:227-237)
            return F.when(
                failed,
                F.transform(
                    c.paths,
                    lambda p: F.struct(
                        p.alias("path"),
                        F.lit(c.keyword).alias("keyword"),
                        F.lit(c.value_json).alias("value_json"),
                        F.lit(c.reason).alias("reason"),
                    ),
                ),
            )
        if c.count is None:
            return F.when(failed, F.array(payload))
        # multiplicity checks (e.g. uniqueItems: one violation per
        # duplicate index, reference tools.py:50-65) repeat the payload
        return F.when(
            failed, F.array_repeat(payload, c.count.cast("int"))
        )

    entries = [entry(c) for c in plan.checks]
    part = (
        F.col(plan.partition_col)
        if plan.partition_col
        else F.spark_partition_id()
    )
    if not plan.checks:
        # everything statically satisfied: an empty, correctly-typed result
        return (
            df.limit(0).select(
                F.col(plan.id_col).alias("id"),
                F.lit("").alias("path"),
                F.lit("").alias("keyword"),
                F.lit("").alias("value_json"),
                F.lit("").alias("reason"),
                F.lit(0).alias("partition_id"),
                *[F.col(c) for c in keep_cols],
            )
        )
    # Pre-filter: rows passing every check (the overwhelming majority)
    # are eliminated by a pure codegen'd predicate BEFORE the
    # array-of-structs construction + Generate, which are object-heavy
    # and not whole-stage-codegen'd.  At 32 local cores this cut GC
    # contention ~6x; at cluster scale it keeps the explode stage
    # proportional to the violation rate, not the table size.
    df = df.filter(~plan.pass_all())
    exploded = df.select(
        F.col(plan.id_col).alias("id"),
        part.cast("int").alias("partition_id"),
        *[F.col(c) for c in keep_cols],
        F.explode(
            F.filter(F.array(*entries), lambda x: x.isNotNull())
            if simple
            else F.flatten(F.filter(F.array(*entries), lambda x: x.isNotNull()))
        ).alias("v"),
    )
    return exploded.select(
        "id",
        F.col("v.path").alias("path"),
        F.col("v.keyword").alias("keyword"),
        F.col("v.value_json").alias("value_json"),
        F.col("v.reason").alias("reason"),
        "partition_id",
        *[F.col(c) for c in keep_cols],
    )


def verdicts(df: DataFrame, plan: CheckPlan) -> DataFrame:
    """(partition_id, check_name, pass, n_checked, n_violations) —
    one aggregation pass over all checks at once."""
    part = (
        F.col(plan.partition_col)
        if plan.partition_col
        else F.spark_partition_id()
    )
    aggs = []
    for i, c in enumerate(plan.checks):
        aggs.append(
            F.sum(c.pred.isNotNull().cast("long")).alias(f"_n{i}")
        )
        failed = c.pred.eqNullSafe(F.lit(False))
        if c.paths is not None:
            viol = F.when(failed, F.size(c.paths).cast("long")).otherwise(F.lit(0))
        elif c.count is not None:
            viol = F.when(failed, c.count.cast("long")).otherwise(F.lit(0))
        else:
            viol = failed.cast("long")
        aggs.append(F.sum(viol).alias(f"_v{i}"))
    grouped = df.groupBy(part.cast("int").alias("partition_id")).agg(*aggs)

    # unpivot per-check columns into verdict rows with one stack()
    stack_args = []
    for i, c in enumerate(plan.checks):
        stack_args.append(f"'{_sql_escape(c.name)}'")
        stack_args.append(f"_n{i}")
        stack_args.append(f"_v{i}")
    n = len(plan.checks)
    stacked = grouped.select(
        "partition_id",
        F.expr(
            f"stack({n}, {', '.join(stack_args)}) as (check_name, n_checked, n_violations)"
        ),
    )
    return stacked.select(
        "partition_id",
        "check_name",
        (F.col("n_violations") == 0).alias("pass"),
        "n_checked",
        "n_violations",
    )


def run_plan(df: DataFrame, plan: CheckPlan) -> RunResult:
    return RunResult(violations=df.transform(violations, plan), verdicts=verdicts(df, plan))


def quarantine(df: DataFrame, plan: CheckPlan):
    """Single-pass row routing (the expect-or-quarantine pattern):
    returns ``(clean, dirty)`` where ``clean`` keeps the input schema
    (rows passing every check) and ``dirty`` is
    (id, partition_id, failed_checks, n_failed) with the sorted
    comma-joined names of the checks each row failed.

    Both sides are narrow filters over the same codegen'd predicate
    set — Catalyst evaluates the shared subexpressions once per side
    and neither shuffles; writing the two sides to separate sinks
    costs two scans (or one with ``df.persist()`` when the input is
    not a re-readable source)."""
    part = (
        F.col(plan.partition_col)
        if plan.partition_col
        else F.spark_partition_id()
    )
    failed_names = F.array_sort(
        F.filter(
            F.array(*[
                F.when(c.pred.eqNullSafe(F.lit(False)), F.lit(c.name))
                for c in plan.checks
            ]),
            lambda x: x.isNotNull(),
        )
    )
    clean = df.filter(plan.pass_all())
    if not plan.checks:
        dirty = df.limit(0).select(
            F.col(plan.id_col).alias("id"),
            F.lit(0).alias("partition_id"),
            F.lit("").alias("failed_checks"),
            F.lit(0).alias("n_failed"),
        )
        return clean, dirty
    dirty = df.filter(~plan.pass_all()).select(
        F.col(plan.id_col).alias("id"),
        part.cast("int").alias("partition_id"),
        F.array_join(failed_names, ",").alias("failed_checks"),
        F.size(failed_names).alias("n_failed"),
    )
    return clean, dirty


def _sql_escape(s: str) -> str:
    return s.replace("'", "''")
