"""Clustered data layout: range-partitioned + sorted parquet writes so
min/max column statistics (parquet footer / row-group stats, Iceberg
manifest ranges) prune scans on the cluster key.

Why this matters at 100 TB: a filter like ``warc_ts BETWEEN x AND y``
or ``domain = 'foo'`` over randomly-laid-out files must open every
file; after clustering, each file covers a narrow disjoint key range
and the reader skips everything else — the I/O drops from the table
size to the selectivity.  ``repartitionByRange`` does one global
range shuffle (sampling-based splits, so skewed keys still spread by
count, not by distinct value); ``sortWithinPartitions`` then makes
every row group monotonic so the footer min/max are tight.

On Iceberg the same intent is ``ALTER TABLE ... WRITE ORDERED BY``;
the parquet fallback here produces the identical physical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 64,
) -> None:
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_key_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per data file, read from the parquet
    footers — the same statistics the scan planner prunes with.
    Driver-side metadata only; no data read."""
    import os

    import pyarrow.parquet as pq

    ranges = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = md.schema.names.index(column)
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return []  # stats missing: no pruning possible
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            ranges.append((lo, hi))
    return ranges


def pruning_ratio(path: str, column: str, lo, hi) -> float:
    """Fraction of files a [lo, hi] filter may skip given the footer
    ranges — the observable the clustering exists to maximize."""
    ranges = file_key_ranges(path, column)
    if not ranges:
        return 0.0
    hit = sum(1 for a, b in ranges if not (b < lo or a > hi))
    return 1.0 - hit / len(ranges)


def compact_small_files(
    spark,
    in_path: str,
    out_path: str,
    target_mb: int = 128,
) -> int:
    """Shuffle-free small-file compaction: size the output file count
    from the input's actual bytes (driver-side listing, no data read)
    and rewrite through ``coalesce`` — partitions are concatenated,
    never shuffled, so the cost is one read+write pass and within-file
    row order is preserved.  Returns the output file count.

    The 10^12-row relevance: streaming sinks and per-partition
    checkpointed writes leave thousands of KB-sized files per day;
    unpacked, every downstream scan pays task-per-file scheduling and
    footer overhead.  On Iceberg this is `rewrite_data_files`; the
    parquet form is the same maintenance pass."""
    import math
    import os

    total = sum(
        e.stat().st_size
        for e in os.scandir(in_path)
        if e.name.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    spark.read.parquet(in_path).coalesce(n_out).write.mode("overwrite").parquet(out_path)
    return n_out
