"""t-digest-style mergeable quantiles via applyInPandas (the
north_star's "quantiles via t-digest" — SURVEY.md §2.9).

Spark's built-in ``percentile_approx`` (GK sketch) is the default
scale path in xjs.checks.stats; this module exists for pipelines that
standardize on t-digest semantics (mergeable centroids, better tail
accuracy).  Two-level plan, all vectorized pandas:

  1. per input partition: sort values, cluster into ≤ ``compression``
     (mean, weight) centroids with the classic k0 size bound
     (centroids near the tails stay small → tail accuracy);
  2. one merge group: re-cluster the union of all partial centroids
     and interpolate quantiles.

Stage 1 is a narrow mapInPandas (no shuffle of raw values — only
centroids move, ≤ compression rows per input partition); stage 2
groups a few thousand centroid rows on one reducer, which is the same
topology any t-digest aggregation uses (partials → merge).
Deterministic for a given partitioning: centroid construction is a
pure function of the sorted values.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cluster(values: np.ndarray, weights: np.ndarray, compression: int) -> pd.DataFrame:
    """Greedy size-bounded clustering of (sorted) weighted values into
    t-digest-style centroids: the weight cap for a centroid at
    quantile position q is total * 4q(1-q) / compression."""
    order = np.argsort(values, kind="mergesort")
    values, weights = values[order], weights[order]
    total = weights.sum()
    means: List[float] = []
    wts: List[float] = []
    acc_w = 0.0
    cur_w = 0.0
    cur_sum = 0.0
    for v, w in zip(values, weights):
        q = (acc_w + cur_w + w / 2) / total
        cap = max(total * 4.0 * q * (1.0 - q) / compression, 1.0)
        if cur_w > 0 and cur_w + w > cap:
            means.append(cur_sum / cur_w)
            wts.append(cur_w)
            acc_w += cur_w
            cur_w, cur_sum = 0.0, 0.0
        cur_w += w
        cur_sum += v * w
    if cur_w > 0:
        means.append(cur_sum / cur_w)
        wts.append(cur_w)
    return pd.DataFrame({"mean": means, "weight": wts})


def _quantile_from_centroids(cent: pd.DataFrame, qs: Sequence[float]) -> List[float]:
    cent = cent.sort_values("mean").reset_index(drop=True)
    w = cent["weight"].to_numpy()
    m = cent["mean"].to_numpy()
    cum = np.cumsum(w) - w / 2.0
    total = w.sum()
    out = []
    for q in qs:
        target = q * total
        out.append(float(np.interp(target, cum, m)))
    return out


def quantiles_tdigest(
    df: DataFrame,
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    compression: int = 100,
) -> DataFrame:
    """One row per requested quantile: (q, value)."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vals = []
        for pdf in batches:
            v = pdf[value_col].dropna().to_numpy(dtype="float64")
            if len(v):
                vals.append(v)
        if vals:
            allv = np.concatenate(vals)
            yield _cluster(allv, np.ones(len(allv)), compression)

    centroids = df.select(value_col).mapInPandas(partial, "mean double, weight double")

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        merged = _cluster(
            pdf["mean"].to_numpy(), pdf["weight"].to_numpy(), compression
        )
        vals = _quantile_from_centroids(merged, quantiles)
        return pd.DataFrame({"q": list(quantiles), "value": vals})

    return (
        centroids.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(merge, "q double, value double")
    )
