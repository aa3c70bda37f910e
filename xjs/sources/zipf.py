"""Deterministic Zipf-skewed web corpus fixture (VERDICT r4 #5).

Real web data is Zipfian in its domain/url key: a handful of hosts own
a large share of all pages, so every shuffle keyed (directly or
through shared boilerplate text) on the domain sees a hot partition.
The repo's skew defenses — AQE skew-split on the substring owner
join, the grouped bucket cap in MinHash LSH, the two-stage salted rank
in stratified sampling, the salted dimension join — were previously
exercised with hand-planted hot keys; this module generates a corpus
whose *distribution* is the adversary, so tests can assert the
defenses actually engage (plan-level evidence) and that engaging them
does not change answers.

Shape: ``(doc_id, url, domain, text)`` where

- ``domain`` of doc *i* is the inverse-CDF of the Zipf(s) pmf over
  ``n_domains`` ranks at ``u = splitmix64(doc_id, seed)`` — exact
  finite-support Zipf (harmonic weights ``1/r^s``), not a tail
  approximation, evaluated with a vectorized ``np.searchsorted`` in a
  distributed ``mapInArrow`` stage (no driver-side row loop, no
  ``Date.now``-style nondeterminism: everything derives from doc_id).
- ``text`` = per-doc unique tokens + the domain's shared boilerplate
  tail, so *text-level* keys (token windows, LSH bands) inherit the
  same skew the domain key has — hot grams come from hot domains, the
  way real site boilerplate behaves.

Determinism: two builds with equal arguments are row-identical
(pinned in tests/test_zipf_skew.py), so skewed-vs-unskewed-oracle
comparisons are exact, not statistical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_S = 1.1
BOILER_TOKENS = 24
UNIQUE_TOKENS = 16


def _splitmix64(x):
    """Vectorized splitmix64 finalizer over a uint64 numpy array —
    the standard 64-bit avalanche (public domain constant set), used
    to turn doc_id into an i.i.d.-looking uniform."""
    import numpy as np

    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def zipf_webpages(
    spark: SparkSession,
    n_docs: int,
    n_domains: int = 500,
    s: float = DEFAULT_S,
    seed: int = 0,
    n_partitions: int = 16,
) -> DataFrame:
    """(doc_id long, url string, domain string, text string) with
    Zipf(s)-distributed domains.  At rank 1 and s=1.1 over 500
    domains the head domain owns ~15% of all docs — a realistic
    hot-host regime."""
    import numpy as np
    import pyarrow as pa

    w = 1.0 / np.power(np.arange(1, n_domains + 1, dtype=np.float64), s)
    cum = np.cumsum(w / w.sum())
    cum[-1] = 1.0  # guard fp round-down at the tail

    base = spark.range(0, n_docs, 1, n_partitions)

    def build(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.uint64)
            seed_off = np.uint64((seed * 0x5851F42D4C957F2D) % (1 << 64))
            with np.errstate(over="ignore"):  # uint64 wraparound is the point
                u = (
                    _splitmix64(ids + seed_off) >> np.uint64(11)
                ).astype(np.float64) / float(1 << 53)
            rank = np.searchsorted(cum, u, side="left") + 1
            # per-doc unique body tokens + domain boilerplate tail
            texts, urls, doms = [], [], []
            for i, r in zip(ids.tolist(), rank.tolist()):
                body = " ".join(
                    f"t{(i * 2654435761 + j * 40503) % 999983}"
                    for j in range(UNIQUE_TOKENS)
                )
                boiler = " ".join(
                    f"b{r}x{j}" for j in range(BOILER_TOKENS)
                )
                texts.append(body + " " + boiler)
                doms.append(f"d{r}.example.com")
                urls.append(f"https://d{r}.example.com/p/{i}")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.astype(np.int64), type=pa.int64()),
                    pa.array(urls, type=pa.string()),
                    pa.array(doms, type=pa.string()),
                    pa.array(texts, type=pa.string()),
                ],
                names=["doc_id", "url", "domain", "text"],
            )

    return base.mapInArrow(
        build, "doc_id long, url string, domain string, text string"
    )
