"""Similarity search over an embedding column (array<float>).

* **brute-force top-k** — the correctness baseline: Q query vectors ×
  N corpus vectors, dot products via ``zip_with``/``aggregate`` (pure
  JVM), ranked per query.  O(Q·N·d) — fine for small Q even at large
  N because the corpus side stays partitioned (the query side is
  broadcast), but the scale path is the LSH variant.
* **random-hyperplane LSH** — P deterministic hyperplanes → P sign
  bits → bucket id.  Candidates = same bucket (expected N/2^P per
  bucket); top-k within candidates.  The bucketing is a narrow map;
  the candidate join shuffles only (query, bucket) pairs.  An IVF
  variant would replace the planes with k-means centroids; the plan
  shape (assign → co-partition → local rank) is identical.

Hyperplane weights are small deterministic integers (same formula in
the DuckDB oracle): w(p, i) = ((i*31 + p*17) % 7) - 3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_QUERIES = 8       # vec_id < N_QUERIES are the query set
TOP_K = 5
N_PLANES = 6
DIM = 64


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # float32 -> float64 once, so all arithmetic is double (matches oracle)
    return df.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )


def brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id, score): exact cosine top-k per query."""
    emb = load_embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    scored = F.broadcast(q).crossJoin(emb).filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("q_emb"), F.col("emb")), 4).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def lsh_bucket(emb: Column) -> Column:
    """Random-hyperplane bucket id: bit p = sign(w_p · emb)."""
    def mk_plane(p):
        # NB: a 2-arg lambda in F.transform means (element, index) —
        # closure factory keeps this a 1-arg lambda
        return lambda i: (((i * 31 + p * 17) % 7) - 3).cast("double")

    bits = []
    for p in range(N_PLANES):
        w = F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)), mk_plane(p))
        proj = F.aggregate(
            F.zip_with(w, emb, lambda wi, xi: wi * xi),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit(2 ** p)).otherwise(F.lit(0)))
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total.cast("int")


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_embeddings(spark, sf_dir)
    return emb.select("vec_id", lsh_bucket(F.col("emb")).alias("bucket"))


def lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket."""
    emb = load_embeddings(spark, sf_dir).withColumn("bucket", lsh_bucket(F.col("emb")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("bucket").alias("qb"),
    )
    cands = F.broadcast(q).join(
        emb, (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("query_id"))
    )
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("q_emb"), F.col("emb")), 4).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# --------------------------------------------------------------------------
# DuckDB oracles (identical arithmetic: sequential double dot products)
# --------------------------------------------------------------------------

_DOT_SQL = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, {d} + 1), "
    "i -> a.emb[i] * b.emb[i])), (x, y) -> x + y)"
).format(d=DIM)

_EMB_CTE = """
emb AS (
    SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
    FROM embeddings
)
"""


def oracle_brute_force_sql() -> str:
    return f"""
WITH {_EMB_CTE.strip()},
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROUND({_DOT_SQL} /
                 (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, {DIM}+1), i -> a.emb[i]*a.emb[i])), (x,y)->x+y)) *
                  sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, {DIM}+1), i -> b.emb[i]*b.emb[i])), (x,y)->x+y))), 4) AS score
    FROM emb a JOIN emb b ON a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, score,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, score, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(1, {DIM}+1), "
    f"i -> ((((i-1)*31 + {p}*17) % 7) - 3)::DOUBLE * emb[i])), (x,y)->x+y) > 0 "
    f"THEN {2 ** p} ELSE 0 END)"
    for p in range(N_PLANES)
)


def oracle_lsh_buckets_sql() -> str:
    return f"""
WITH {_EMB_CTE.strip()}
SELECT vec_id, CAST({_BUCKET_SQL} AS INTEGER) AS bucket FROM emb
"""


def oracle_lsh_topk_sql() -> str:
    return f"""
WITH {_EMB_CTE.strip()},
bucketed AS (SELECT vec_id, emb, CAST({_BUCKET_SQL} AS INTEGER) AS bucket FROM emb),
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROUND({_DOT_SQL} /
                 (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, {DIM}+1), i -> a.emb[i]*a.emb[i])), (x,y)->x+y)) *
                  sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, {DIM}+1), i -> b.emb[i]*b.emb[i])), (x,y)->x+y))), 4) AS score
    FROM bucketed a JOIN bucketed b
      ON a.vec_id < {N_QUERIES} AND b.bucket = a.bucket AND b.vec_id <> a.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, score,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, score, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""
