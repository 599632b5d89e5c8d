"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: broadcast the query set, one pass over
  the corpus, per-query top-k via window rank. O(corpus × queries)
  FLOPs but embarrassingly parallel and shuffle-light (only the
  ranked candidates move) — the correct baseline at any scale.
- LSH-bucketed ANN: random-hyperplane sign buckets as the join key;
  only same-bucket pairs are scored. The 100 TB path: candidate
  generation becomes an equi-join, cost drops to O(sum of bucket
  sizes × queries-in-bucket). (An IVF variant would k-means the
  corpus; hyperplane-LSH needs no training pass, so it's the better
  first scale step.)

Dot products use zip_with + aggregate over JVM arrays — vectorized
enough at 64 dims; a Pandas-UDF matmul path only wins at high dims ×
large k, and would be the next optimization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ with elementwise double casts (float32 inputs)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast(queries) ⋈ corpus
    (no shuffle of the corpus), cosine, rank ≤ k.
    Returns (query_id, neighbor_id, rank, cos)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos"))
    )


def sign_bucket(vec: Column, dims: list[int]) -> Column:
    """Hyperplane-sign LSH bucket key: bit i = sign(vec[dims[i]]).
    Axis-aligned planes keep it deterministic and engine-portable;
    random gaussian planes are a drop-in upgrade (broadcast the
    plane matrix)."""
    key = F.lit(0)
    for d in dims:
        key = key * 2 + F.when(F.element_at(vec, d + 1) >= 0, 1).otherwise(0)
    return key


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: list[int] | None = None,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH
    bucket. Candidate generation is an equi-join on the bucket key —
    the shape that survives 100 TB (bucket count scales with 2^bits;
    skewed buckets split by AQE)."""
    dims = bucket_dims if bucket_dims is not None else [0, 8, 16, 24, 32, 40, 48, 56]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) pairs with
    cos ≥ threshold, optionally blocked on a cluster/label column so
    the pair space is per-block, not global (at scale the block key
    comes from LSH buckets or an ANN index)."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        *( [F.col(block_col)] if block_col else [] ),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        *( [F.col(block_col)] if block_col else [] ),
    )
    cond = F.col("id_a") < F.col("id_b")
    joined = a.join(b, ([block_col] if block_col else []) or None) if block_col else a.crossJoin(b)
    return (
        joined.filter(cond)
        .withColumn("cos", cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )
