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

from .materialize import MaterializeFn
from .materialize import materialize as _materialize

# Fixed-point scale for the deterministic k-means: 1e-6 resolution.
# Quantized components are BIGINTs, so every cross-engine sum is
# exact integer math — no float reduction-order drift between Spark
# and the DuckDB oracle.
KMEANS_SCALE = 1_000_000


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


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k via an Arrow-batched Pandas UDF matmul — the
    high-dims × many-queries path where a numpy GEMM beats per-row
    expression evaluation. Semantics identical to
    cosine_topk_bruteforce (same oracle).

    Shape: the query matrix is tiny and rides into the closure
    (broadcast by Spark's task serialization); each Arrow batch of
    corpus vectors does one (batch × dim)·(dim × q) GEMM and emits
    its batch-local top-k per query; a final window rank reduces
    batch-local candidates to the global top-k. Shuffle volume is
    O(batches × q × k), never O(corpus)."""
    import numpy as np
    import pandas as pd

    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).collect()  # query set only — small by contract
    q_ids = np.array([r["query_id"] for r in q_rows])
    q_mat = np.array([r["q_vec"] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score_batches(batches):
        for pdf in batches:
            c_mat = np.array(list(pdf["c_vec"]), dtype=np.float64)
            c_ids = pdf["neighbor_id"].values
            c_n = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = c_n @ q_norm.T  # (batch, q)
            out = []
            top = min(k + 1, sims.shape[0])
            for qi in range(sims.shape[1]):
                idx = np.argpartition(-sims[:, qi], top - 1)[:top]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[qi],
                            "neighbor_id": c_ids[idx],
                            "cos": sims[idx, qi],
                        }
                    )
                )
            yield pd.concat(out)

    cands = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).mapInPandas(score_batches, schema="query_id long, neighbor_id long, cos double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos"))
    )


def quantize_fixed(vec: Column, scale: int = KMEANS_SCALE) -> Column:
    """array<float> → array<bigint> at 1/scale resolution via
    floor(x*scale + 0.5) — engine-portable (no rounding-convention
    ambiguity: floor is floor everywhere)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * float(scale) + F.lit(0.5)).cast("bigint")
    )


def ivf_index(
    corpus: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_iter: int = 3,
    materialize: str | MaterializeFn | bool | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: fixed-iteration Lloyd's k-means as pure
    DataFrame ops, producing (assignments, centroids) —
    ``assignments`` is (vec_id, cluster), ``centroids`` is
    (cluster, centroid array<double>).

    Fully deterministic AND engine-portable, so the DuckDB oracle
    replays the *build*, not just the search (round-2 verdict item):
    - vectors quantized to 1/KMEANS_SCALE fixed-point BIGINTs
      (:func:`quantize_fixed`) — every distance/mean sum is exact
      integer math, immune to float reduction-order differences;
    - init: cluster = seeded md5-hash bucket of the id (no sampling,
      no RNG — ``md5_60bit('ivf<seed>' ␟ id) % k``);
    - per-dimension cluster mean re-quantized via
      ``floor(sum/cnt + 0.5)`` (deterministic IEEE ops both engines);
    - reassignment: argmin of exact integer squared-L2, ties to the
      lowest cluster id (min over (dist, cluster) structs —
      HashAggregate with map-side partial min, no window sort).

    Scale shape per iteration: the mean step is posexplode →
    groupBy(cluster, dim) with map-side combine (shuffle is k×d
    partials, never N×d); the assign step is a k-row broadcast cross
    join scored by a codegen'd zip_with fold. At 100 TB the index is
    built once, persisted with the table (ideally as the bucketing
    key), and reused by every query batch; intermediates materialize
    per the ``materialize`` strategy (llm_ops.materialize)."""
    from .corpus import hash_bucket

    vq_df = corpus.select(
        F.col(id_col).alias("vec_id"), quantize_fixed(F.col(vec_col)).alias("vq")
    )
    # consumed by every iteration's mean AND assign stage
    vq_df = _materialize(vq_df, materialize)
    assign = vq_df.select(
        "vec_id",
        hash_bucket("vec_id", salt=f"ivf{seed}", buckets=n_clusters)
        .cast("int")
        .alias("cluster"),
    )
    centroids_q = None
    for _ in range(n_iter):
        exploded = assign.join(vq_df, "vec_id").select(
            "cluster", F.posexplode("vq").alias("j", "val")
        )
        cent_long = exploded.groupBy("cluster", "j").agg(
            F.floor(F.sum("val").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
            .cast("bigint")
            .alias("cq")
        )
        centroids_q = cent_long.groupBy("cluster").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "cq"))), lambda s: s["cq"]
            ).alias("cq_arr")
        )
        dist = F.aggregate(
            F.zip_with(F.col("vq"), F.col("cq_arr"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        assign = (
            vq_df.crossJoin(F.broadcast(centroids_q))
            .withColumn("dist", dist)
            .groupBy("vec_id")
            .agg(F.min(F.struct(F.col("dist"), F.col("cluster"))).alias("best"))
            .select("vec_id", F.col("best.cluster").alias("cluster"))
        )
        assign = _materialize(assign, materialize)
    centroids = centroids_q.select(
        "cluster",
        F.transform(
            F.col("cq_arr"), lambda x: x.cast("double") / float(KMEANS_SCALE)
        ).alias("centroid"),
    )
    return assign, centroids


def cosine_topk_ivf_from_index(
    corpus: DataFrame,
    queries: DataFrame,
    assignments: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search over a prebuilt index: each query scores the
    centroids (tiny broadcast), keeps its `nprobe` nearest posting
    lists, and scores only the vectors assigned to them — candidate
    selection is an equi-join on cluster id. Recall/latency trade via
    nprobe."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    wq = Window.partitionBy("query_id").orderBy(F.col("c_cos").desc(), F.col("cluster").asc())
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("c_cos", cosine(F.col("q_vec"), F.col("centroid")))
        .withColumn("c_rank", F.row_number().over(wq))
        .filter(F.col("c_rank") <= nprobe)
        .select("query_id", "q_vec", "cluster")
    )
    assigned = assignments.select(F.col("vec_id").alias("neighbor_id"), "cluster").join(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "neighbor_id",
    )
    scored = (
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos"))
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: index build + search in one call (see
    ivf_index / cosine_topk_ivf_from_index)."""
    assigned, centroids = ivf_index(corpus, n_clusters, id_col, vec_col, seed)
    return cosine_topk_ivf_from_index(
        corpus, queries, assigned, centroids, k, nprobe, id_col, vec_col
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
