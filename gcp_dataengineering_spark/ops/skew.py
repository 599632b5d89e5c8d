"""Skew-handling utilities for 100 TB scale.

The reference never needed these (its partitions are (brand, year,
month) over one brand), but any real deployment of the allocation
pattern hits skew: one hot (year, month) or one hot join key.
Two standard remedies, both pure DataFrame ops:

- **salted two-phase aggregation**: append a random salt to the hot
  key, partial-agg on (key, salt), then final-agg on key. Turns one
  hot reducer into `salt_buckets` parallel ones; cost is one extra
  (tiny) shuffle of the partial results.
- **salted broadcast-side join**: explode the small side over all
  salt values and salt the big side randomly — the classic skew-join
  rewrite for when the small side is broadcastable but the big
  side's key distribution is pathological AND AQE's runtime skew
  split isn't available (e.g. non-AQE deployments; with AQE on,
  prefer spark.sql.adaptive.skewJoin).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salted_sum(
    df: DataFrame,
    group_by: Sequence[str],
    agg_cols: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: sum() per (keys, salt) then per
    keys. Equivalent to a plain groupBy-sum (sums are associative);
    verified by test_salted_sum_equals_plain.

    When to use — narrower than it looks (round-8 receipt,
    BENCH_ATTRIBUTION.md): for ALGEBRAIC aggregates (sum/count/min/
    max/avg) and for distinct counts, Spark's built-in partial
    aggregation already combines map-side and a hot key never
    concentrates work on one reducer — the measured salted form is
    strictly SLOWER (0.51 s plain vs 1.81 s salted on an 80%-hot
    fixture). Reach for salting only when per-key holistic state
    (collect_list-scale) genuinely must be split across reducers."""
    salted = df.withColumn(SALT, (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*group_by, SALT).agg(
        *[F.sum(src).alias(out) for src, out in agg_cols.items()]
    )
    return partial.groupBy(*group_by).agg(
        *[F.sum(out).alias(out) for out in agg_cols.values()]
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Inner equi-join where `big` has skewed keys: salt the big side
    randomly, replicate the small side across every salt value, join
    on (key, salt). Result equals big ⋈ small on key."""
    salted_big = big.withColumn(SALT, (F.rand(seed=42) * salt_buckets).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias(SALT)
    replicated = small.select("*", salts)
    return salted_big.join(F.broadcast(replicated), [key, SALT], "inner").drop(SALT)


def salted_shuffle_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Inner equi-join for the case the broadcast variant cannot
    cover: the small side is NOT broadcastable (too big / driver
    memory-capped) and the big side's key distribution is
    pathological. Salt the big side randomly, replicate the small
    side across every salt value (its shuffle grows ×salt_buckets —
    the price), and shuffle-join on (key, salt): the hot key's rows
    land on ``salt_buckets`` reducers instead of one. Result equals
    big ⋈ small on key (verified by test_salted_joins_equal_plain).
    With AQE available, prefer spark.sql.adaptive.skewJoin — see the
    round-8 receipt in BENCH_ATTRIBUTION.md for when each wins."""
    salted_big = big.withColumn(SALT, (F.rand(seed=42) * salt_buckets).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias(SALT)
    replicated = small.select("*", salts)
    return salted_big.join(replicated, [key, SALT], "inner").drop(SALT)


def skew_report(
    df: DataFrame, keys: list[str], top_n: int = 20
) -> DataFrame:
    """Partition-key skew diagnosis: the ``top_n`` heaviest key
    groups with row counts and their share of the table in ppm
    (integer — no float agg drift). Run it BEFORE choosing a join/agg
    strategy: a top key holding >5-10% of a 100 TB table is the
    signal to reach for salted_sum / salted_broadcast_join or AQE
    skew handling.

    One map-side-combined aggregation; the global top-n is
    TakeOrderedAndProject (each partition ships only its local n).
    The total rides along via a 1-row broadcast, not a second
    scan."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share_ppm", F.expr("n_rows * 1000000 div _total"))
        .drop("_total")
        .orderBy(F.col("n_rows").desc(), *[F.col(k).asc() for k in keys])
        .limit(top_n)
    )
