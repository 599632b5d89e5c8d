"""Latest-version-wins compaction: collapse an append-only change
stream (ingest batches, CDC feed, versioned history) to one current
row per key — the maintenance step every incremental pipeline runs
between "appended" and "queryable".

Two implementations with identical semantics, pytest-held equal:

- `latest_by_key_agg` (the default / scale path): one aggregation of
  ``max(struct(version_cols..., payload))``. Struct comparison in
  Spark is lexicographic over the fields in order, so putting the
  version columns first makes the max pick the highest-version row;
  the trailing payload rides along. Physically this lowers to a
  SortAggregate (a struct is not a mutable agg buffer, so no hash
  agg) — but the scale property is the partial_max BELOW the
  exchange: each task pre-collapses its rows, so the shuffle carries
  at most #distinct-keys rows per task. At 100 TB of events with hot
  keys, that is the difference between a bounded shuffle and
  shipping every row.
- `latest_by_key_window` (the readable form): row_number over
  (key / version desc) and keep rank 1. Same answer, but the window
  sorts every group and ships EVERY row through the exchange —
  kept for parity testing and for callers that also want the rank.

Determinism: callers must make the version ordering TOTAL (e.g.
``["ts", "event_id"]``, not just ``["ts"]``); ties under a partial
order would make both forms nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key_agg(
    df: DataFrame, keys: list[str], version_cols: list[str]
) -> DataFrame:
    """One current row per key via max(struct(version..., payload)).
    Output schema = input schema (column order preserved)."""
    payload = [c for c in df.columns if c not in keys]
    ordered = version_cols + [c for c in payload if c not in version_cols]
    best = df.groupBy(*keys).agg(
        F.max(F.struct(*[F.col(c) for c in ordered])).alias("_best")
    )
    return best.select(
        *keys, *[F.col(f"_best.{c}").alias(c) for c in payload]
    ).select(*df.columns)


def latest_by_key_window(
    df: DataFrame, keys: list[str], version_cols: list[str]
) -> DataFrame:
    """Same semantics via row_number over (keys / version desc)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in version_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
