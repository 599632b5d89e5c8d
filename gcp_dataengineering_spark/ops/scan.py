"""Scale-adaptive scan fan-out (optimization guide §2.5, "input
skew": one huge unsplittable file → repartition immediately after
the read).

Parquet scans parallelize at ROW-GROUP granularity. The local
fixtures are single-file single-row-group tables, so every scan —
and with it the whole map side of every downstream stage (explodes,
regex scans, Arrow/Python decode UDFs, partial aggregations) — runs
as ONE task regardless of core count. A 100 TB table has thousands
of splits and never hits this; a dev box, a small extract, or a
badly compacted landing table does.

:func:`fan_out_scan` repartitions round-robin up to the session's
default parallelism ONLY when the scan's planned partition count is
below it — at production scale the condition is false and the call
is a literal no-op (no exchange added to the plan). Round-robin
repartition is deterministic under task retry because Spark sorts
partitions before assignment (``spark.sql.execution.sortBeforeRepartition``,
on by default — SPARK-23207).

Override the threshold with ``SPARK_GRAFT_SCAN_MIN_PARTITIONS``
(0 disables fan-out entirely).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def fan_out_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff its
    planned partitioning has fewer partitions — the few-unsplittable-
    files case. No-op (returns ``df`` unchanged, no exchange) when the
    scan already parallelizes."""
    if min_partitions is None:
        env = os.environ.get("SPARK_GRAFT_SCAN_MIN_PARTITIONS")
        if env is not None:
            min_partitions = int(env)
        else:
            min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if min_partitions <= 1:
        return df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        # planning failure here must not mask the query's own error
        return df
    if n >= min_partitions:
        return df
    return df.repartition(min_partitions)
