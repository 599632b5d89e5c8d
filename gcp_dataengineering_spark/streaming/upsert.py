"""Streaming upsert sink: maintain a latest-version-wins snapshot
from a change stream — the online form of ops/compaction (which is
the batch form of the same contract).

Structured Streaming has no built-in mutable sink for plain parquet,
so the standard pattern is ``foreachBatch``: each micro-batch is a
small BATCH DataFrame, merged against the current snapshot with the
same deterministic `latest_by_key_agg` used offline, and the result
swapped in atomically (write aside + rename — the local-FS stand-in
for a table format's transactional commit; on Delta/Iceberg the
foreachBatch body becomes a MERGE INTO and the swap disappears).

Scale honesty: rewrite-per-batch is O(snapshot) per micro-batch —
correct and simple, fine for dimension-sized state (the
compact-current-view-of-keys use case this targets), wrong for
fact-scale state; that is precisely what log-structured table
formats exist for, and the batch collapse (`latest_by_key_agg`
before the merge) keeps each micro-batch's contribution minimal
either way.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from ..ops.compaction import latest_by_key_agg


def upsert_batch_into_snapshot(
    batch: DataFrame,
    snapshot_dir: str,
    keys: list[str],
    version_cols: list[str],
) -> None:
    """One merge: collapse the batch to its own latest per key, union
    with the existing snapshot (if any), keep the latest per key,
    atomically replace the snapshot."""
    spark = batch.sparkSession
    tmp = snapshot_dir.rstrip("/") + "._upsert_tmp"
    old = snapshot_dir.rstrip("/") + "._upsert_old"
    # crash recovery BEFORE reading state (same hygiene as
    # io.compact_small_files): a leftover tmp is an unfinished
    # rewrite (garbage); a leftover old with the snapshot missing
    # means we crashed between the two renames — the old dir IS the
    # current state, roll it back rather than merging against nothing
    # and then deleting it; old alongside a live snapshot just missed
    # its final cleanup.
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(old):
        if os.path.exists(snapshot_dir):
            shutil.rmtree(old)
        else:
            os.rename(old, snapshot_dir)
    merged = latest_by_key_agg(batch, keys, version_cols)
    if os.path.exists(snapshot_dir):
        current = spark.read.parquet(snapshot_dir).select(*merged.columns)
        merged = latest_by_key_agg(current.unionByName(merged), keys, version_cols)
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(snapshot_dir):
        os.rename(snapshot_dir, old)
    os.rename(tmp, snapshot_dir)
    if os.path.exists(old):
        shutil.rmtree(old)


def upsert_stream(
    stream: DataFrame,
    snapshot_dir: str,
    keys: list[str],
    version_cols: list[str],
    checkpoint_dir: str | None = None,
):
    """Wire a change stream into the upsert sink. Returns the started
    StreamingQuery (caller stops it). Restart-safe up to foreachBatch's
    at-least-once contract: replaying a batch re-merges the same rows,
    and latest-version-wins merging is idempotent."""
    writer = stream.writeStream.foreachBatch(
        lambda batch, _epoch: upsert_batch_into_snapshot(
            batch, snapshot_dir, keys, version_cols
        )
    ).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
