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

Two snapshot layouts:

- ``upsert_batch_into_snapshot`` — flat directory, full rewrite per
  batch. O(snapshot) per micro-batch: correct and simple, fine for
  dimension-sized state, wrong for fact-scale state.
- ``upsert_batch_into_bucketed_snapshot`` — the snapshot is laid out
  as key-hash bucket partitions (``_ub=<i>`` directories) and each
  micro-batch rewrites ONLY the buckets its keys land in. Cost per
  batch drops from O(snapshot) to O(snapshot / n_buckets ×
  touched_buckets): a batch touching few keys leaves every other
  bucket's files byte-identical on disk. This is the step toward a
  log-structured merge without adopting a table format — on
  Delta/Iceberg the foreachBatch body becomes MERGE INTO and the
  bucket dance disappears.

Either way the batch collapse (`latest_by_key_agg` before the
merge) keeps each micro-batch's contribution minimal.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    if _read_meta(snapshot_dir.rstrip("/")) is not None:
        # a bucketed snapshot's _ub=<i> layout would be silently
        # flattened by this sink (and the mixed layout would poison
        # later bucketed merges) — refuse instead
        raise ValueError(
            f"{snapshot_dir} is a BUCKETED snapshot (_upsert_meta.json "
            "present): use upsert_batch_into_bucketed_snapshot / "
            "upsert_stream(n_buckets=...) with the pinned n_buckets"
        )
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


BUCKET_COL = "_ub"  # reserved partition column of bucketed snapshots
_META_FILE = "_upsert_meta.json"  # leading '_' → invisible to Spark readers


def _bucket_expr(keys: list[str], n_buckets: int):
    """Deterministic key-hash bucket id — a pure function of the key
    columns, so the same key always lands in the same directory."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast(
        "int"
    )


def _read_meta(snapshot_dir: str) -> dict | None:
    p = os.path.join(snapshot_dir, _META_FILE)
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return None


def _recover_buckets(snapshot_dir: str) -> None:
    """Crash hygiene for the per-bucket two-rename swap, same contract
    as the flat sink's recovery: leftover tmp = unfinished rewrite
    (garbage); a bucket dir present under old but missing in the
    snapshot = crashed between its two renames, the old dir IS the
    state; old alongside a live bucket just missed final cleanup."""
    tmp = snapshot_dir.rstrip("/") + "._upsert_tmp"
    old_root = snapshot_dir.rstrip("/") + "._upsert_old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(old_root):
        for name in os.listdir(old_root):
            live = os.path.join(snapshot_dir, name)
            stale = os.path.join(old_root, name)
            if os.path.exists(live):
                shutil.rmtree(stale)
            else:
                os.rename(stale, live)
        shutil.rmtree(old_root)


def upsert_batch_into_bucketed_snapshot(
    batch: DataFrame,
    snapshot_dir: str,
    keys: list[str],
    version_cols: list[str],
    n_buckets: int = 32,
) -> None:
    """One merge that rewrites only the key-hash buckets the batch
    touches. The snapshot lives as ``snapshot_dir/_ub=<i>/`` parquet
    partitions; the current state for the merge is read with a
    partition filter on the touched bucket ids (directory pruning —
    untouched buckets are never opened, let alone rewritten), and the
    swap renames only the touched bucket directories. n_buckets is
    pinned in ``_upsert_meta.json`` at first write; later calls must
    agree or the key→bucket mapping would split keys across buckets.

    Isolation honesty: the flat sink's single directory rename was
    atomic for concurrent readers; the bucketed swap renames bucket
    directories one at a time, so a reader overlapping a merge can
    observe some buckets new and some old (each bucket individually
    consistent; cross-bucket skew bounded by one batch). Writers are
    safe at any torn point (recovery restores), but readers needing
    a cross-bucket-consistent view should read between merges or
    adopt a table format's transaction log — the caveat every
    multi-file-swap scheme carries.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets ({n_buckets}) must be >= 1")
    spark = batch.sparkSession
    snapshot_dir = snapshot_dir.rstrip("/")
    meta = _read_meta(snapshot_dir)
    if meta is not None:
        if meta["n_buckets"] != n_buckets:
            raise ValueError(
                f"snapshot was bucketed with n_buckets={meta['n_buckets']}, "
                f"got {n_buckets}: the key->bucket mapping would break"
            )
        if meta["keys"] != keys:
            raise ValueError(
                f"snapshot was bucketed on keys={meta['keys']}, got {keys}"
            )
    if meta is None and os.path.isdir(snapshot_dir) and any(
        not name.startswith((BUCKET_COL + "=", "_", "."))
        for name in os.listdir(snapshot_dir)
    ):
        # a FLAT snapshot (plain part files, no meta): bucketing on
        # top would produce a mixed layout that reads wrong — refuse
        raise ValueError(
            f"{snapshot_dir} holds a flat (non-bucketed) snapshot: "
            "use upsert_batch_into_snapshot, or start the bucketed "
            "layout in a fresh directory"
        )
    _recover_buckets(snapshot_dir)
    tmp = snapshot_dir + "._upsert_tmp"
    old_root = snapshot_dir + "._upsert_old"

    # persisted: the touched-bucket collect below and the final write
    # would otherwise each re-execute the batch aggregation
    merged = (
        latest_by_key_agg(batch, keys, version_cols)
        .withColumn(BUCKET_COL, _bucket_expr(keys, n_buckets))
        .persist()
    )
    try:
        # touched bucket ids: bounded by n_buckets, a scalar collect
        touched = sorted(
            r[0] for r in merged.select(BUCKET_COL).distinct().collect()
        )
        if not touched:
            return
        _merge_touched_buckets(
            spark, merged, snapshot_dir, tmp, old_root, keys, version_cols,
            n_buckets, touched, meta,
        )
    finally:
        merged.unpersist()


def _merge_touched_buckets(
    spark, merged, snapshot_dir, tmp, old_root, keys, version_cols,
    n_buckets, touched, meta,
) -> None:
    # pin the layout contract BEFORE any data lands: a crash after the
    # first swap but before a late meta write would let a future call
    # silently treat existing buckets as a fresh snapshot
    os.makedirs(snapshot_dir, exist_ok=True)
    if meta is None:
        with open(os.path.join(snapshot_dir, _META_FILE), "w") as fh:
            json.dump({"n_buckets": n_buckets, "keys": keys}, fh)
    has_state = any(
        name.startswith(BUCKET_COL + "=") for name in os.listdir(snapshot_dir)
    )
    if has_state:
        current = (
            spark.read.parquet(snapshot_dir)
            # partition filter → only the touched _ub=<i> directories
            # are listed/scanned (receipt: PartitionFilters in explain)
            .filter(F.col(BUCKET_COL).isin([int(b) for b in touched]))
            .select(*merged.columns)
        )
        merged = latest_by_key_agg(
            current.unionByName(merged).drop(BUCKET_COL), keys, version_cols
        ).withColumn(BUCKET_COL, _bucket_expr(keys, n_buckets))
    merged.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(tmp)
    os.makedirs(old_root, exist_ok=True)
    for b in touched:
        name = f"{BUCKET_COL}={b}"
        live = os.path.join(snapshot_dir, name)
        if os.path.exists(live):
            os.rename(live, os.path.join(old_root, name))
        os.rename(os.path.join(tmp, name), live)
    shutil.rmtree(old_root)
    shutil.rmtree(tmp)


def read_bucketed_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """The current state of a bucketed snapshot, bucket column
    dropped (it is an implementation detail of the layout)."""
    return spark.read.parquet(snapshot_dir).drop(BUCKET_COL)


def upsert_stream(
    stream: DataFrame,
    snapshot_dir: str,
    keys: list[str],
    version_cols: list[str],
    checkpoint_dir: str | None = None,
    n_buckets: int | None = None,
):
    """Wire a change stream into the upsert sink. Returns the started
    StreamingQuery (caller stops it). Restart-safe up to foreachBatch's
    at-least-once contract: replaying a batch re-merges the same rows,
    and latest-version-wins merging is idempotent. With ``n_buckets``
    set, the snapshot is the bucketed layout and each micro-batch
    rewrites only the buckets it touches."""
    if n_buckets is not None:
        def _merge(batch, _epoch):
            upsert_batch_into_bucketed_snapshot(
                batch, snapshot_dir, keys, version_cols, n_buckets
            )
    else:
        def _merge(batch, _epoch):
            upsert_batch_into_snapshot(batch, snapshot_dir, keys, version_cols)
    writer = stream.writeStream.foreachBatch(_merge).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
