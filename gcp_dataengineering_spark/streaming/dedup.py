"""Streaming exact dedup — the ingest-time half of the dedup family
(beyond-reference; batch forms live in llm_ops/dedup.py).

At 100 TB/day ingest you cannot re-scan the corpus per batch; the
streaming form keeps a state-store entry per key and drops
re-arrivals. `dropDuplicatesWithinWatermark` bounds that state by
the event-time watermark: a duplicate arriving within the watermark
window is dropped, and state older than the watermark is evicted —
state is O(keys per window), not O(all keys ever). The key should be
the content fingerprint (llm_ops.text.fingerprint), not the raw
text, so the state store holds 32-byte hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    event_time_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop rows whose `key_cols` were already seen within the
    watermark window. Emits the FIRST arrival of each key; state is
    evicted once the watermark passes it."""
    return stream.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_stream_against_corpus(
    stream: DataFrame,
    corpus_fps: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming half of the incremental-ingest contract
    (cf. llm_ops.dedup.dedup_exact_incremental): drop arriving
    documents whose content fingerprint already exists in a STATIC
    corpus fingerprint table, then drop intra-stream re-arrivals.

    ``corpus_fps`` is a plain batch DataFrame with a column ``fp``
    (e.g. ``spark.read.parquet(fp_table)``) — Structured Streaming
    executes the stream-static LEFT ANTI join per micro-batch
    without any stream-side state for the corpus part: the corpus
    side is a static relation (re-read per batch when backed by
    files), never re-paired against itself, and only 32-byte
    fingerprints flow through the join. Intra-stream duplicates use
    the state store exactly like :func:`dedup_stream` — keyed on the
    fingerprint, watermark-bounded when ``event_time_col`` is given,
    unbounded (exact, state grows with distinct keys) otherwise.

    Adds the ``fp`` column to the output so a sink can append the
    survivors' fingerprints to the corpus fp table, closing the loop
    for the next ingest window."""
    from pyspark.sql import functions as F

    from ..llm_ops.text import fingerprint

    with_fp = stream.withColumn("fp", fingerprint(text_col))
    novel = with_fp.join(
        corpus_fps.select(F.col("fp")).distinct(), "fp", "left_anti"
    )
    if event_time_col is not None:
        return novel.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
            ["fp"]
        )
    return novel.dropDuplicates(["fp"])


# ---------------------------------------------------------- fuzzy (MinHash) gate
_FUZZY_META = "meta.json"


def _fuzzy_read_meta(store_dir: str) -> dict:
    import json
    import os

    p = os.path.join(store_dir, _FUZZY_META)
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return {}


def _fuzzy_write_meta(store_dir: str, meta: dict) -> None:
    """Atomic manifest publish (the semantic store's discipline):
    write-aside + fsync + os.replace, so a torn write leaves the
    previous generation readable."""
    import json
    import os

    tmp = os.path.join(store_dir, _FUZZY_META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(store_dir, _FUZZY_META))


def _fuzzy_gc_orphans(store_dir: str, meta: dict) -> None:
    """Remove segment dirs a crashed earlier batch wrote but never
    published (they are invisible to readers; names are uuid-suffixed
    so they can never collide with a future segment)."""
    import os
    import shutil

    live = {s["dir"] for s in meta.get("segments", [])}
    for name in os.listdir(store_dir):
        sub = os.path.join(store_dir, name)
        if os.path.isdir(sub) and name.startswith("seg-") and name not in live:
            shutil.rmtree(sub, ignore_errors=True)


def fuzzy_dedup_batch(
    batch: DataFrame,
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    min_shared_bands: int = 1,
    sink=None,
    auto_compact_segments: int | None = None,
) -> DataFrame:
    """One micro-batch through the ONLINE MinHash near-dup gate —
    the fuzzy sibling of the exact corpus gate above and of the
    semantic store (streaming/semantic.py), completing the streaming
    dedup matrix (exact / fuzzy / semantic). Batch semantics are
    EXACTLY :func:`llm_ops.dedup.ingest_batch` against the store's
    accumulated fingerprint + band tables (pytest pins a multi-batch
    stream equal to the sequential ingest_batch twin): exact-dup
    drop first, then near-dup candidates of the existing corpus or
    of an earlier-id surviving batch doc (corpus wins, min-id within
    the batch), connected components over the batch-only pair graph.

    Store shape: append-only immutable segments (one per admitting
    batch: ``fps`` + ``bands`` parquet) under an atomically-published
    JSON manifest — O(batch) write amplification; a crash before
    publish leaves the previous generation live and an orphan dir
    the next batch GCs. The LSH params are pinned in the manifest:
    reusing a store under a different hash family would make the
    band index silently meaningless, so a mismatch raises.

    At-least-once replay is idempotent on STATE: a replayed batch's
    docs are already in the fp table, so the exact anti-join drops
    them and no second segment is written; ``sink`` output is
    at-least-once (the caller's reader dedups by ``fp``/id, the
    module-wide ledger rule).

    Scale shape: the corpus contributes only 32-byte fingerprints
    and (doc_id, band) keys — never text — each read by exactly one
    equi-join; per-batch cost is O(batch) + the batch-sized CC loop,
    independent of corpus size beyond those index scans.

    ``auto_compact_segments=K`` (the semantic store's policy shape):
    persisted in the store meta — set once, applies to every future
    writer; 0 clears. After a publish leaves more than K live
    segments, the history folds physically into one
    (:func:`compact_fuzzy_store`) in the same turn; retired dirs
    keep one-merge reader grace (swept by the NEXT batch's orphan
    GC). Admission semantics are byte-unchanged — the fold writes
    the reader's exact union view.

    Returns the admitted (appendable) rows as a batch DataFrame.
    """
    import os

    from ..llm_ops.dedup import ingest_batch, minhash_band_rows
    from ..llm_ops.text import fingerprint

    os.makedirs(store_dir, exist_ok=True)
    meta = _fuzzy_read_meta(store_dir)
    params = {"num_hashes": num_hashes, "bands": bands, "n": n}
    if meta.get("params") not in (None, params):
        raise ValueError(
            f"store {store_dir} was built with {meta['params']}, "
            f"called with {params} — a band index under a different "
            "hash family is meaningless; use a fresh store_dir"
        )
    _fuzzy_gc_orphans(store_dir, meta)

    spark = batch.sparkSession
    segs = meta.get("segments", [])
    if segs:
        corpus_fps = spark.read.parquet(
            *[os.path.join(store_dir, s["dir"], "fps") for s in segs]
        )
        corpus_bands = spark.read.parquet(
            *[os.path.join(store_dir, s["dir"], "bands") for s in segs]
        )
    else:
        corpus_fps = batch.limit(0).select(fingerprint(text_col).alias("fp"))
        corpus_bands = minhash_band_rows(
            batch.limit(0), text_col, id_col, num_hashes, bands, n
        )

    appendable, new_fps, new_bands = ingest_batch(
        batch,
        corpus_fps,
        corpus_bands,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        n=n,
        min_shared_bands=min_shared_bands,
        # default strategy (localCheckpoint unless globally overridden):
        # ingest_batch eagerly pins `appendable`, so everything below —
        # sink, segment write, counts — reads the PINNED result, not a
        # lineage that would re-read the store after this batch's
        # segment publish changes it
        materialize=None,
    )

    if sink is not None:
        sink(appendable)

    # the compaction policy persists in the meta (set once, applies
    # to every future writer; 0 clears — the semantic store's shape)
    if auto_compact_segments is not None:
        if auto_compact_segments > 0:
            meta["auto_compact_segments"] = int(auto_compact_segments)
        else:
            meta.pop("auto_compact_segments", None)
    policy = meta.get("auto_compact_segments")

    if appendable.limit(1).count() > 0:
        import uuid

        name = f"seg-{int(meta.get('generation', 0)) + 1:06d}-{uuid.uuid4().hex[:8]}"
        seg_dir = os.path.join(store_dir, name)
        new_fps.write.mode("errorifexists").parquet(os.path.join(seg_dir, "fps"))
        new_bands.write.mode("errorifexists").parquet(os.path.join(seg_dir, "bands"))
        n_rows = appendable.count()
        meta = dict(
            meta,
            generation=int(meta.get("generation", 0)) + 1,
            params=params,
            segments=segs + [{"dir": name, "rows": int(n_rows)}],
        )
        _fuzzy_write_meta(store_dir, meta)
        if policy and len(meta["segments"]) > policy:
            # same-turn physical fold; retired dirs keep one-merge
            # reader grace (the NEXT batch's orphan GC sweeps them)
            compact_fuzzy_store(spark, store_dir)
    elif meta.get("params") is None or auto_compact_segments is not None:
        _fuzzy_write_meta(
            store_dir,
            dict(meta, generation=int(meta.get("generation", 0)),
                 params=params, segments=segs),
        )
    return appendable


def fuzzy_dedup_stream(
    stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    pre_gate=None,
    **kwargs,
):
    """Wire a document stream through the online MinHash near-dup
    gate: admitted rows append to ``out_dir`` (parquet), state lives
    in ``store_dir``. Returns the started StreamingQuery (caller
    stops it). Keyword args are :func:`fuzzy_dedup_batch`'s.
    ``pre_gate`` mirrors the semantic stream's hook: a batch→batch
    callable applied before admission (e.g. the perplexity gate)."""

    def _process(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        if pre_gate is not None:
            batch = pre_gate(batch)
            if batch.isEmpty():
                return
        fuzzy_dedup_batch(
            batch,
            store_dir,
            sink=lambda admitted: admitted.write.mode("append").parquet(out_dir),
            **kwargs,
        )

    writer = stream.writeStream.foreachBatch(_process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def compact_fuzzy_store(spark, store_dir: str) -> None:
    """Physically fold the fuzzy store's segment history into ONE
    segment — admission semantics byte-unchanged (the reader's view
    is the union of segments, and the fold writes exactly that
    union; fp and (doc_id, band) rows are unique across segments by
    construction since each doc is admitted once, with a defensive
    distinct against at-least-once artifacts). The retired segment
    dirs stay on disk until the next batch's orphan GC — one-merge
    reader grace, the semantic store's discipline."""
    import os
    import uuid

    meta = _fuzzy_read_meta(store_dir)
    segs = meta.get("segments", [])
    if len(segs) <= 1:
        return
    fps = spark.read.parquet(
        *[os.path.join(store_dir, s["dir"], "fps") for s in segs]
    ).distinct()
    bands = spark.read.parquet(
        *[os.path.join(store_dir, s["dir"], "bands") for s in segs]
    ).distinct()
    name = f"seg-{int(meta.get('generation', 0)) + 1:06d}-{uuid.uuid4().hex[:8]}"
    seg_dir = os.path.join(store_dir, name)
    fps.write.mode("errorifexists").parquet(os.path.join(seg_dir, "fps"))
    bands.write.mode("errorifexists").parquet(os.path.join(seg_dir, "bands"))
    meta = dict(meta)
    meta["generation"] = int(meta.get("generation", 0)) + 1
    meta["segments"] = [
        {"dir": name, "rows": int(sum(s.get("rows", 0) for s in segs))}
    ]
    _fuzzy_write_meta(store_dir, meta)
