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
