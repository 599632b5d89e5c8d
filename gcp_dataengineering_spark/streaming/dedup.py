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
