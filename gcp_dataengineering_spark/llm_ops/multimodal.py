"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs
over mapInPandas.

The decode step itself is STUBBED (image/audio libraries are not in
this container): `decode_image_meta` raises NotImplementedError
unless `fake=True`, in which case a deterministic fake decoder runs
so the Spark-side plumbing — schema, partitioning, UDF signature,
Arrow batch shape — is real and tested end-to-end.

Scale design: binaries never pass through Python row-at-a-time;
mapInPandas streams Arrow batches, and `batch_rows` bounds batch
memory (binary payloads can be MBs each — at 100 TB the per-batch
byte budget, not row count, is the real knob; pair with
spark.sql.files.maxPartitionBytes on the scan side).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "width int, height int, sample_rate int"
)

META_SCHEMA = "media_id long, media_type string, n_bytes long, header_byte int, checksum string"


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media-shaped DataFrame from any table by treating a
    string column as an opaque binary payload (fixture synthesis —
    real pipelines read binary parquet/tar shards directly)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake decoder: byte stats standing in for a real
    image decode. Replace with PIL/libvips in a real deployment."""
    import hashlib

    return {
        "n_bytes": len(payload),
        "header_byte": payload[0] if payload else None,
        "checksum": hashlib.md5(payload).hexdigest(),
    }


def decode_media_meta(df: DataFrame, fake: bool = False, batch_rows: int = 1024) -> DataFrame:
    """Decode/feature-extract pass over binary payloads via
    mapInPandas (Arrow batches; Python touches bytes only batch-wise).

    With fake=False this raises NotImplementedError at execution
    time — the decode libraries are not available in this container;
    the plumbing (schema, batching, partition preservation) is the
    tested surface.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                if not fake:
                    raise NotImplementedError(
                        "real media decode requires PIL/torchaudio/ffmpeg — "
                        "not present in this environment; pass fake=True"
                    )
                metas = [_fake_decode(p if p is not None else b"") for p in chunk["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "media_type": chunk["media_type"].values,
                        "n_bytes": [m["n_bytes"] for m in metas],
                        "header_byte": [m["header_byte"] for m in metas],
                        "checksum": [m["checksum"] for m in metas],
                    }
                )

    return df.mapInPandas(decode_batches, schema=META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: expands each media row into frame
    descriptors (frame_idx) without decoding — the decode of selected
    frames happens in decode_media_meta downstream. Demonstrates the
    explode-then-decode shape that keeps the expensive UDF on the
    sampled subset only."""
    n_frames = (F.length(F.col("payload")) / F.lit(every_n)).cast("int")
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_idx"),
    ).withColumn("byte_offset", F.col("frame_idx") * every_n)
