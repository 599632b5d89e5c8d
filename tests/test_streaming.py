"""Structured Streaming: the streaming hourly aggregation must match
the batch form (same logic, memory sink, synchronous drain)."""

from __future__ import annotations

import uuid

from gcp_dataengineering_spark.streaming.windowed import batch_hourly, stream_hourly

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark):
    name = f"ev_{uuid.uuid4().hex[:8]}"
    q = (
        stream_hourly(spark, SF_DIR)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()
    expect = batch_hourly(spark, SF_DIR).collect()
    key = lambda r: (r["hour_start"], r["event_type"])
    gs = sorted([(key(r), r["n"], round(r["total_value"], 4)) for r in got])
    es = sorted([(key(r), r["n"], round(r["total_value"], 4)) for r in expect])
    assert gs == es and len(gs) > 0
