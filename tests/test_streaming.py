"""Structured Streaming: the streaming hourly aggregation must match
the batch form (same logic, memory sink, synchronous drain)."""

from __future__ import annotations

import uuid

from gcp_dataengineering_spark.streaming.windowed import batch_hourly, stream_hourly

SF_DIR = "/root/testdata/sf0.001"


def test_sessionize_stream_matches_batch_closed_sessions(spark):
    """The applyInPandasWithState sessionizer, driven by one parquet
    micro-batch, must emit exactly the batch form's sessions minus
    each user's final (still-open) session."""
    import pyspark.sql.functions as F

    from gcp_dataengineering_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_stream,
    )
    from gcp_dataengineering_spark.streaming.windowed import with_event_time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch_events = with_event_time(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    expect_all = sessionize_batch(batch_events).collect()
    last_session = {}
    for r in expect_all:
        last_session[r["user_id"]] = max(last_session.get(r["user_id"], 0), r["session_id"])
    expect = sorted(
        tuple(r)
        for r in expect_all
        if r["session_id"] != last_session[r["user_id"]]
    )

    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_DIR)
    )
    prepared = with_event_time(stream).select(
        "user_id", F.col("ts_ts").cast("double").alias("ts_sec"), "value"
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(prepared)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect())
    finally:
        q.stop()
    assert len(got) > 0
    assert got == expect


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
