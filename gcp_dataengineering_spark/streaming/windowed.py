"""Windowed streaming aggregation over the events table — the
Spark-native upgrade path for the reference's batch "incrementality"
(vintage unions + versioned history emulate what Structured
Streaming does natively; SURVEY.md §2.9).

The aggregation logic is shared between the batch and streaming
forms so correctness is checked once (the batch form is
oracle-checked as the ``events_hourly`` suite query; the streaming
form is pytest-checked against the batch result via the memory
sink).

Scale notes: watermark bounds state (late events beyond 2 hours are
dropped); the groupBy key (window, event_type) is low-cardinality so
state store size is tiny regardless of input rate; at production
scale the parquet source becomes Kafka with the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_agg(events: DataFrame, ts_col="ts_ts") -> DataFrame:
    """Tumbling 1-hour window: count + sum(value) per event_type.
    Expects a proper timestamp column `ts_ts`."""
    return (
        events.groupBy(F.window(F.col(ts_col), "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            F.round("total_value", 4).alias("total_value"),
        )
    )


def with_event_time(events: DataFrame) -> DataFrame:
    """events.ts → timestamp `ts_ts`, schema-adaptive: long nanos
    (TIMESTAMP(NANOS) parquet under nanosAsLong=true — pre-round-4
    testdata) is divided down to micros; a native timestamp /
    timestamp_ntz column (timestamp[us] parquet — the regenerated
    round-4 testdata) is cast directly (session pinned UTC, so ntz
    values pass through verbatim)."""
    dt = dict(events.dtypes).get("ts", "bigint")
    if dt == "bigint":
        ts = F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
    else:
        ts = F.col("ts").cast("timestamp")
    return events.withColumn("ts_ts", ts)


def batch_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return hourly_agg(with_event_time(spark.read.parquet(f"{sf_dir}/events.parquet")))


def stream_hourly(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """readStream form: same plan + watermark for bounded state.
    Returns the streaming DataFrame; callers attach a sink
    (tests use format('memory') + processAllAvailable)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return hourly_agg(with_event_time(stream).withWatermark("ts_ts", watermark))
