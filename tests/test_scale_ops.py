"""Scale utilities: salted agg/join equivalence, bucketed writes,
and hypothesis property tests for the conform helpers."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from gcp_dataengineering_spark.ops.conform import parse_money, week_to_month
from gcp_dataengineering_spark.ops.skew import salted_broadcast_join, salted_sum
from gcp_dataengineering_spark.sources.io import write_bucketed


def test_salted_sum_equals_plain(spark):
    df = spark.range(5000).select(
        (F.col("id") % 7).alias("k"),
        # heavy skew: ~80% of rows land on k=0
        F.when(F.col("id") % 5 < 4, 0).otherwise(F.col("id") % 7).alias("hot"),
        (F.col("id") * 1.5).alias("v"),
    )
    plain = {
        r["hot"]: round(r["s"], 6)
        for r in df.groupBy("hot").agg(F.sum("v").alias("s")).collect()
    }
    salted = {
        r["hot"]: round(r["s"], 6)
        for r in salted_sum(df, ["hot"], {"v": "s"}).collect()
    }
    assert plain == salted


def test_salted_broadcast_join_equals_plain(spark):
    big = spark.range(2000).select(
        F.when(F.col("id") % 3 < 2, 0).otherwise(F.col("id") % 10).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(10)], "k long, name string"
    )
    plain = sorted(map(tuple, big.join(small, "k").select("k", "v", "name").collect()))
    salted = sorted(
        map(tuple, salted_broadcast_join(big, small, "k").select("k", "v", "name").collect())
    )
    assert plain == salted


def test_write_bucketed_roundtrip(spark):
    # warehouse dir is a static conf — uses the session default
    # (./spark-warehouse, gitignored)
    df = spark.range(100).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    write_bucketed(df, "bucketed_t", "k", num_buckets=4)
    try:
        back = spark.table("bucketed_t")
        assert back.count() == 100
        assert back.groupBy("k").count().count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_t")


# ---------------------------------------------------------------- hypothesis
@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=20))
def test_parse_money_property(spark, values):
    """parse_money inverts comma-grouping for any non-negative int."""
    rows = [(f"{v:,}",) for v in values]
    df = spark.createDataFrame(rows, "s string")
    got = [r[0] for r in df.select(parse_money("s").alias("v")).collect()]
    assert got == [float(v) for v in values]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=99), min_size=1, max_size=30))
def test_week_to_month_property(spark, weeks):
    """week→month equals Presto's date-arithmetic result for any week
    (including out-of-range weeks up to 99, since the feed is raw)."""
    import datetime

    df = spark.createDataFrame([(w,) for w in weeks], "week int")
    got = {r["week"]: r["m"] for r in df.select("week", week_to_month("week").alias("m")).collect()}
    for w in set(weeks):
        offset = (w - 1) // 4
        d = datetime.date(2023, 1, 1)
        total = d.month - 1 + offset
        expect = total % 12 + 1
        assert got[w] == expect
