"""Core operator suite — one (PySpark query, DuckDB oracle) pair per
SURVEY.md §2 inventory row, run on the driver fixture star schema.

Conventions (driver compare = row-count + schema + order-insensitive
value hash, columns sorted by name):
- every computed column is aliased IDENTICALLY in Spark and SQL;
- double aggregates are rounded to 4 decimals on BOTH sides so
  summation-order ulps can't flip the hash (SURVEY.md §7 hard part d);
- integer-typed outputs are cast explicitly on both sides (DuckDB
  year()/month() return BIGINT, Spark returns INT — we standardize
  on INT);
- no ORDER BY: the reference has none (§2.6) and the compare is
  order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ops.allocate import allocate_join, allocate_window
from ..ops.conform import parse_money, recode, typed_null, week_to_month
from ..ops.pivot import conditional_pivot
from ..ops.vintage import union_vintages


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects by default; read as long nanos (runtime conf —
        # works on the driver's session too) and derive timestamps
        # explicitly where needed.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def event_ts(col="ts"):
    """events.ts (long nanoseconds) → TimestampType, truncated to
    microseconds (Spark timestamp precision)."""
    return F.timestamp_micros((F.col(col) / F.lit(1000)).cast("long"))


def r4(c):
    return F.round(c, 4)


# ---------------------------------------------------------------- flagship
def q_tam_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship ``nvs_tam`` shape (SURVEY §3.2)
    re-expressed on the star schema: vintage union (U1) → dim joins
    (J1, P11) → CASE display-order (P10) → inline cost pots (P12) →
    expression-key join (J3) → window allocation (W1) → final typed
    agg (A1/A2).

    Scale: per-branch date predicates push to the parquet scans; the
    deduped nation dim broadcasts; the single shuffle is the window
    partition on (n_name, year) reused by nothing downstream, and
    the final agg re-shuffles on a superset key — at 100 TB the
    window and agg dominate and both are hash-partition-friendly.
    """
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")

    d = F.col("o_orderdate")
    unioned = union_vintages(
        [
            (orders, d < "1996-01-01"),
            (orders, (d >= "1996-01-01") & (d < "1998-01-01")),
            (orders, d >= "1998-01-01"),
        ],
        source_col="source",
        source_names=["v2022", "v2023", "v2024"],
    )
    dim = nation.select("n_nationkey", "n_name").distinct()
    enriched = (
        unioned.join(customer, unioned.o_custkey == customer.c_custkey, "inner")
        .join(F.broadcast(dim), customer.c_nationkey == dim.n_nationkey, "inner")
        .withColumn(
            "display_order",
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .when(F.col("o_orderpriority") == "2-HIGH", 2)
            .otherwise(3),
        )
        .withColumn("reach", F.lit(1.0) / F.col("display_order"))
        .withColumn("year", F.year("o_orderdate").cast("int"))
    )
    pots = spark.createDataFrame(
        [(y, 32000000.0 - 1000000.0 * (y - 1995)) for y in range(1995, 2002)],
        "year int, pot double",
    )
    with_pot = enriched.join(F.broadcast(pots), "year", "inner")
    alloc = allocate_window(
        with_pot, "pot", "reach", ["n_name", "year"], out_col="alloc_cost"
    )
    return alloc.groupBy("n_name", "source", "year").agg(
        r4(F.sum("reach")).alias("reach"),
        r4(F.sum("alloc_cost")).alias("cost"),
    )


ORACLE_TAM_FLAGSHIP = """
WITH unioned AS (
    SELECT *, 'v2022' AS source FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
    UNION ALL
    SELECT *, 'v2023' AS source FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    UNION ALL
    SELECT *, 'v2024' AS source FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
), dim AS (
    SELECT DISTINCT n_nationkey, n_name FROM nation
), pots AS (
    SELECT y AS year, CAST(32000000.0 - 1000000.0 * (y - 1995) AS DOUBLE) AS pot
    FROM (SELECT UNNEST(range(1995, 2002)) AS y)
), enriched AS (
    SELECT n.n_name, u.source,
           CAST(year(u.o_orderdate) AS INTEGER) AS year,
           CASE WHEN u.o_orderpriority = '1-URGENT' THEN 1
                WHEN u.o_orderpriority = '2-HIGH' THEN 2
                ELSE 3 END AS display_order
    FROM unioned u
    JOIN customer c ON u.o_custkey = c.c_custkey
    JOIN dim n ON c.c_nationkey = n.n_nationkey
), with_reach AS (
    SELECT e.*, CAST(1.0 AS DOUBLE) / display_order AS reach, p.pot
    FROM enriched e JOIN pots p USING (year)
), alloc AS (
    SELECT n_name, source, year, reach,
           pot * reach / sum(reach) OVER (PARTITION BY n_name, year) AS alloc_cost
    FROM with_reach
)
SELECT n_name, source, year,
       ROUND(SUM(reach), 4) AS reach,
       ROUND(SUM(alloc_cost), 4) AS cost
FROM alloc
GROUP BY n_name, source, year
"""


# ---------------------------------------------------------------- U1 vintage union
def q_vintage_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — union of vintage snapshots with disjoint time predicates
    (``stage_1:95-115``); P2 source tagging; A4 per-branch counts."""
    orders = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    unioned = union_vintages(
        [
            (orders, d.between("1995-01-01", "1996-12-31")),
            (orders, (d >= "1997-01-01") & (d < "1999-01-01")),
            (orders, d >= "1999-01-01"),
        ],
        source_col="source",
    )
    return unioned.groupBy("source", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        r4(F.sum("o_totalprice")).alias("total_price"),
    )


ORACLE_VINTAGE_UNION = """
WITH unioned AS (
    SELECT *, 'v1' AS source FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    UNION ALL
    SELECT *, 'v2' AS source FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
    UNION ALL
    SELECT *, 'v3' AS source FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
)
SELECT source, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 4) AS total_price
FROM unioned GROUP BY source, o_orderstatus
"""


# ---------------------------------------------------------------- P11+J1 dim dedup join
def q_dim_dedup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 distinct-dim dedup (``stage_1:245-248``) + J1 single-key
    inner equi join (``stage_1:279-281``) + A4 agg. The deduped dim
    shrinks the build side and auto-broadcasts."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    dim = nation.select("n_nationkey", "n_name").distinct()
    return (
        customer.join(F.broadcast(dim), customer.c_nationkey == dim.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            r4(F.sum("c_acctbal")).alias("total_acctbal"),
        )
    )


ORACLE_DIM_DEDUP_JOIN = """
WITH dim AS (SELECT DISTINCT n_nationkey, n_name FROM nation)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(c_acctbal), 4) AS total_acctbal
FROM customer JOIN dim ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------- P4-P9 predicates
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 BETWEEN (``stage_1:99``), P5 comparisons, P6 IS NOT NULL
    (``stage_1:132``), P7 IN (``stage_1:848``), P8 wildcard-free
    LIKE (``stage_1:844``), P9 conjunction — all pushed to the scan."""
    o = _t(spark, sf_dir, "orders")
    filtered = o.filter(
        F.col("o_totalprice").between(50000.0, 200000.0)
        & (F.col("o_orderdate") >= "1996-01-01")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
        & F.col("o_orderstatus").like("F")
        & F.col("o_custkey").isNotNull()
    )
    return filtered.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        r4(F.sum("o_totalprice")).alias("total_price"),
    )


ORACLE_FILTER_PREDICATES = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 4) AS total_price
FROM orders
WHERE o_totalprice BETWEEN 50000.0 AND 200000.0
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
  AND o_orderstatus LIKE 'F'
  AND o_custkey IS NOT NULL
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------- P10 recode + F16
def q_case_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 multi-arm CASE recode (channel recode shape,
    ``stage_1:843-850``) + F16 string-equality flags
    (``stage_1:121-123``) + A3-style conditional count."""
    o = _t(spark, sf_dir, "orders")
    recoded = o.withColumn(
        "channel",
        recode(
            "o_orderpriority",
            {
                "1-URGENT": "Urgent",
                "2-HIGH": "High",
                "3-MEDIUM": "Medium",
                "4-NOT SPECIFIED": "Custom",
                "5-LOW": "Custom",
            },
        ),
    ).withColumn("is_open", F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
    return recoded.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("is_open").cast("long").alias("n_open"),
    )


ORACLE_CASE_RECODE = """
SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'Urgent'
            WHEN o_orderpriority = '2-HIGH' THEN 'High'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'Medium'
            WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 'Custom'
            WHEN o_orderpriority = '5-LOW' THEN 'Custom'
            ELSE o_orderpriority END AS channel,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open
FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------- P2/P3/A7 literals + typed nulls
def q_typed_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 constant enrichment + P3 typed nulls (``stage_1:163,
    258-259``) + A7 group-by over keys incl. literal columns
    (``stage_1:450``) — literals survive grouping unchanged."""
    li = _t(spark, sf_dir, "lineitem")
    conformed = li.select(
        F.lit("XOLAIR").alias("brand"),
        F.lit("US").alias("country"),
        typed_null("double").alias("engage"),
        typed_null("string").alias("dma"),
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice"),
    )
    return conformed.groupBy("brand", "country", "dma", "flag").agg(
        r4(F.sum("l_extendedprice")).alias("reach"),
        r4(F.sum("engage")).alias("engage"),
    )


ORACLE_TYPED_NULLS = """
SELECT 'XOLAIR' AS brand, 'US' AS country,
       CAST(NULL AS VARCHAR) AS dma, l_returnflag AS flag,
       ROUND(SUM(l_extendedprice), 4) AS reach,
       ROUND(SUM(CAST(NULL AS DOUBLE)), 4) AS engage
FROM lineitem GROUP BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------- W1/W2 window allocation
def q_window_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2 — proportional allocation via unbounded partition sum
    (``stage_1:164, 311``): allocate a fixed monthly pot over
    lineitems by extendedprice share within (l_returnflag, month)."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.withColumn("year", F.year("l_shipdate").cast("int")).withColumn(
        "month", F.month("l_shipdate").cast("int")
    )
    alloc = allocate_window(
        base.withColumn("pot", F.lit(1000000.0)),
        "pot",
        F.col("l_extendedprice"),
        ["l_returnflag", "year", "month"],
        out_col="alloc_cost",
    )
    return alloc.groupBy("l_returnflag", "year", "month").agg(
        r4(F.sum("l_extendedprice")).alias("reach"),
        r4(F.sum("alloc_cost")).alias("cost"),
    )


ORACLE_WINDOW_ALLOCATION = """
WITH base AS (
    SELECT l_returnflag,
           CAST(year(l_shipdate) AS INTEGER) AS year,
           CAST(month(l_shipdate) AS INTEGER) AS month,
           l_extendedprice,
           CAST(1000000.0 AS DOUBLE) AS pot
    FROM lineitem
), alloc AS (
    SELECT l_returnflag, year, month, l_extendedprice,
           pot * l_extendedprice /
             SUM(l_extendedprice) OVER (PARTITION BY l_returnflag, year, month) AS alloc_cost
    FROM base
)
SELECT l_returnflag, year, month,
       ROUND(SUM(l_extendedprice), 4) AS reach,
       ROUND(SUM(alloc_cost), 4) AS cost
FROM alloc GROUP BY l_returnflag, year, month
"""


# ---------------------------------------------------------------- J9 grouped-total join allocation
def q_grouped_total_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 — the explicit groupBy+join form of the same allocation
    (``stage_1:650-674``): monthly totals joined back as the
    denominator. Must equal q_window_allocation's result."""
    li = _t(spark, sf_dir, "lineitem")
    base = (
        li.withColumn("year", F.year("l_shipdate").cast("int"))
        .withColumn("month", F.month("l_shipdate").cast("int"))
        .withColumn("pot", F.lit(1000000.0))
    )
    alloc = allocate_join(
        base, "pot", "l_extendedprice", ["l_returnflag", "year", "month"], out_col="alloc_cost"
    )
    return alloc.groupBy("l_returnflag", "year", "month").agg(
        r4(F.sum("l_extendedprice")).alias("reach"),
        r4(F.sum("alloc_cost")).alias("cost"),
    )


# same oracle as the window form — the two forms are semantically equal
ORACLE_GROUPED_TOTAL_JOIN = ORACLE_WINDOW_ALLOCATION


# ---------------------------------------------------------------- A3 conditional pivot
def q_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — manual PIVOT via conditional aggregation
    (``stage_1:834-835``): events tall (event_type, value) → wide
    per-user metric columns; P6 not-null guard; A6's redundant
    DISTINCT omitted (no-op after grouping, SURVEY §4 quirk 2)."""
    ev = _t(spark, sf_dir, "events")
    return conditional_pivot(
        ev.filter(F.col("user_id").isNotNull()),
        [F.col("user_id")],
        "event_type",
        "value",
        {"click": "click_value", "view": "view_value", "purchase": "purchase_value"},
    ).select(
        "user_id",
        r4(F.col("click_value")).alias("click_value"),
        r4(F.col("view_value")).alias("view_value"),
        r4(F.col("purchase_value")).alias("purchase_value"),
    )


ORACLE_CONDITIONAL_PIVOT = """
SELECT user_id,
       ROUND(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DOUBLE) END), 4) AS click_value,
       ROUND(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DOUBLE) END), 4) AS view_value,
       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DOUBLE) END), 4) AS purchase_value
FROM events WHERE user_id IS NOT NULL
GROUP BY user_id
"""


# ---------------------------------------------------------------- J5 left join
def q_left_join_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — left outer join keeping reach rows without cost
    (``stage_1:491-493``): all customers, with order totals where
    they exist; F5 coalesce of the missing side (``stage_1:1006``)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    totals = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("order_total"))
    return (
        c.join(totals, c.c_custkey == totals.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            r4(F.coalesce(F.col("order_total"), F.lit(0.0))).alias("order_total"),
        )
    )


ORACLE_LEFT_JOIN_COSTS = """
WITH totals AS (
    SELECT o_custkey, SUM(o_totalprice) AS order_total FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_mktsegment,
       ROUND(COALESCE(order_total, 0.0), 4) AS order_total
FROM customer LEFT JOIN totals ON c_custkey = o_custkey
"""


QUERIES = {
    "tam_flagship": q_tam_flagship,
    "vintage_union": q_vintage_union,
    "dim_dedup_join": q_dim_dedup_join,
    "filter_predicates": q_filter_predicates,
    "case_recode": q_case_recode,
    "typed_nulls": q_typed_nulls,
    "window_allocation": q_window_allocation,
    "grouped_total_join": q_grouped_total_join,
    "conditional_pivot": q_conditional_pivot,
    "left_join_costs": q_left_join_costs,
}

ORACLES = {
    "tam_flagship": ORACLE_TAM_FLAGSHIP,
    "vintage_union": ORACLE_VINTAGE_UNION,
    "dim_dedup_join": ORACLE_DIM_DEDUP_JOIN,
    "filter_predicates": ORACLE_FILTER_PREDICATES,
    "case_recode": ORACLE_CASE_RECODE,
    "typed_nulls": ORACLE_TYPED_NULLS,
    "window_allocation": ORACLE_WINDOW_ALLOCATION,
    "grouped_total_join": ORACLE_GROUPED_TOTAL_JOIN,
    "conditional_pivot": ORACLE_CONDITIONAL_PIVOT,
    "left_join_costs": ORACLE_LEFT_JOIN_COSTS,
}
