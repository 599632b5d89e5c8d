"""nvs_digital reconstruction — the six channel pipelines and their
6-way union (``stage_1_hcp_channel_all_hardcode.py:227-1128``),
DataFrame-native.

Preserved quirks (SURVEY.md §4; they affect output bits):
- CASE recodes with no ELSE → unmatched channels become NULL and
  are then dropped by inner joins on channel;
- month is INT in the five simple channels but STRING out of
  hcp_all_channels (old weekly feed yields int month, new monthly
  feed casts to string; their union coerces to string) — the final
  6-way union therefore coerces month to STRING overall, exactly
  like Spark SQL's positional-union coercion in the reference;
- the degenerate full-join condition coalesce(d.k, ca.k) = ca.k;
- missing-2024 cost redistributed into Custom (/11) and Paid Social
  (/9) months;
- dtc_poc groups by 9 keys incl. literal columns; redundant
  DISTINCT-with-GROUP-BY kept as plain groupBy (no-op).

Scale notes: every channel feed aggregates to (year, month, dma)
before joining the deduped DMA dim (broadcast); window allocation
partitions on (brand, month, year) — tiny keyspace, so AQE coalesces
the post-shuffle partitions; the monster query's cost tables are
kilobytes and broadcast everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..ops.conform import parse_money, recode, typed_null, week_to_month
from ..ops.vintage import union_vintages

BRAND = "XOLAIR"

# stage_1:843-850 — weekly-feed channel recode (LIKE guards are exact)
OLD_CHANNEL_RECODE = {
    "EHR": "EHR/EMR",
    "3RD_PARTY_EMAIL": "Third-Party Email",
    "POC": "Point of Care",
    "DISPLAY": "Display",
    "VIDEO": "Custom",
    "CUSTOM": "Custom",
    "ENDEMIC_SOCIAL": "Paid Social",
}

# stage_1:922-928 — monthly-feed channel recode
NEW_CHANNEL_RECODE = {
    "EHR": "EHR/EMR",
    "3rd Party Email": "Third-Party Email",
    "POC": "Point of Care",
    "Digital Display": "Display",
    "Video": "Custom",
    "Custom": "Custom",
    "Endemic Social": "Paid Social",
}

# stage_1:975-981 — cost-unpivot channel recode
COST_CHANNEL_RECODE = {
    "POC": "Point of Care",
    "Digital Display": "Display",
    "3rd Party Email": "Third-Party Email",
    "Endemic Social": "Paid Social",
    "Online Video": "Custom",
    "Video": "Custom",
    "Custom": "Custom",
}

# stage_1:957-969 — legacy npp split fractions per channel
LEGACY_CHANNEL_FRACTIONS = [
    ("Display", 0.39),
    ("Paid Social", 0.22),
    ("Third-Party Email", 0.06),
    ("Point of Care", 0.08),
    ("Custom", 0.08),
    ("EHR/EMR", 0.01),
]

def cleaned_dmas(demographics: DataFrame) -> DataFrame:
    """P11 dim dedup (``stage_1:244-248``) — the demographics table
    carries duplicate (dma_code, dma_name) rows."""
    return demographics.select("dma_code", "dma_name").distinct()


def _conform_feed(
    unioned: DataFrame,
    channel: str,
    audience: str,
    with_engage: bool = True,
) -> DataFrame:
    """nvs_cleaned shape (``stage_1:251-264`` et al.): constant
    enrichment + yrmo split + per-(year, month, dma) aggregation.
    POC has no clicks → engage is a typed null (``stage_1:448``)."""
    ym = F.col("year_mth").cast("string")
    grouped = (
        unioned.select(
            F.lit(BRAND).alias("brand"),
            F.lit(channel).alias("channel"),
            F.lit(audience).alias("audience"),
            F.substring(ym, 1, 4).alias("year"),
            F.substring(ym, 5, 2).alias("month"),
            F.col("dma_code"),
            typed_null("string").alias("zip_code"),
            typed_null("string").alias("state"),
            F.lit("US").alias("country"),
            F.col("impressions"),
            *( [F.col("clicks")] if with_engage else [] ),
        )
        .groupBy("brand", "channel", "audience", "year", "month", "dma_code",
                 "zip_code", "state", "country")
        .agg(
            F.sum(F.col("impressions").cast("double")).alias("reach"),
            (
                F.sum(F.col("clicks").cast("double")) if with_engage else F.max(typed_null("double"))
            ).alias("engage"),
        )
    )
    return grouped


def _join_dma(conformed: DataFrame, dma_dim: DataFrame, cast_code: bool = False) -> DataFrame:
    """dma_joined (``stage_1:266-281``): attach dma_name, drop
    dma_code. J8 cast-key variant for the bigint-coded feeds
    (``stage_1:940-941``)."""
    nvs = conformed.alias("nvs")
    cd = dma_dim.alias("cd")
    left_key = F.col("nvs.dma_code")
    if cast_code:
        left_key = left_key.cast("string")
    return (
        nvs.join(F.broadcast(cd), left_key == F.col("cd.dma_code"), "inner")
        .select(
            "nvs.brand", "nvs.channel", "nvs.audience", "nvs.month", "nvs.year",
            "nvs.zip_code", F.col("cd.dma_name").alias("dma"), "nvs.state",
            "nvs.country", "nvs.reach", "nvs.engage",
        )
    )


def legacy_costs(costs_wide: DataFrame, money_col: str, cutoff: str | None = "2023-12",
                 factor: float | None = None) -> DataFrame:
    """costs_cleaned legacy branch (``stage_1:283-289``): 'YYYY-MM'
    month key split + de-comma'd money cast; optional npp fraction
    (``stage_1:637`` — npp * 0.16)."""
    df = costs_wide
    if cutoff is not None:
        df = df.filter(F.col("date_month_") <= cutoff)
    cost = parse_money(money_col)
    if factor is not None:
        cost = cost * factor
    dm = F.col("date_month_").cast("string")
    return df.select(
        F.substring(dm, 1, 4).alias("year"),
        F.substring(dm, 6, 2).alias("month"),
        cost.alias("cost"),
    )


def unpivot_costs(costs_unpivot: DataFrame, audience: str, channel_upper: str,
                  grouped: bool = False) -> DataFrame:
    """costs_cleaned new branch (``stage_1:290-296``): tall cost rows
    filtered by audience + upper(channel); HCP search sums per month
    (``stage_1:640-648``)."""
    ym = F.col("year_month").cast("string")
    base = costs_unpivot.filter(
        (F.col("audience") == audience) & (F.upper(F.col("channel")) == channel_upper)
    ).select(
        F.substring(ym, 1, 4).alias("year"),
        F.substring(ym, 5, 2).alias("month"),
        F.col("cost"),
    )
    if grouped:
        return base.groupBy("year", "month").agg(F.sum("cost").alias("cost"))
    return base


def _allocate(dma_joined: DataFrame, costs: DataFrame, how: str) -> DataFrame:
    """final_agg (``stage_1:298-320``): attach the month's cost pot
    (J4/J5) and allocate by reach share within (brand, month, year)
    via the unbounded window (W2)."""
    dj = dma_joined.alias("dj")
    cc = costs.alias("cc")
    w = Window.partitionBy("dj.brand", "dj.month", "dj.year")
    return (
        dj.join(
            cc,
            (F.col("dj.year") == F.col("cc.year")) & (F.col("dj.month") == F.col("cc.month")),
            how,
        )
        .select(
            F.col("dj.brand").alias("brand"),
            F.col("dj.channel").alias("channel"),
            F.col("dj.audience").alias("audience"),
            F.col("dj.year").alias("year"),
            F.col("dj.month").cast("integer").alias("month"),
            F.col("dj.zip_code").alias("zip_code"),
            F.col("dj.dma").alias("dma"),
            F.col("dj.state").alias("state"),
            F.col("dj.country").alias("country"),
            F.col("dj.reach").alias("reach"),
            F.col("dj.engage").alias("engage"),
            (
                F.col("cc.cost").cast("double")
                * F.col("dj.reach")
                / F.sum("dj.reach").over(w)
            ).alias("cost"),
        )
    )


def _vintage_branches(t: dict[str, DataFrame], keys: list[str], cols: list[str],
                      preds: list[Column | None]) -> list[tuple[DataFrame, Column | None]]:
    return [(t[k].select(*cols), p) for k, p in zip(keys, preds)]


def dtc_display(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """``stage_1:228-321``."""
    ymr = F.col("year_mth")
    unioned = union_vintages(_vintage_branches(
        t, ["display_v1", "display_v2", "display_v3"],
        ["year_mth", "dma_region", "dma_code", "impressions", "clicks"],
        [ymr.between(202201, 202212), ymr.between(202301, 202312), ymr >= 202401],
    ))
    conformed = _conform_feed(unioned, "Display", "DTC")
    dj = _join_dma(conformed, cleaned_dmas(t["demographics"]))
    costs = legacy_costs(t["costs_wide"], "dtc_display_").unionByName(
        unpivot_costs(t["costs_unpivot"], "DTC", "DIGITAL DISPLAY")
    )
    return _allocate(dj, costs, "inner")


def dtc_paid_search(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """``stage_1:323-416``."""
    ymr = F.col("year_mth")
    unioned = union_vintages(_vintage_branches(
        t, ["search_v1", "search_v2", "search_v3"],
        ["year_mth", "dma_name", "dma_code", "impressions", "clicks"],
        [ymr.between(202201, 202212), ymr.between(202301, 202312), ymr >= 202401],
    ))
    conformed = _conform_feed(unioned, "Paid Search", "DTC")
    dj = _join_dma(conformed, cleaned_dmas(t["demographics"]))
    costs = legacy_costs(t["costs_wide"], "dtc_search").unionByName(
        unpivot_costs(t["costs_unpivot"], "DTC", "PAID SEARCH")
    )
    return _allocate(dj, costs, "inner")


def dtc_poc(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """``stage_1:419-499`` — impressions only; LEFT cost join."""
    ymr = F.col("year_mth")
    unioned = union_vintages(_vintage_branches(
        t, ["poc_v1", "poc_v2", "poc_v3"],
        ["year_mth", "dma", "dma_code", "impressions"],
        [ymr.between(202201, 202212), ymr.between(202301, 202312), ymr >= 202401],
    ))
    conformed = _conform_feed(unioned, "Point of Care", "DTC", with_engage=False)
    dj = _join_dma(conformed, cleaned_dmas(t["demographics"]))
    costs = legacy_costs(t["costs_wide"], "dtc_poc")
    return _allocate(dj, costs, "left")


def dtc_paid_social(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """``stage_1:502-578`` — 2 vintages; legacy costs with NO date
    cutoff (``stage_1:550-556``); LEFT cost join."""
    ymr = F.col("year_mth")
    unioned = union_vintages(_vintage_branches(
        t, ["social_v1", "social_v2"],
        ["dma_code", "dma_name", "year_mth", "impressions", "clicks"],
        [ymr.between(202201, 202212), ymr >= 202301],
    ))
    conformed = _conform_feed(unioned, "Paid Social", "DTC")
    dj = _join_dma(conformed, cleaned_dmas(t["demographics"]))
    costs = legacy_costs(t["costs_wide"], "dtc_social", cutoff=None)
    return _allocate(dj, costs, "left")


def hcp_paid_search(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """``stage_1:580-679`` — daily→monthly first vintage (F7/F8);
    cost pot = legacy npp*0.16 ∪ grouped unpivot; allocation via the
    explicit grouped-total join (J9), not a window."""
    daily = t["hcp_search_daily"].filter(F.col("activity_date") <= "2022-12-31").select(
        "dma_code",
        F.date_format(F.col("activity_date").cast("date"), "yyyyMM").alias("year_mth"),
        "impressions",
        "clicks",
    )
    ymr = F.col("year_mth")
    m1 = t["hcp_search_m1"].filter(ymr.between(202301, 202312)).select(
        "dma_code", ymr.cast("string").alias("year_mth"), "impressions", "clicks"
    )
    m2 = t["hcp_search_m2"].filter(ymr >= 202401).select(
        "dma_code", ymr.cast("string").alias("year_mth"), "impressions", "clicks"
    )
    unioned = daily.unionByName(m1).unionByName(m2)
    conformed = _conform_feed(unioned, "Paid Search", "HCP")
    dj = _join_dma(conformed, cleaned_dmas(t["demographics"]))

    costs = legacy_costs(t["costs_wide"], "npp", factor=0.16).unionByName(
        unpivot_costs(t["costs_unpivot"], "HCP", "PAID SEARCH", grouped=True)
    ).withColumnRenamed("cost", "paid_search_cost")

    monthly_reach = dj.groupBy("year", "month").agg(
        F.sum("reach").alias("total_monthly_reach")
    )
    d = dj.alias("d")
    mr = monthly_reach.alias("mr")
    ca = costs.alias("ca")
    return (
        d.join(mr, (F.col("d.year") == F.col("mr.year")) & (F.col("d.month") == F.col("mr.month")))
        .join(ca, (F.col("d.year") == F.col("ca.year")) & (F.col("d.month") == F.col("ca.month")))
        .select(
            F.col("d.brand").alias("brand"),
            F.col("d.channel").alias("channel"),
            F.col("d.audience").alias("audience"),
            F.col("d.year").alias("year"),
            F.col("d.month").cast("integer").alias("month"),
            F.col("d.zip_code").alias("zip_code"),
            F.col("d.dma").alias("dma"),
            F.col("d.state").alias("state"),
            F.col("d.country").alias("country"),
            F.col("d.reach").alias("reach"),
            F.col("d.engage").alias("engage"),
            ((F.col("d.reach") / F.col("mr.total_monthly_reach")) * F.col("ca.paid_search_cost")).alias("cost"),
        )
    )


def hcp_all_channels(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """``stage_1:817-1066`` — the monster: weekly pivoted feed +
    monthly feeds, channel recodes, legacy fraction pots ∪ new pots,
    per-channel monthly reach, degenerate full-join discovery of
    unallocated 2024 cost, and its /11 (Custom) & /9 (Paid Social)
    redistribution."""
    null_str = typed_null("string")

    # pivoted_hcp_all (stage_1:823-838): conditional-agg pivot A3
    weekly = t["hcp_all_weekly"]
    yrwk = F.col("yrwk").cast("string")
    pivoted = (
        weekly.filter(F.col("zip_cd").isNotNull() & (F.col("yrwk") <= 202352))
        .groupBy(
            F.lit(BRAND).alias("brand"),
            F.col("channel"),
            F.lit("HCP").alias("audience"),
            F.substring(yrwk, 1, 4).alias("year"),
            F.substring(yrwk, 5, 2).alias("week"),
            F.col("zip_cd").alias("zip_code"),
            null_str.alias("dma"),
            null_str.alias("state"),
            F.lit("US").alias("country"),
        )
        .agg(
            F.sum(F.when(F.col("metric") == "REACH", F.col("value").cast("double"))).alias("reach"),
            F.sum(F.when(F.col("metric") == "ENGAGEMENT", F.col("value").cast("double"))).alias("engage"),
        )
    )

    # weekly_to_monthly (stage_1:840-859): recode + F11 week→month
    w2m = pivoted.select(
        "brand",
        recode("channel", OLD_CHANNEL_RECODE, default=null_str).alias("channel"),
        "audience",
        "year",
        week_to_month("week").alias("month"),
        "zip_code", "dma", "state", "country", "reach", "engage",
    )

    # hcp_channels_old (stage_1:862-877): redundant distinct + group-by-9
    old = (
        w2m.groupBy("brand", "channel", "audience", "year", "month",
                    F.col("zip_code").cast("string").alias("zip_code"),
                    "dma", "state", "country")
        .agg(F.sum("reach").alias("reach"), F.sum("engage").alias("engage"))
    )

    dma_dim = cleaned_dmas(t["demographics"])

    # hcp_channels_combined (stage_1:884-901): 3 monthly feeds
    ymr = F.col("year_mth")
    comb1 = (
        t["hcp_all_monthly"].filter(ymr >= 202401)
        .groupBy("ipmm_channel", "dma_code", "year_mth")
        .agg(F.sum("impressions").alias("impressions"), F.sum("clicks").alias("clicks"))
    )
    comb2 = (
        t["hcp_poc_monthly"].filter(ymr >= 202401)
        .groupBy(F.lit("POC").alias("ipmm_channel"), "dma_code", "year_mth")
        .agg(F.sum("impressions").alias("impressions"),
             F.max(typed_null("double")).alias("clicks"))
    )
    comb3 = (
        t["hcp_social_monthly"].filter(ymr >= 202401)
        .groupBy(F.lit("Endemic Social").alias("ipmm_channel"), "dma_code", "year_mth")
        .agg(F.sum("impressions").alias("impressions"), F.sum("clicks").alias("clicks"))
    )
    combined = comb1.unionByName(comb2).unionByName(comb3)

    # hcp_raw_data (stage_1:903-918)
    ym = F.col("year_mth").cast("string")
    raw = (
        combined.groupBy(
            F.lit(BRAND).alias("brand"),
            F.col("ipmm_channel").alias("channel"),
            F.lit("HCP").alias("audience"),
            F.col("dma_code"),
            F.substring(ym, 1, 4).alias("year"),
            F.substring(ym, 5, 2).alias("month"),
            null_str.alias("zip_code"),
            null_str.alias("state"),
            F.lit("US").alias("country"),
        )
        .agg(F.sum("impressions").alias("reach"), F.sum("clicks").alias("engage"))
    )

    # hcp_channels_new (stage_1:920-942): recode + J8 cast-key dim join
    new = (
        raw.join(F.broadcast(dma_dim), raw.dma_code.cast("string") == dma_dim.dma_code, "inner")
        .select(
            "brand",
            recode("channel", NEW_CHANNEL_RECODE, default=null_str).alias("channel"),
            "audience",
            "year",
            F.col("month").cast("string").alias("month"),
            "zip_code",
            F.col("dma_name").alias("dma"),
            "state", "country", "reach", "engage",
        )
    )

    # all_hcp_unioned (stage_1:943-947): old month INT ∪ new month
    # STRING — SQL positional union coerces to string; done explicitly.
    # Persisted: consumed by monthly_reach, the full-join discovery
    # branch AND the final allocation (3 consumers) — relying on
    # AQE's stage cache to dedup those scans is deployment-dependent;
    # an explicit MEMORY_AND_DISK persist guarantees the union (and
    # everything under it) is computed once on any deployment.
    all_hcp = (
        old.withColumn("month", F.col("month").cast("string"))
        .unionByName(new)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # spend_data + channel_allocations (stage_1:949-991)
    spend = legacy_costs(t["costs_wide"], "npp").withColumnRenamed("cost", "total_cost")
    fractions = spark.createDataFrame(LEGACY_CHANNEL_FRACTIONS, "channel string, frac double")
    alloc_old = spend.crossJoin(F.broadcast(fractions)).select(
        F.lit(BRAND).alias("brand"), "year", "month", "channel",
        (F.col("total_cost") * F.col("frac")).alias("cost"),
    )
    ymc = F.col("year_month").cast("string")
    alloc_new = (
        t["costs_unpivot"].filter(F.col("audience") == "HCP")
        .groupBy(
            F.lit(BRAND).alias("brand"),
            F.substring(ymc, 1, 4).alias("year"),
            F.substring(ymc, 5, 2).alias("month"),
            recode("channel", COST_CHANNEL_RECODE, default=null_str).alias("channel"),
        )
        .agg(F.sum("cost").alias("cost"))
    )
    # Persisted: joined by both the discovery branch and the final
    # allocation (2 consumers each).
    allocations = alloc_old.unionByName(alloc_new).persist(StorageLevel.MEMORY_AND_DISK)

    # monthly_reach (stage_1:993-1002)
    monthly_reach = (
        all_hcp.groupBy("brand", "year", "month", "channel")
        .agg(F.sum("reach").alias("total_monthly_reach"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    d = all_hcp.alias("d")
    mr = monthly_reach.alias("mr")
    ca = allocations.alias("ca")

    # final_allocation_including_missing_cost (stage_1:1004-1028):
    # (d ⋈ mr) FULL JOIN ca on the degenerate coalesce condition,
    # keep 2024 rows with NULL reach → unmatched cost pots
    d_mr = d.join(
        mr,
        (F.col("d.year") == F.col("mr.year"))
        & (F.col("d.month") == F.col("mr.month"))
        & (F.col("d.channel") == F.col("mr.channel")),
        "inner",
    )
    # The reference writes coalesce(d.k, ca.k) = ca.k (stage_1:1024-1025).
    # On the (d ⋈ mr) side every key is non-null (it just inner-joined on
    # exactly those keys), so the degenerate condition reduces to plain
    # equality — expressed that way here so Catalyst plans a scalable
    # SortMergeJoin FullOuter instead of a fact-sized nested loop; the
    # parity test runs the reference's own form in DuckDB and matches.
    full_cond = (
        (F.col("d.year") == F.col("ca.year"))
        & (F.col("d.month") == F.col("ca.month"))
        & (F.col("d.channel") == F.col("ca.channel"))
    )
    incl_missing = (
        d_mr.join(ca, full_cond, "full")
        .filter(
            (F.coalesce(F.col("d.year"), F.col("ca.year"), F.col("mr.year")) == "2024")
            & F.col("d.reach").isNull()
        )
        .select(
            F.coalesce(F.col("d.brand"), F.col("ca.brand"), F.col("mr.brand")).alias("brand"),
            F.coalesce(F.col("d.channel"), F.col("ca.channel"), F.col("mr.channel")).alias("channel"),
            F.coalesce(F.col("d.audience"), F.lit("HCP")).alias("audience"),
            F.coalesce(F.col("d.year"), F.col("ca.year"), F.col("mr.year")).alias("year"),
            F.col("d.reach").alias("reach"),
            F.col("d.engage").alias("engage"),
            F.when(
                F.col("d.reach").isNotNull() & F.col("mr.total_monthly_reach").isNotNull(),
                (F.col("d.reach") / F.col("mr.total_monthly_reach")) * F.col("ca.cost"),
            ).otherwise(F.col("ca.cost")).alias("cost"),
        )
    )

    # missing_cost_channel_year (stage_1:1029-1035)
    missing = (
        incl_missing.filter(F.col("channel").isin("Paid Social", "Custom"))
        .groupBy("brand", "channel", "audience", "year")
        .agg(F.sum("cost").alias("missing_cost"))
    )

    # final_allocation (stage_1:1037-1064): base allocation + the
    # /11 (Custom) and /9 (Paid Social) 2024 redistribution
    mc = missing.alias("mc")
    base = (
        d.join(
            mr,
            (F.col("d.year") == F.col("mr.year"))
            & (F.col("d.month") == F.col("mr.month"))
            & (F.col("d.channel") == F.col("mr.channel")),
            "inner",
        )
        .join(
            ca,
            (F.col("d.year") == F.col("ca.year"))
            & (F.col("d.month") == F.col("ca.month"))
            & (F.col("d.channel") == F.col("ca.channel")),
            "inner",
        )
        .join(
            mc,
            (F.col("d.year") == F.col("mc.year"))
            & (F.col("d.channel") == F.col("mc.channel"))
            & (F.col("d.audience") == F.col("mc.audience")),
            "left",
        )
    )
    share = F.col("d.reach") / F.col("mr.total_monthly_reach")
    return base.select(
        F.col("d.brand").alias("brand"),
        F.col("d.channel").alias("channel"),
        F.col("d.audience").alias("audience"),
        F.col("d.year").alias("year"),
        F.col("d.month").alias("month"),
        F.col("d.zip_code").alias("zip_code"),
        F.col("d.dma").alias("dma"),
        F.col("d.state").alias("state"),
        F.col("d.country").alias("country"),
        F.col("d.reach").alias("reach"),
        F.col("d.engage").alias("engage"),
        F.when(
            (F.col("d.channel") == "Custom") & (F.col("d.year") == "2024") & (F.col("d.audience") == "HCP"),
            share * F.col("ca.cost") + share * (F.col("mc.missing_cost") / 11),
        )
        .when(
            (F.col("d.channel") == "Paid Social") & (F.col("d.year") == "2024") & (F.col("d.audience") == "HCP"),
            share * F.col("ca.cost") + share * (F.col("mc.missing_cost") / 9),
        )
        .otherwise(share * F.col("ca.cost"))
        .alias("cost"),
    )


def nvs_digital(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """6-way union (``stage_1:1069-1084``). The five simple channels
    emit month INT, hcp_all_channels emits month STRING — the union
    coerces month to STRING (SQL positional-union behavior, made
    explicit here; SURVEY §4 quirk 4)."""
    parts = [
        dtc_display(spark, t),
        dtc_paid_search(spark, t),
        dtc_poc(spark, t),
        dtc_paid_social(spark, t),
        hcp_paid_search(spark, t),
        hcp_all_channels(spark, t),
    ]
    out = None
    for p in parts:
        p = p.withColumn("month", F.col("month").cast("string"))
        out = p if out is None else out.unionByName(p)
    return out
