"""End-to-end pipeline queries under the driver's CORRECTNESS gate.

The reference's actual product is two end-to-end jobs — the TAM
build (``stage_1_hcp_channel_all_hardcode.py:93-225``) and the
6-channel digital union (``stage_1:227-1128``). Round 1 verified the
reconstructions only via in-repo pytest parity; these entries put
them under the external driver's hash-check as ``pipeline_tam_e2e``
and ``pipeline_digital_e2e``.

Mechanics: the reference-shaped inputs (call vintages, dims, feeds,
cost sheets) are synthesized deterministically by
``gcp_dataengineering_spark.fixtures`` and materialized as parquet
under ``<repo>/.e2e_fixtures`` at import time. The Spark query reads
those files and runs the DataFrame pipelines; the oracle SQL reads
the SAME files via DuckDB ``read_parquet`` CTEs and runs the ANSI
translation of the reference SQL. Doubles are rounded to 4 decimals
on both sides (same policy as every other oracle in the suite).

The SQL translations here are the single source of truth — the
pytest parity tests (tests/test_pipelines.py) import them too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import FIXTURE_TABLES, ensure_parquet, fixture_path
from ..pipelines.digital import nvs_digital
from ..pipelines.tam import nvs_tam

# Materialize at import: the driver may execute oracle SQL in any
# order relative to the Spark queries; importing this module (which
# the driver does to reach queries()/oracle_sql()) guarantees the
# parquet exists before either side runs.
try:
    ensure_parquet()
except OSError:  # pragma: no cover - read-only checkout; queries will re-raise
    pass


def _load_tables(spark: SparkSession) -> dict[str, DataFrame]:
    ensure_parquet()
    return {name: spark.read.parquet(fixture_path(name)) for name in FIXTURE_TABLES}


def _sourced(sql: str) -> str:
    """Prefix a WITH-query with CTEs binding every fixture table name
    to its parquet file, so the oracle is self-contained against the
    driver's DuckDB connection (which only registers the testdata
    views). Unused CTEs are pruned by DuckDB's optimizer. A leading
    WITH RECURSIVE keeps RECURSIVE in the (mandatory) first position;
    non-recursive source CTEs are legal after it."""
    ctes = ",\n".join(
        f"{name} AS (SELECT * FROM read_parquet('{fixture_path(name)}'))"
        for name in FIXTURE_TABLES
    )
    body = sql.lstrip()
    upper = body.upper()
    if upper.startswith("WITH RECURSIVE"):
        return "WITH RECURSIVE " + ctes + ",\n" + body[len("WITH RECURSIVE"):].lstrip()
    if upper.startswith("WITH"):
        return "WITH " + ctes + ",\n" + body[len("WITH"):].lstrip()
    return "WITH " + ctes + "\n" + body


# --------------------------------------------------------------- TAM SQL
# ANSI translation of the reference TAM job (stage_1:93-225).
TAM_SQL = """
WITH raw_calls_unioned AS (
    SELECT npi_num, zip_cd, city, state, brand, yrmo, call_p1, call_p2, call_p3, calls, lunch_n_learn_calls
    FROM calls_v1 WHERE yrmo BETWEEN 202201 AND 202206
    UNION ALL
    SELECT npi_num, zip_cd, city, state, brand, yrmo, call_p1, call_p2, call_p3, calls, lunch_n_learn_calls
    FROM calls_v2 WHERE yrmo BETWEEN 202207 AND 202212
    UNION ALL
    SELECT npi_num, zip_cd, city, state, brand, yrmo, call_p1, call_p2, call_p3, calls, lunch_n_learn_calls
    FROM calls_v3 WHERE yrmo BETWEEN 202301 AND 202312
    UNION ALL
    SELECT npi_num, zip_cd, city, state, brand, yrmo, call_p1, call_p2, call_p3, calls, lunch_n_learn_calls
    FROM calls_v4 WHERE yrmo >= 202401
), normalized AS (
    SELECT hcp.mdm_zip AS zip_code, nvs.yrmo AS year_month,
           'XOLAIR' AS product_brand_name,
           CASE WHEN call_p1 = '1' OR lunch_n_learn_calls = '1' THEN 1
                WHEN call_p2 = '1' THEN 2
                WHEN call_p3 = '1' THEN 3 END AS display_order
    FROM raw_calls_unioned nvs
    JOIN mdm ON nvs.npi_num = mdm.npi_number
    JOIN hcp_org hcp ON mdm.mdm_id = hcp.mdm_id
                    AND list_contains(hcp.product_brand_name, 'XOLAIR')
    WHERE nvs.npi_num IS NOT NULL
), tam_hd_costs AS (
    SELECT * FROM (VALUES ('XOLAIR', CAST(32000000.0 AS DOUBLE), '2022'),
                          ('XOLAIR', CAST(32000000.0 AS DOUBLE), '2023'),
                          ('XOLAIR', CAST(36583323.0 AS DOUBLE), '2024')) t(brand, cost, year)
), hcp_costs AS (
    SELECT n.product_brand_name, n.year_month, n.zip_code AS zip,
           'CE' AS audience, 'tam_hd' AS channel,
           CAST(1.0 AS DOUBLE) / n.display_order AS reach, c.cost
    FROM normalized n
    JOIN tam_hd_costs c ON n.product_brand_name = c.brand
                       AND substring(CAST(n.year_month AS VARCHAR), 1, 4) = c.year
), final_agg AS (
    SELECT product_brand_name, 'NVS' AS source, year_month, zip, audience, channel,
           reach, CAST(NULL AS DOUBLE) AS engage,
           cost * reach / SUM(reach) OVER (PARTITION BY product_brand_name,
                substring(CAST(year_month AS VARCHAR), 1, 4)) AS cost
    FROM hcp_costs
)
SELECT product_brand_name, source, year_month, CAST(zip AS VARCHAR) AS zip,
       audience, channel,
       SUM(CAST(reach AS DOUBLE)) AS reach,
       SUM(CAST(engage AS DOUBLE)) AS engage,
       SUM(CAST(cost AS DOUBLE)) AS cost
FROM final_agg
GROUP BY 1, 2, 3, 4, 5, 6
"""


# --------------------------------------------------------------- DTC SQL
def _dtc_sql(
    union_sql: str,
    channel: str,
    engage_expr: str,
    costs_sql: str,
    join_kw: str,
    group_tail: str = "1, 2, 3, 4, 5, 6",
) -> str:
    """Template for the four DTC channel queries (stage_1:227-520)."""
    return f"""
WITH unioned AS (
    {union_sql}
), cleaned_dmas AS (
    SELECT DISTINCT dma_code, dma_name FROM demographics
), nvs_cleaned AS (
    SELECT 'XOLAIR' AS brand, '{channel}' AS channel, 'DTC' AS audience,
           substring(CAST(year_mth AS VARCHAR), 1, 4) AS year,
           substring(CAST(year_mth AS VARCHAR), 5, 2) AS month,
           dma_code,
           CAST(NULL AS VARCHAR) AS zip_code, CAST(NULL AS VARCHAR) AS state,
           'US' AS country,
           SUM(CAST(impressions AS DOUBLE)) AS reach,
           {engage_expr} AS engage
    FROM unioned GROUP BY {group_tail}
), dma_joined AS (
    SELECT brand, channel, audience, month, year, zip_code,
           cd.dma_name AS dma, state, country, reach, engage
    FROM nvs_cleaned nvs JOIN cleaned_dmas cd ON nvs.dma_code = cd.dma_code
), costs_cleaned AS (
    {costs_sql}
)
SELECT brand, channel, audience, dj.year,
       CAST(dj.month AS INTEGER) AS month,
       zip_code, dma, state, country, reach, engage,
       CAST(cc.cost AS DOUBLE) * reach /
           SUM(reach) OVER (PARTITION BY brand, dj.month, dj.year) AS cost
FROM dma_joined dj {join_kw} JOIN costs_cleaned cc
  ON dj.year = cc.year AND dj.month = cc.month
"""


def _legacy_costs_sql(col: str, cutoff: bool = True, factor: str = "") -> str:
    where = "WHERE date_month_ <= '2023-12'" if cutoff else ""
    return f"""
    SELECT substring(date_month_, 1, 4) AS year,
           substring(date_month_, 6, 2) AS month,
           CAST(replace({col}, ',', '') AS DOUBLE){factor} AS cost
    FROM costs_wide {where}
"""


def _unpivot_costs_sql(channel_upper: str) -> str:
    return f"""
    SELECT substring(CAST(year_month AS VARCHAR), 1, 4) AS year,
           substring(CAST(year_month AS VARCHAR), 5, 2) AS month,
           cost
    FROM costs_unpivot
    WHERE audience = 'DTC' AND upper(channel) = '{channel_upper}'
"""


DTC_DISPLAY_SQL = _dtc_sql(
    """
    SELECT year_mth, dma_region, dma_code, impressions, clicks FROM display_v1
    WHERE year_mth BETWEEN 202201 AND 202212
    UNION ALL
    SELECT year_mth, dma_region, dma_code, impressions, clicks FROM display_v2
    WHERE year_mth BETWEEN 202301 AND 202312
    UNION ALL
    SELECT year_mth, dma_region, dma_code, impressions, clicks FROM display_v3
    WHERE year_mth >= 202401
    """,
    "Display",
    "SUM(CAST(clicks AS DOUBLE))",
    _legacy_costs_sql("dtc_display_") + " UNION ALL " + _unpivot_costs_sql("DIGITAL DISPLAY"),
    "INNER",
)

DTC_PAID_SEARCH_SQL = _dtc_sql(
    """
    SELECT year_mth, dma_name, dma_code, impressions, clicks FROM search_v1
    WHERE year_mth BETWEEN 202201 AND 202212
    UNION ALL
    SELECT year_mth, dma_name, dma_code, impressions, clicks FROM search_v2
    WHERE year_mth BETWEEN 202301 AND 202312
    UNION ALL
    SELECT year_mth, dma_name, dma_code, impressions, clicks FROM search_v3
    WHERE year_mth >= 202401
    """,
    "Paid Search",
    "SUM(CAST(clicks AS DOUBLE))",
    _legacy_costs_sql("dtc_search") + " UNION ALL " + _unpivot_costs_sql("PAID SEARCH"),
    "INNER",
)

DTC_POC_SQL = _dtc_sql(
    """
    SELECT year_mth, dma, dma_code, impressions FROM poc_v1
    WHERE year_mth BETWEEN 202201 AND 202212
    UNION ALL
    SELECT year_mth, dma, dma_code, impressions FROM poc_v2
    WHERE year_mth BETWEEN 202301 AND 202312
    UNION ALL
    SELECT year_mth, dma, dma_code, impressions FROM poc_v3
    WHERE year_mth >= 202401
    """,
    "Point of Care",
    "CAST(NULL AS DOUBLE)",
    _legacy_costs_sql("dtc_poc"),
    "LEFT",
    group_tail="1, 2, 3, 4, 5, 6, 7, 8, 9",
)

DTC_PAID_SOCIAL_SQL = _dtc_sql(
    """
    SELECT dma_code, dma_name, year_mth, impressions, clicks FROM social_v1
    WHERE year_mth BETWEEN 202201 AND 202212
    UNION ALL
    SELECT dma_code, dma_name, year_mth, impressions, clicks FROM social_v2
    WHERE year_mth >= 202301
    """,
    "Paid Social",
    "SUM(CAST(clicks AS DOUBLE))",
    _legacy_costs_sql("dtc_social", cutoff=False),
    "LEFT",
)


# --------------------------------------------------------------- HCP SQL
HCP_SEARCH_SQL = f"""
WITH paid_search_unioned AS (
    SELECT dma_code, strftime(CAST(activity_date AS DATE), '%Y%m') AS year_mth, impressions, clicks
    FROM hcp_search_daily WHERE activity_date <= '2022-12-31'
    UNION ALL
    SELECT dma_code, CAST(year_mth AS VARCHAR), impressions, clicks
    FROM hcp_search_m1 WHERE year_mth BETWEEN 202301 AND 202312
    UNION ALL
    SELECT dma_code, CAST(year_mth AS VARCHAR), impressions, clicks
    FROM hcp_search_m2 WHERE year_mth >= 202401
), cleaned_dmas AS (
    SELECT DISTINCT dma_code, dma_name FROM demographics
), nvs_cleaned AS (
    SELECT 'XOLAIR' AS brand, 'Paid Search' AS channel, 'HCP' AS audience,
           substring(year_mth, 1, 4) AS year, substring(year_mth, 5, 2) AS month,
           dma_code, CAST(NULL AS VARCHAR) AS zip_code, CAST(NULL AS VARCHAR) AS state,
           'US' AS country,
           SUM(CAST(impressions AS DOUBLE)) AS reach,
           SUM(CAST(clicks AS DOUBLE)) AS engage
    FROM paid_search_unioned GROUP BY 1, 2, 3, 4, 5, 6
), dma_joined AS (
    SELECT brand, channel, audience, month, year, zip_code,
           cd.dma_name AS dma, state, country, reach, engage
    FROM nvs_cleaned nvs JOIN cleaned_dmas cd ON nvs.dma_code = cd.dma_code
), nvs_costs_paid_search AS (
    {_legacy_costs_sql('npp', factor=' * 0.16').replace('AS cost', 'AS paid_search_cost')}
    UNION ALL
    SELECT substring(CAST(year_month AS VARCHAR), 1, 4) AS year,
           substring(CAST(year_month AS VARCHAR), 5, 2) AS month,
           SUM(cost) AS paid_search_cost
    FROM costs_unpivot WHERE audience = 'HCP' AND upper(channel) = 'PAID SEARCH'
    GROUP BY 1, 2
), monthly_reach AS (
    SELECT year, month, SUM(reach) AS total_monthly_reach FROM dma_joined GROUP BY year, month
)
SELECT dj.brand, dj.channel, dj.audience, dj.year,
       CAST(dj.month AS INTEGER) AS month,
       dj.zip_code, dj.dma, dj.state, dj.country, dj.reach, dj.engage,
       (dj.reach / mr.total_monthly_reach) * ca.paid_search_cost AS cost
FROM dma_joined dj
JOIN monthly_reach mr ON dj.year = mr.year AND dj.month = mr.month
JOIN nvs_costs_paid_search ca ON dj.year = ca.year AND dj.month = ca.month
"""

HCP_ALL_SQL = """
WITH pivoted_hcp_all AS (
    SELECT DISTINCT 'XOLAIR' AS brand, channel, 'HCP' AS audience,
        substring(CAST(yrwk AS VARCHAR), 1, 4) AS year,
        substring(CAST(yrwk AS VARCHAR), 5, 2) AS week,
        zip_cd AS zip_code,
        CAST(NULL AS VARCHAR) AS dma, CAST(NULL AS VARCHAR) AS state,
        'US' AS country,
        SUM(CASE WHEN metric = 'REACH' THEN CAST(value AS DOUBLE) END) AS reach,
        SUM(CASE WHEN metric = 'ENGAGEMENT' THEN CAST(value AS DOUBLE) END) AS engage
    FROM hcp_all_weekly WHERE zip_cd IS NOT NULL AND yrwk <= 202352
    GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9
), weekly_to_monthly AS (
    SELECT brand,
        CASE WHEN channel LIKE 'EHR' THEN 'EHR/EMR'
             WHEN channel LIKE '3RD_PARTY_EMAIL' THEN 'Third-Party Email'
             WHEN channel LIKE 'POC' THEN 'Point of Care'
             WHEN channel LIKE 'DISPLAY' THEN 'Display'
             WHEN channel IN ('VIDEO', 'CUSTOM') THEN 'Custom'
             WHEN channel LIKE 'ENDEMIC_SOCIAL' THEN 'Paid Social' END AS channel,
        audience, year,
        CAST(strftime(CAST(year || '-01-01' AS DATE)
             + to_months(CAST((CAST(week AS INTEGER) - 1) // 4 AS INTEGER)), '%m') AS INTEGER) AS month,
        zip_code, dma, state, country, reach, engage
    FROM pivoted_hcp_all
), hcp_channels_old AS (
    SELECT DISTINCT brand, channel, audience, year, month,
        CAST(zip_code AS VARCHAR) AS zip_code, dma, state, country,
        SUM(reach) AS reach, SUM(engage) AS engage
    FROM weekly_to_monthly
    GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9
), cleaned_dmas AS (
    SELECT DISTINCT dma_code, dma_name FROM demographics
), hcp_channels_combined AS (
    SELECT ipmm_channel, dma_code, year_mth,
           SUM(impressions) AS impressions, SUM(clicks) AS clicks
    FROM hcp_all_monthly WHERE year_mth >= 202401 GROUP BY 1, 2, 3
    UNION ALL
    SELECT 'POC' AS ipmm_channel, dma_code, year_mth,
           SUM(impressions) AS impressions, CAST(NULL AS DOUBLE) AS clicks
    FROM hcp_poc_monthly WHERE year_mth >= 202401 GROUP BY 1, 2, 3
    UNION ALL
    SELECT 'Endemic Social' AS ipmm_channel, dma_code, year_mth,
           SUM(impressions) AS impressions, SUM(clicks) AS clicks
    FROM hcp_social_monthly WHERE year_mth >= 202401 GROUP BY 1, 2, 3
), hcp_raw_data AS (
    SELECT 'XOLAIR' AS brand, ipmm_channel AS channel, 'HCP' AS audience, dma_code,
        substring(CAST(year_mth AS VARCHAR), 1, 4) AS year,
        substring(CAST(year_mth AS VARCHAR), 5, 2) AS month,
        CAST(NULL AS VARCHAR) AS zip_code, CAST(NULL AS VARCHAR) AS state,
        'US' AS country,
        SUM(impressions) AS reach, SUM(clicks) AS engage
    FROM hcp_channels_combined
    GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9
), hcp_channels_new AS (
    SELECT brand,
        CASE WHEN channel LIKE 'EHR' THEN 'EHR/EMR'
             WHEN channel LIKE '3rd Party Email' THEN 'Third-Party Email'
             WHEN channel LIKE 'POC' THEN 'Point of Care'
             WHEN channel LIKE 'Digital Display' THEN 'Display'
             WHEN channel IN ('Video', 'Custom') THEN 'Custom'
             WHEN channel LIKE 'Endemic Social' THEN 'Paid Social' END AS channel,
        audience, year, CAST(month AS VARCHAR) AS month, zip_code,
        cd.dma_name AS dma, state, country, reach, engage
    FROM hcp_raw_data nvs
    JOIN cleaned_dmas cd ON CAST(nvs.dma_code AS VARCHAR) = cd.dma_code
), all_hcp_unioned AS (
    SELECT brand, channel, audience, year, CAST(month AS VARCHAR) AS month,
           zip_code, dma, state, country, reach, engage FROM hcp_channels_old
    UNION ALL
    SELECT * FROM hcp_channels_new
), spend_data AS (
    SELECT substring(CAST(date_month_ AS VARCHAR), 1, 4) AS year,
           substring(CAST(date_month_ AS VARCHAR), 6, 2) AS month,
           CAST(replace(CAST(npp AS VARCHAR), ',', '') AS DOUBLE) AS total_cost
    FROM costs_wide WHERE date_month_ <= '2023-12'
), channel_allocations_old AS (
    SELECT 'XOLAIR' AS brand, year, month, 'Display' AS channel, total_cost * 0.39 AS cost FROM spend_data
    UNION ALL SELECT 'XOLAIR', year, month, 'Paid Social', total_cost * 0.22 FROM spend_data
    UNION ALL SELECT 'XOLAIR', year, month, 'Third-Party Email', total_cost * 0.06 FROM spend_data
    UNION ALL SELECT 'XOLAIR', year, month, 'Point of Care', total_cost * 0.08 FROM spend_data
    UNION ALL SELECT 'XOLAIR', year, month, 'Custom', total_cost * 0.08 FROM spend_data
    UNION ALL SELECT 'XOLAIR', year, month, 'EHR/EMR', total_cost * 0.01 FROM spend_data
), channel_allocations_new AS (
    SELECT 'XOLAIR' AS brand,
        substring(CAST(year_month AS VARCHAR), 1, 4) AS year,
        substring(CAST(year_month AS VARCHAR), 5, 2) AS month,
        CASE WHEN channel IN ('POC') THEN 'Point of Care'
             WHEN channel IN ('Digital Display') THEN 'Display'
             WHEN channel IN ('3rd Party Email') THEN 'Third-Party Email'
             WHEN channel IN ('Endemic Social') THEN 'Paid Social'
             WHEN channel IN ('Online Video', 'Video', 'Custom') THEN 'Custom' END AS channel,
        SUM(cost) AS cost
    FROM costs_unpivot WHERE audience = 'HCP'
    GROUP BY 1, 2, 3, 4
), channel_allocations AS (
    SELECT * FROM channel_allocations_old
    UNION ALL
    SELECT * FROM channel_allocations_new
), monthly_reach AS (
    SELECT brand, year, month, channel, SUM(reach) AS total_monthly_reach
    FROM all_hcp_unioned GROUP BY brand, year, month, channel
), final_allocation_including_missing_cost AS (
    SELECT COALESCE(d.brand, ca.brand, mr.brand) AS brand,
           COALESCE(d.channel, ca.channel, mr.channel) AS channel,
           COALESCE(d.audience, 'HCP') AS audience,
           COALESCE(d.year, ca.year, mr.year) AS year,
           d.reach, d.engage,
           CASE WHEN d.reach IS NOT NULL AND mr.total_monthly_reach IS NOT NULL
                THEN (d.reach / mr.total_monthly_reach) * ca.cost
                ELSE ca.cost END AS cost
    FROM all_hcp_unioned d
    JOIN monthly_reach mr ON d.year = mr.year AND d.month = mr.month AND d.channel = mr.channel
    FULL JOIN channel_allocations ca
      ON COALESCE(d.year, ca.year) = ca.year
     AND COALESCE(d.month, ca.month) = ca.month
     AND COALESCE(d.channel, ca.channel) = ca.channel
    WHERE COALESCE(d.year, ca.year, mr.year) = '2024' AND d.reach IS NULL
), missing_cost_channel_year AS (
    SELECT brand, channel, audience, year,
           SUM(reach) AS reach, SUM(engage) AS engage, SUM(cost) AS missing_cost
    FROM final_allocation_including_missing_cost
    WHERE channel IN ('Paid Social', 'Custom')
    GROUP BY 1, 2, 3, 4
)
SELECT d.brand, d.channel, d.audience, d.year, d.month, d.zip_code, d.dma,
       d.state, d.country, d.reach, d.engage,
       CASE WHEN d.channel = 'Custom' AND d.year = '2024' AND d.audience = 'HCP'
            THEN (d.reach / mr.total_monthly_reach) * ca.cost
               + (d.reach / mr.total_monthly_reach) * (mc.missing_cost / 11)
            WHEN d.channel = 'Paid Social' AND d.year = '2024' AND d.audience = 'HCP'
            THEN (d.reach / mr.total_monthly_reach) * ca.cost
               + (d.reach / mr.total_monthly_reach) * (mc.missing_cost / 9)
            ELSE (d.reach / mr.total_monthly_reach) * ca.cost END AS cost
FROM all_hcp_unioned d
JOIN monthly_reach mr ON d.year = mr.year AND d.month = mr.month AND d.channel = mr.channel
JOIN channel_allocations ca ON d.year = ca.year AND d.month = ca.month AND d.channel = ca.channel
LEFT JOIN missing_cost_channel_year mc
  ON d.year = mc.year AND d.channel = mc.channel AND d.audience = mc.audience
"""

# The 6-channel union (stage_1:1130-1160): month is coerced to
# VARCHAR across the union (SURVEY §4 quirk 4), mirrored explicitly
# here because DuckDB's set-op typing differs from Spark's.
_DIGITAL_COLS = (
    "brand, channel, audience, year, CAST(month AS VARCHAR) AS month, "
    "zip_code, dma, state, country, reach, engage, cost"
)
DIGITAL_SQL = "\nUNION ALL\n".join(
    f"SELECT {_DIGITAL_COLS} FROM ({part}) t{i}"
    for i, part in enumerate(
        [DTC_DISPLAY_SQL, DTC_PAID_SEARCH_SQL, DTC_POC_SQL, DTC_PAID_SOCIAL_SQL,
         HCP_SEARCH_SQL, HCP_ALL_SQL]
    )
)


# --------------------------------------------------------------- queries
def _r4_doubles(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    return df.select(
        *[F.round(c, 4).alias(c) if c in cols else F.col(c) for c in df.columns]
    )


def q_pipeline_tam_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end TAM reconstruction (stage_1:93-225) on the
    reference-shaped fixture inputs: vintage union → MDM/HCP joins →
    display-order CASE → inline cost pots → expression-key join →
    window allocation → final agg. sf_dir is unused — the inputs are
    the synthesized reference-shaped tables, not the star schema."""
    out = nvs_tam(spark, _load_tables(spark))
    return _r4_doubles(out, ("reach", "engage", "cost"))


def q_pipeline_digital_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end 6-channel digital union (stage_1:227-1128 + the
    union at 1130-1160) on the reference-shaped fixture inputs,
    including the missing-cost /11 and /9 redistribution and the
    month INT→STRING union coercion."""
    out = nvs_digital(spark, _load_tables(spark))
    return _r4_doubles(out, ("reach", "engage", "cost"))


def _rounded_oracle(sql: str, cols: str) -> str:
    return f"SELECT {cols} FROM (\n{sql}\n) final_q"


ORACLE_PIPELINE_TAM = _sourced(
    _rounded_oracle(
        TAM_SQL,
        "product_brand_name, source, year_month, zip, audience, channel, "
        "ROUND(reach, 4) AS reach, ROUND(engage, 4) AS engage, ROUND(cost, 4) AS cost",
    )
)

ORACLE_PIPELINE_DIGITAL = _sourced(
    _rounded_oracle(
        DIGITAL_SQL,
        "brand, channel, audience, year, month, zip_code, dma, state, country, "
        "ROUND(reach, 4) AS reach, ROUND(engage, 4) AS engage, ROUND(cost, 4) AS cost",
    )
)

QUERIES = {
    "pipeline_tam_e2e": q_pipeline_tam_e2e,
    "pipeline_digital_e2e": q_pipeline_digital_e2e,
}

ORACLES = {
    "pipeline_tam_e2e": ORACLE_PIPELINE_TAM,
    "pipeline_digital_e2e": ORACLE_PIPELINE_DIGITAL,
}
