"""Pipeline parity tests: the DataFrame-native reconstructions must
produce exactly what the reference's SQL produces. DuckDB runs an
ANSI translation of the reference queries (stage_1:93-1084) over the
SAME synthesized inputs; results are compared order-insensitively
with doubles rounded to 4 decimals.
"""

from __future__ import annotations

from gcp_dataengineering_spark.pipelines.digital import (
    dtc_display,
    dtc_paid_search,
    dtc_paid_social,
    dtc_poc,
    hcp_all_channels,
    hcp_paid_search,
    nvs_digital,
)
from gcp_dataengineering_spark.pipelines.jobs import run_tam_job
from gcp_dataengineering_spark.pipelines.tam import nvs_tam


def _norm(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 4)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def assert_matches_sql(df, duck, sql):
    srows = [tuple(r) for r in df.collect()]
    res = duck.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(df.columns) == sorted(ocols), (sorted(df.columns), sorted(ocols))
    sn, on = _norm(srows, df.columns), _norm(orows, ocols)
    assert len(sn) == len(on), (len(sn), len(on))
    for a, b in zip(sn, on):
        assert a == b, (a, b)


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


def test_tam_parity(spark, ref_tables, duck):
    assert_matches_sql(nvs_tam(spark, ref_tables), duck, TAM_SQL)


def _dtc_sql(
    union_sql: str,
    channel: str,
    engage_expr: str,
    costs_sql: str,
    join_kw: str,
    group_tail: str = "1, 2, 3, 4, 5, 6",
) -> str:
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


def test_dtc_display_parity(spark, ref_tables, duck):
    union_sql = """
    SELECT year_mth, dma_region, dma_code, impressions, clicks FROM display_v1
    WHERE year_mth BETWEEN 202201 AND 202212
    UNION ALL
    SELECT year_mth, dma_region, dma_code, impressions, clicks FROM display_v2
    WHERE year_mth BETWEEN 202301 AND 202312
    UNION ALL
    SELECT year_mth, dma_region, dma_code, impressions, clicks FROM display_v3
    WHERE year_mth >= 202401
    """
    sql = _dtc_sql(
        union_sql, "Display", "SUM(CAST(clicks AS DOUBLE))",
        _legacy_costs_sql("dtc_display_") + " UNION ALL " + _unpivot_costs_sql("DIGITAL DISPLAY"),
        "INNER",
    )
    assert_matches_sql(dtc_display(spark, ref_tables), duck, sql)


def test_dtc_paid_search_parity(spark, ref_tables, duck):
    union_sql = """
    SELECT year_mth, dma_name, dma_code, impressions, clicks FROM search_v1
    WHERE year_mth BETWEEN 202201 AND 202212
    UNION ALL
    SELECT year_mth, dma_name, dma_code, impressions, clicks FROM search_v2
    WHERE year_mth BETWEEN 202301 AND 202312
    UNION ALL
    SELECT year_mth, dma_name, dma_code, impressions, clicks FROM search_v3
    WHERE year_mth >= 202401
    """
    sql = _dtc_sql(
        union_sql, "Paid Search", "SUM(CAST(clicks AS DOUBLE))",
        _legacy_costs_sql("dtc_search") + " UNION ALL " + _unpivot_costs_sql("PAID SEARCH"),
        "INNER",
    )
    assert_matches_sql(dtc_paid_search(spark, ref_tables), duck, sql)


def test_dtc_poc_parity(spark, ref_tables, duck):
    union_sql = """
    SELECT year_mth, dma, dma_code, impressions FROM poc_v1
    WHERE year_mth BETWEEN 202201 AND 202212
    UNION ALL
    SELECT year_mth, dma, dma_code, impressions FROM poc_v2
    WHERE year_mth BETWEEN 202301 AND 202312
    UNION ALL
    SELECT year_mth, dma, dma_code, impressions FROM poc_v3
    WHERE year_mth >= 202401
    """
    sql = _dtc_sql(
        union_sql, "Point of Care", "CAST(NULL AS DOUBLE)",
        _legacy_costs_sql("dtc_poc"), "LEFT",
        group_tail="1, 2, 3, 4, 5, 6, 7, 8, 9",
    )
    assert_matches_sql(dtc_poc(spark, ref_tables), duck, sql)


def test_dtc_paid_social_parity(spark, ref_tables, duck):
    union_sql = """
    SELECT dma_code, dma_name, year_mth, impressions, clicks FROM social_v1
    WHERE year_mth BETWEEN 202201 AND 202212
    UNION ALL
    SELECT dma_code, dma_name, year_mth, impressions, clicks FROM social_v2
    WHERE year_mth >= 202301
    """
    sql = _dtc_sql(
        union_sql, "Paid Social", "SUM(CAST(clicks AS DOUBLE))",
        _legacy_costs_sql("dtc_social", cutoff=False), "LEFT",
    )
    assert_matches_sql(dtc_paid_social(spark, ref_tables), duck, sql)


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


def test_hcp_paid_search_parity(spark, ref_tables, duck):
    assert_matches_sql(hcp_paid_search(spark, ref_tables), duck, HCP_SEARCH_SQL)


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


def test_hcp_all_channels_parity(spark, ref_tables, duck):
    assert_matches_sql(hcp_all_channels(spark, ref_tables), duck, HCP_ALL_SQL)


def test_digital_union_schema_and_rows(spark, ref_tables):
    df = nvs_digital(spark, ref_tables)
    assert df.columns == [
        "brand", "channel", "audience", "year", "month", "zip_code", "dma",
        "state", "country", "reach", "engage", "cost",
    ]
    # month coerced to string across the union (SURVEY §4 quirk 4)
    assert dict(df.dtypes)["month"] == "string"
    n = df.count()
    parts = sum(
        fn(spark, ref_tables).count()
        for fn in (dtc_display, dtc_paid_search, dtc_poc, dtc_paid_social,
                   hcp_paid_search, hcp_all_channels)
    )
    assert n == parts > 0


def test_tam_job_protocol(spark, ref_tables, tmp_path):
    """Golden e2e: persist/count/snapshot/history/audit, twice →
    versions 1 then 2 and identical snapshot contents."""
    out = str(tmp_path / "out")
    r1 = run_tam_job(spark, ref_tables, out, batch_id="b1")
    r2 = run_tam_job(spark, ref_tables, out, batch_id="b2")
    assert (r1["version"], r2["version"]) == (1, 2)
    assert r1["rows"] == r2["rows"] > 0
    snap = spark.read.parquet(r1["snapshot"])
    hist = spark.read.parquet(r1["history"])
    assert snap.count() == r1["rows"]
    assert hist.count() == 2 * r1["rows"]
    audit = spark.read.parquet(str(tmp_path / "out" / "audit_job_info"))
    assert audit.count() == 4
