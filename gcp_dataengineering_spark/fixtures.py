"""Deterministic reference-shaped synthetic inputs (FIXTURES.md §B).

These are the inputs the reference job consumes (call files per
vintage, MDM/HCP dims, DMA demographics, media feeds, cost sheets —
shapes from ``stage_1_hcp_channel_all_hardcode.py:93-1128``),
synthesized deterministically (seeded PRNG) so the end-to-end
pipeline reconstructions can be differential-tested: the same tables
are registered in Spark AND DuckDB, and results must hash-match.

``ensure_parquet`` materializes them once per process under
``<repo>/.e2e_fixtures`` so a DuckDB oracle running in the same
process (or any process after import) can ``read_parquet`` the
identical bytes the Spark query read — the driver's CORRECTNESS
harness only pre-registers the ten testdata views, so the pipeline
e2e oracles source their reference-shaped inputs from these files.
"""

from __future__ import annotations

import os
import random

import pandas as pd

# bump when synth_inputs changes so stale fixture dirs are rewritten
FIXTURE_VERSION = "1"

# Static table list (synth_inputs().keys(), sorted) — kept as a
# constant so importers don't pay fixture synthesis just to learn the
# names; test_config_and_job asserts it stays in sync.
FIXTURE_TABLES = (
    "calls_v1", "calls_v2", "calls_v3", "calls_v4",
    "costs_unpivot", "costs_wide", "demographics",
    "display_v1", "display_v2", "display_v3",
    "hcp_all_monthly", "hcp_all_weekly", "hcp_org",
    "hcp_poc_monthly", "hcp_search_daily", "hcp_search_m1",
    "hcp_search_m2", "hcp_social_monthly", "mdm",
    "poc_v1", "poc_v2", "poc_v3",
    "search_v1", "search_v2", "search_v3",
    "social_v1", "social_v2",
)

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".e2e_fixtures")


def _money(n: float) -> str:
    return f"{n:,.0f}"


def synth_inputs() -> dict[str, pd.DataFrame]:
    """Deterministic reference-shaped inputs, covering the essential
    properties from FIXTURES.md §B: overlapping vintages, duplicate
    DMA rows, comma-grouped money, REACH/ENGAGEMENT metric rows,
    2024 cost pots with zero reach (missing-cost path), weeks ≥ 49
    (month-wrap), null npi/zip rows."""
    rng = random.Random(42)

    def calls(yrmos):
        rows = []
        for i, yrmo in enumerate(yrmos):
            for j in range(6):
                rows.append(
                    {
                        "npi_num": None if j == 5 else f"npi{j}",
                        "zip_cd": f"z{j % 3}",
                        "city": "c",
                        "state": "s",
                        "brand": "XOLAIR",
                        "yrmo": yrmo,
                        "call_p1": "1" if j % 3 == 0 else "0",
                        "call_p2": "1" if j % 3 == 1 else "0",
                        "call_p3": "1" if j % 3 == 2 else "0",
                        "calls": str(j),
                        "lunch_n_learn_calls": "1" if j == 4 else "0",
                    }
                )
        return pd.DataFrame(rows)

    # overlapping vintages: v1 also contains 2022H2 rows that its
    # predicate must exclude
    t = {
        "calls_v1": calls([202201, 202203, 202206, 202207, 202210]),
        "calls_v2": calls([202206, 202207, 202209, 202212]),
        "calls_v3": calls([202212, 202301, 202306, 202312]),
        "calls_v4": calls([202312, 202401, 202403]),
        "mdm": pd.DataFrame(
            [
                {"npi_number": f"npi{j}", "mdm_id": f"m{j}", "mdm_zip": f"{10000 + j}"}
                for j in range(5)
            ]
        ),
        "hcp_org": pd.DataFrame(
            [
                {
                    "mdm_id": f"m{j}",
                    "mdm_zip": f"{30000 + j}",
                    "product_brand_name": ["XOLAIR", "OTHER"] if j % 2 == 0 else ["OTHER"],
                }
                for j in range(5)
            ]
        ),
        "demographics": pd.DataFrame(
            [
                # duplicate rows on purpose (distinct matters)
                {"dma_code": str(500 + d), "dma_name": f"DMA_{d}", "zip": f"{20000 + d}"}
                for d in range(4)
                for _ in range(2)
            ]
        ),
    }

    def feed(yrmos, dma_col="dma_region", n_dma=4, clicks=True):
        rows = []
        for yrmo in yrmos:
            for d in range(n_dma):
                r = {
                    "year_mth": yrmo,
                    dma_col: f"DMA_{d}",
                    "dma_code": str(500 + d),
                    "impressions": str(rng.randint(100, 9999)),
                }
                if clicks:
                    r["clicks"] = str(rng.randint(1, 999))
                rows.append(r)
        return pd.DataFrame(rows)

    t["display_v1"] = feed([202201, 202206, 202212, 202301])  # 202301 excluded by pred
    t["display_v2"] = feed([202301, 202306, 202312])
    t["display_v3"] = feed([202401, 202403])
    t["search_v1"] = feed([202202, 202207], dma_col="dma_name")
    t["search_v2"] = feed([202302, 202308], dma_col="dma_name")
    t["search_v3"] = feed([202402], dma_col="dma_name")
    t["poc_v1"] = feed([202203, 202208], dma_col="dma", clicks=False)
    t["poc_v2"] = feed([202303], dma_col="dma", clicks=False)
    t["poc_v3"] = feed([202403], dma_col="dma", clicks=False)
    t["social_v1"] = feed([202204, 202209], dma_col="dma_name")
    t["social_v2"] = feed([202304, 202404], dma_col="dma_name")

    t["hcp_search_daily"] = pd.DataFrame(
        [
            {
                "dma_code": str(500 + d),
                "activity_date": f"2022-{m:02d}-{day:02d}",
                "impressions": str(rng.randint(50, 999)),
                "clicks": str(rng.randint(1, 99)),
            }
            for m in (1, 6, 12)
            for day in (1, 15)
            for d in range(3)
        ]
        # plus rows beyond the cutoff that the filter must drop
        + [
            {"dma_code": "500", "activity_date": "2023-01-05",
             "impressions": "99999", "clicks": "9"}
        ]
    )
    t["hcp_search_m1"] = feed([202301, 202307], dma_col="dma_name")[
        ["dma_code", "year_mth", "impressions", "clicks"]
    ]
    t["hcp_search_m2"] = feed([202401, 202402], dma_col="dma_name")[
        ["dma_code", "year_mth", "impressions", "clicks"]
    ]

    # weekly tall feed: weeks incl >= 49 (month-wrap) + null zips
    weekly_rows = []
    for yrwk in (202302, 202318, 202349, 202352):
        for ch in ("EHR", "3RD_PARTY_EMAIL", "POC", "DISPLAY", "VIDEO", "CUSTOM", "ENDEMIC_SOCIAL"):
            for z in ("z1", "z2", None):
                for metric in ("REACH", "ENGAGEMENT"):
                    weekly_rows.append(
                        {
                            "channel": ch,
                            "yrwk": yrwk,
                            "zip_cd": z,
                            "metric": metric,
                            "value": str(rng.randint(10, 500)),
                        }
                    )
    # rows past the cutoff the filter must drop
    weekly_rows.append({"channel": "EHR", "yrwk": 202401, "zip_cd": "z1",
                        "metric": "REACH", "value": "12345"})
    t["hcp_all_weekly"] = pd.DataFrame(weekly_rows)

    def monthly(chs, yrmos, clicks=True):
        rows = []
        for ym in yrmos:
            for ch in chs:
                for d in range(3):
                    r = {
                        "dma_code": 500 + d,
                        "year_mth": ym,
                        "impressions": float(rng.randint(100, 999)),
                    }
                    if ch is not None:
                        r["ipmm_channel"] = ch
                    if clicks:
                        r["clicks"] = float(rng.randint(1, 99))
                    rows.append(r)
        return pd.DataFrame(rows)

    # NOTE: no 'Custom'/'Video' reach rows in 2024 monthly feeds →
    # Custom cost pots go unmatched → missing-cost path exercised
    t["hcp_all_monthly"] = monthly(
        ["EHR", "3rd Party Email", "Digital Display"], [202401, 202402]
    )
    t["hcp_poc_monthly"] = monthly([None], [202401, 202402], clicks=False)
    t["hcp_social_monthly"] = monthly([None], [202401, 202402])
    t["hcp_poc_monthly"] = t["hcp_poc_monthly"][["dma_code", "year_mth", "impressions"]]
    t["hcp_social_monthly"] = t["hcp_social_monthly"][
        ["dma_code", "year_mth", "impressions", "clicks"]
    ]

    t["costs_wide"] = pd.DataFrame(
        [
            {
                "date_month_": f"{y}-{m:02d}",
                "dtc_display_": _money(rng.randint(10000, 99999)),
                "dtc_search": _money(rng.randint(10000, 99999)),
                "dtc_poc": _money(rng.randint(10000, 99999)),
                "dtc_social": _money(rng.randint(10000, 99999)),
                "npp": _money(rng.randint(100000, 999999)),
            }
            for y in (2022, 2023, 2024)
            for m in range(1, 13)
        ]
    )
    t["costs_unpivot"] = pd.DataFrame(
        [
            {
                "year_month": ym,
                "audience": aud,
                "channel": ch,
                "cost": float(rng.randint(5000, 50000)),
            }
            for ym in (202401, 202402, 202403)
            for aud, chans in (
                ("DTC", ["Digital Display", "Paid Search", "POC", "Endemic Social"]),
                ("HCP", ["Digital Display", "Paid Search", "POC", "3rd Party Email",
                         "Endemic Social", "Online Video", "Video", "Custom", "EHR"]),
            )
            for ch in chans
        ]
    )
    return t


_ensured = False


def ensure_parquet() -> str:
    """Materialize the synthesized inputs as parquet under
    ``FIXTURE_DIR`` (idempotent per process; rewritten when the
    version marker is stale). Returns the directory path."""
    global _ensured
    marker = os.path.join(FIXTURE_DIR, ".version")
    if _ensured:
        return FIXTURE_DIR
    try:
        with open(marker) as fh:
            fresh = fh.read().strip() == FIXTURE_VERSION
    except OSError:
        fresh = False
    if not fresh:
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        # write-to-temp + atomic rename: two processes may race on the
        # first materialization (the driver runs Spark queries and
        # DuckDB oracles; both import this module). Content is
        # deterministic, so last-rename-wins is safe; a half-written
        # file is never visible under the final name.
        pid = os.getpid()
        for name, pdf in synth_inputs().items():
            final = os.path.join(FIXTURE_DIR, f"{name}.parquet")
            tmp = f"{final}.tmp.{pid}"
            pdf.to_parquet(tmp, index=False)
            os.replace(tmp, final)
        tmp_marker = f"{marker}.tmp.{pid}"
        with open(tmp_marker, "w") as fh:
            fh.write(FIXTURE_VERSION)
        os.replace(tmp_marker, marker)
    _ensured = True
    return FIXTURE_DIR


def fixture_path(name: str) -> str:
    return os.path.join(FIXTURE_DIR, f"{name}.parquet")
