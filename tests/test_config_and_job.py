"""Config plumbing (stage_1:23-40) + full-job orchestration
(entry point A, stage_1:1261-1304)."""

from __future__ import annotations

import pytest

from gcp_dataengineering_spark.config import (
    check_config_section,
    read_config_file,
    registry_from_config,
)
from gcp_dataengineering_spark.pipelines.jobs import run_all


def test_config_roundtrip(tmp_path, spark):
    ini = tmp_path / "configuration.ini"
    ini.write_text(
        "[dev]\norders = /root/testdata/sf0.001/orders.parquet\n"
        "lineitem = /root/testdata/sf0.001/lineitem.parquet\n"
    )
    cp = read_config_file(str(ini))
    check_config_section(cp, "dev")
    with pytest.raises(KeyError):
        check_config_section(cp, "prod")
    with pytest.raises(FileNotFoundError):
        read_config_file(str(tmp_path / "missing.ini"))
    reg = registry_from_config(cp, "dev")
    assert reg.table_exists("orders")
    assert reg.read(spark, "orders").count() > 0
    reg.register_all(spark)
    assert spark.sql("SELECT count(*) FROM lineitem").first()[0] > 0


def test_run_all_jobs(spark, ref_tables, tmp_path):
    out = str(tmp_path / "out")
    results = run_all(spark, ref_tables, out, batch_id="b-all")
    assert [r["table"] for r in results] == ["mars_tam_nvs", "mars_combined_nvs_data"]
    assert all(r["rows"] > 0 and r["version"] == 1 for r in results)
    audit = spark.read.parquet(f"{out}/audit_job_info")
    statuses = [r["log_id_status"] for r in audit.collect()]
    assert statuses.count("INITIATED") == 1
    assert statuses.count("COMPLETED") >= 5  # 2 per table job + final
