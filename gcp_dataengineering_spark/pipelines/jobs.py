"""Job runners — the reference's write/audit protocol around the two
pipelines (``stage_1_hcp_channel_all_hardcode.py:183-225,
1085-1128, 1227-1304``), minus the AWS control-plane plumbing
(Athena metadata probe → filesystem check; Glue crawler → no-op,
parquet self-describes).

Protocol per output table: persist → count (audit) → coalesce(8)
snapshot overwrite → max(version)+1 stamped partitioned history
append → audit rows appended.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import (
    append_audit,
    audit_rows,
    write_snapshot,
    write_versioned_history,
)
from .digital import nvs_digital
from .tam import nvs_tam


def run_table_job(
    spark: SparkSession,
    df: DataFrame,
    out_root: str,
    table_name: str,
    batch_id: str = "local",
    etl_script: str = "gcp_dataengineering_spark",
) -> dict:
    """The persist/count/snapshot/history/audit protocol for one
    output table. Returns the audit summary."""
    start = datetime.now(timezone.utc)
    persisted = df.persist()
    try:
        n = persisted.count()
        snapshot_path = os.path.join(out_root, f"{table_name}_staging")
        write_snapshot(persisted, snapshot_path)
        hist_path = os.path.join(out_root, f"{table_name}_historical")
        version = write_versioned_history(persisted, spark, hist_path)
        audit_path = os.path.join(out_root, "audit_job_info")
        end = datetime.now(timezone.utc)
        for tbl, status in ((f"{table_name}_staging", "COMPLETED"),
                            (f"{table_name}_historical", "COMPLETED")):
            append_audit(
                audit_rows(spark, tbl, n, status, etl_script, "normalized",
                           batch_id, start, end),
                audit_path,
            )
        return {
            "table": table_name,
            "rows": n,
            "version": version,
            "snapshot": snapshot_path,
            "history": hist_path,
        }
    finally:
        persisted.unpersist()


def run_tam_job(spark: SparkSession, tables: dict[str, DataFrame], out_root: str,
                batch_id: str = "local") -> dict:
    return run_table_job(spark, nvs_tam(spark, tables), out_root,
                         "mars_tam_nvs", batch_id)


def run_digital_job(spark: SparkSession, tables: dict[str, DataFrame], out_root: str,
                    batch_id: str = "local") -> dict:
    return run_table_job(spark, nvs_digital(spark, tables), out_root,
                         "mars_combined_nvs_data", batch_id)


def run_all(spark: SparkSession, tables: dict[str, DataFrame], out_root: str,
            batch_id: str = "local") -> list[dict]:
    """Entry point A (``stage_1:1261-1304``): audit INITIATED row →
    nvs_tam → nvs_digital → (crawler is a no-op on Spark: parquet
    self-describes) → audit COMPLETED rows. Returns the job
    summaries."""
    audit_path = os.path.join(out_root, "audit_job_info")
    append_audit(
        audit_rows(spark, "job", 0, "INITIATED", "gcp_dataengineering_spark",
                   "normalized", batch_id),
        audit_path,
    )
    results = [
        run_tam_job(spark, tables, out_root, batch_id),
        run_digital_job(spark, tables, out_root, batch_id),
    ]
    append_audit(
        audit_rows(spark, "job", sum(r["rows"] for r in results), "COMPLETED",
                   "gcp_dataengineering_spark", "normalized", batch_id),
        audit_path,
    )
    return results
