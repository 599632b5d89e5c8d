"""Table registry — the engine's replacement for the reference's
Glue Data Catalog / Athena metadata / crawler plumbing.

The reference resolves ``database.table`` names from an INI config
(``stage_1_hcp_channel_all_hardcode.py:23-91``), checks table
existence via Athena ``list_table_metadata`` pagination
(``stage_1:195-208``) and re-derives schemas with a Glue crawler
after every write (``stage_1:1131-1224``, 20 s poll loop).

On Spark none of that machinery is needed: parquet is
self-describing, so "crawl" is ``spark.read.parquet`` schema
inference, and "catalog" is a name → path mapping registered as temp
views. This module provides exactly that, plus the medallion-layer
namespacing convention (landing / normalized / summarized,
``stage_1:55-57``) as plain name prefixes.

Scale note: at 100 TB the registry maps logical names to
*partitioned directory roots*; Spark's parquet source then does
partition pruning + predicate pushdown from the same declarative
plan — no per-table code changes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# The driver-provided fixture star schema (TESTDATA.md / FIXTURES.md §A).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class TableRegistry:
    """name → parquet path registry with lazy temp-view registration."""

    paths: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_dir(cls, sf_dir: str, tables: tuple[str, ...] = FIXTURE_TABLES) -> "TableRegistry":
        return cls({t: os.path.join(sf_dir, f"{t}.parquet") for t in tables})

    def add(self, name: str, path: str) -> None:
        self.paths[name] = path

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """S1 catalog table scan (``stage_1:98`` etc.) — parquet read.

        Column pruning and predicate pushdown are handled by Catalyst;
        callers should select/filter declaratively and let the scan
        shrink (check ``.explain`` → PushedFilters / ReadSchema).
        """
        return spark.read.parquet(self.paths[name])

    def register_all(self, spark: SparkSession) -> None:
        """S8 temp-view registration (``stage_1:183`` et al. — the
        reference uses the deprecated ``registerTempTable``)."""
        for name in self.paths:
            self.read(spark, name).createOrReplaceTempView(name)

    def table_exists(self, name: str) -> bool:
        """Replacement for the Athena list_table_metadata existence
        probe (``stage_1:195-208``): a filesystem check."""
        p = self.paths.get(name)
        return p is not None and os.path.exists(p)


def load_fixtures(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Convenience: read all fixture tables of one scale factor."""
    reg = TableRegistry.from_dir(sf_dir)
    return {t: reg.read(spark, t) for t in reg.paths}
