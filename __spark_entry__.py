"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship query smoke at sf0.001 (rows > 0).
queries()         — one (spark, sf_dir) callable per implemented
                    operator from SURVEY.md §2 + llm_ops.
oracle_sql()      — matching DuckDB ANSI SQL per query key.

Implementation lives in gcp_dataengineering_spark/suite/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gcp_dataengineering_spark.suite import assemble

_QUERIES, _ORACLES = assemble()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _QUERIES["tam_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
