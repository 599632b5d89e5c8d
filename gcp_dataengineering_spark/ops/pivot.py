"""Conditional-aggregation pivot / unpivot — SURVEY.md §2.4 A3, §2.7 U3.

The reference pivots a tall metric feed (rows tagged
'REACH'/'ENGAGEMENT') into wide columns with ``sum(case when metric
= 'REACH' then cast(value as double) end)``
(``stage_1_hcp_channel_all_hardcode.py:834-835``) — a manual PIVOT.
Both the faithful conditional-agg form and the idiomatic
``.pivot()`` form are provided; they produce identical results and
nearly identical plans (single hash aggregate, map-side partials).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conditional_pivot(
    df: DataFrame,
    group_by: Sequence[Column | str],
    metric_col: str,
    value_col: str,
    metrics: dict[str, str],
    value_cast: str = "double",
) -> DataFrame:
    """A3 — ``sum(case when metric = M then cast(value as double) end)
    as out_name`` per metric (``stage_1:834-835``).

    metrics: {metric_value: output_column_name}. One shuffle; each
    output column is a conditional sum inside the same aggregate.
    """
    aggs = [
        F.sum(
            F.when(F.col(metric_col) == m, F.col(value_col).cast(value_cast))
        ).alias(out)
        for m, out in metrics.items()
    ]
    return df.groupBy(*group_by).agg(*aggs)


def builtin_pivot(
    df: DataFrame,
    group_by: Sequence[str],
    metric_col: str,
    value_col: str,
    metrics: Sequence[str],
) -> DataFrame:
    """Idiomatic equivalent: ``groupBy(...).pivot(metric, values)``.
    Passing the explicit value list avoids the extra distinct-values
    job — at 100 TB the implicit distinct scan is a full pass."""
    return (
        df.groupBy(*group_by)
        .pivot(metric_col, list(metrics))
        .agg(F.sum(F.col(value_col).cast("double")))
    )


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "channel",
    value_name: str = "cost",
) -> DataFrame:
    """U3 consumer — wide → tall (the reference reads an already-
    unpivoted costs table ``nvs_costs_unpivot_03182025_staging``,
    ``stage_1:290-296``; this op produces that shape from the legacy
    wide table). Uses ``stack``: no shuffle, row-local expansion."""
    n = len(value_cols)
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    exprs = [*id_cols, f"stack({n}, {pairs}) as ({var_name}, {value_name})"]
    return df.selectExpr(*exprs)
