"""Distribution statistics over groups (beyond-reference analytics;
complements io.profile_table's whole-table pass and the HLL distinct
sketches in llm_ops.corpus).

``group_quantiles`` is EXACT linear-interpolated quantiles via
Spark's built-in ``percentile`` aggregate — the same interpolation
DuckDB's ``quantile_cont`` uses, so an external engine reproduces
the numbers bit-for-bit (both compute v[lo] + frac*(v[hi]-v[lo]) on
the sorted group). Exact per-group quantiles sort within the
aggregation buffer: right for group sizes that fit an executor
(dimension-key groups). For corpus-scale single groups use the
integer-histogram quantile in llm_ops.corpus.keep_top_fraction_by_score
or approx_percentile — the documented tradeoff, not a missing case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    on: str | list[str],
    value_col: str,
    qs: list[float],
    prefix: str = "q",
) -> DataFrame:
    """One row per group with a column per requested quantile
    (``q25``-style names from the fraction), exact and
    deterministic. ONE hash-aggregation shuffle keyed on the group;
    the percentile buffer holds the group's values."""
    keys = [on] if isinstance(on, str) else list(on)
    if not qs:
        raise ValueError("qs must be a non-empty list of fractions")
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile fraction {q} outside [0, 1]")

    def _name(q: float) -> str:
        # clean percents name as q25; anything finer keeps the full
        # fraction with '.' -> '_' (q0_125) so nearby fractions can
        # never collide into duplicate column names
        pct = q * 100
        if pct == int(pct):
            return f"{prefix}{int(pct)}"
        return f"{prefix}{str(q).replace('.', '_')}"

    names = [_name(q) for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantile fractions in qs: {qs}")
    arr = F.percentile(F.col(value_col).cast("double"), F.array(*[F.lit(float(q)) for q in qs]))
    named = [
        F.element_at(F.col("_qarr"), i + 1).alias(name)
        for i, name in enumerate(names)
    ]
    return (
        df.groupBy(*keys)
        .agg(arr.alias("_qarr"))
        .select(*keys, *named)
    )
