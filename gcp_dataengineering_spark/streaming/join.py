"""Stream-stream time-bounded joins — the Structured Streaming form
of ops/temporal's batch temporal joins (SURVEY.md §2.9 upgrade
path: none in the reference, shipped as the capability any event
pipeline grows into).

A stream-stream inner join in Spark requires (a) watermarks on BOTH
sides, so the engine knows when buffered rows can never match again
and evicts them, and (b) a time-range condition, so the join state
per key is bounded by the range rather than unbounded history. The
join logic is SHARED between batch and streaming forms: the batch
form is checked against DuckDB-style semantics in pytest
(stream==batch equality via the memory sink), the streaming form
just wraps the same condition — correctness is checked once.

Scale shape: state per side is bounded by (watermark delay +
join range) × arrival rate per key partition; eviction is the
engine's, driven by the watermark, not a manual TTL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bounded_join_condition(
    left_alias: str,
    right_alias: str,
    on: str,
    left_ts: str,
    right_ts: str,
    before_s: float,
    after_s: float,
):
    """Join condition: same key, right timestamp within
    [left_ts - before_s, left_ts + after_s] (closed both ends)."""
    lk, rk = F.col(f"{left_alias}.{on}"), F.col(f"{right_alias}.{on}")
    # timestamp_ntz has no direct double cast (ANSI); bridge through
    # timestamp — the session is pinned UTC so ntz values round-trip
    lt = F.col(f"{left_alias}.{left_ts}").cast("timestamp").cast("double")
    rt = F.col(f"{right_alias}.{right_ts}").cast("timestamp").cast("double")
    return (
        (lk == rk)
        & (rt >= lt - F.lit(float(before_s)))
        & (rt <= lt + F.lit(float(after_s)))
    )


def time_bounded_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    before_s: float = 0.0,
    after_s: float = 3600.0,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams (or their batch twins) on a key with a
    time-range bound. For streaming inputs, both sides get the
    watermark (required for state eviction); batch inputs ignore
    withWatermark, so the SAME code path serves both — which is what
    lets pytest prove stream==batch. Column names must be disjoint
    except the key (rename upstream).

    Streaming supports inner joins unconditionally; left-outer needs
    the watermark on the right side (enforced here by watermarking
    both)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    clash = (set(left.columns) & set(right.columns)) - {on}
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")
    # watermarks require TIMESTAMP (not timestamp_ntz); the session is
    # pinned UTC so the normalization preserves the instant
    left = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    right = right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = time_bounded_join_condition("l", "r", on, left_ts, right_ts, before_s, after_s)
    joined = lw.join(rw, cond, "inner" if how == "inner" else "leftOuter")
    # the key appears on both sides; emit it once
    return joined.select(
        F.col(f"l.{on}").alias(on),
        *[F.col(f"l.{c}") for c in left.columns if c != on],
        *[F.col(f"r.{c}") for c in right.columns if c != on],
    )
