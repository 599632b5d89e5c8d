"""Ordered-funnel analysis over event streams (beyond-reference
analytics on the events table): how far did each user get through a
REQUIRED SEQUENCE of steps (step k counts only if it happened after
an occurrence of step k-1), and what are the per-step conversion
counts.

Implementation is a per-user ordered fold, expressed with
aggregation + array functions rather than a UDF or a self-join
chain:

- one groupBy(user) collects (ts, type) structs; array_sort orders
  them by time (ties break on event_type — callers wanting total
  determinism include a unique id in the order);
- an `aggregate` fold walks the ordered array once, advancing a
  step counter when the current event matches the next wanted step
  — O(events-per-user), all codegen'd.

Scale shape: ONE shuffle (the per-user groupBy with map-side
partial collect). The fold is linear per user; the collected array
is bounded by a user's own event count — the same per-key-bounded
state assumption every sessionizer makes. The funnel report is a
#steps-row aggregate on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(user, max_step): the number of funnel steps the user
    completed IN ORDER (0 = never did step one; len(steps) = full
    conversion). Repeats are fine; out-of-order occurrences of later
    steps are ignored until their turn."""
    if not steps:
        raise ValueError("steps must be a non-empty ordered list")
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")))
    )
    step_arr = F.array(*[F.lit(s) for s in steps])
    fold: Column = F.aggregate(
        ordered,
        F.lit(0),
        lambda acc, ev: F.when(
            (acc < len(steps)) & (ev["et"] == F.element_at(step_arr, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    return events.groupBy(F.col(user_col).alias("user_id")).agg(
        fold.cast("int").alias("max_step")
    )


def funnel_steps_windowed(
    events: DataFrame,
    steps: list[str],
    max_gap_s: float,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(user, max_step) where step k (k >= 2) counts only if it
    happened within ``max_gap_s`` seconds of the moment step k-1 was
    reached — real conversion windows, not just ordering. The fold
    carries struct(step, last_ts): entry (step 1) is unconstrained;
    an eligible next-step event outside the window does NOT advance,
    and because the array is time-sorted every later candidate is
    even further out, so the user's funnel freezes there — which is
    exactly "did not convert within T".

    Same scale shape as funnel_steps: ONE shuffle, O(events/user)
    codegen'd fold, no UDF, no self-join chain.
    """
    if not steps:
        raise ValueError("steps must be a non-empty ordered list")
    if max_gap_s <= 0:
        raise ValueError("max_gap_s must be positive")
    # ts normalizes through TIMESTAMP so the fold's double cast works
    # on timestamp_ntz inputs too (parquet sources produce ntz; ANSI
    # refuses ntz -> double directly)
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).cast("timestamp").alias("ts"),
                F.col(type_col).alias("et"),
            )
        )
    )
    step_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(
        F.lit(0).cast("int").alias("step"), F.lit(0.0).alias("last_ts")
    )
    fold: Column = F.aggregate(
        ordered,
        init,
        lambda acc, ev: F.when(
            (acc["step"] < len(steps))
            & (ev["et"] == F.element_at(step_arr, acc["step"] + 1))
            & (
                (acc["step"] == 0)
                | (ev["ts"].cast("double") - acc["last_ts"] <= max_gap_s)
            ),
            F.struct(
                (acc["step"] + 1).cast("int").alias("step"),
                ev["ts"].cast("double").alias("last_ts"),
            ),
        ).otherwise(acc),
        lambda acc: acc["step"],
    )
    return events.groupBy(F.col(user_col).alias("user_id")).agg(
        fold.cast("int").alias("max_step")
    )


def funnel_report(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_s: float | None = None,
) -> DataFrame:
    """Per-step conversion: (step, step_name, n_users) where n_users
    counted users reaching AT LEAST that step — the classic funnel
    chart input (monotone non-increasing by construction). Every
    declared step gets a row: a tier no user reached reports
    n_users = 0 rather than vanishing (a chart iterating the step
    list must not silently render a shorter funnel). With
    ``max_gap_s`` set, steps are additionally bound to the
    conversion window (funnel_steps_windowed)."""
    if max_gap_s is not None:
        per_user = funnel_steps_windowed(
            events, steps, max_gap_s, user_col, type_col, ts_col
        )
    else:
        per_user = funnel_steps(events, steps, user_col, type_col, ts_col)
    tiers = F.explode(
        F.sequence(F.lit(1), F.col("max_step"))
    )
    reached = per_user.filter(F.col("max_step") >= 1).select(
        tiers.alias("step")
    )
    counts = reached.groupBy("step").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    all_steps = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step bigint, step_name string"
    )
    return (
        all_steps.join(counts, "step", "left")
        .na.fill({"n_users": 0})
        .select("step", "step_name", "n_users")
    )
