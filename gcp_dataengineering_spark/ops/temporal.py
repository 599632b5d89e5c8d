"""Temporal joins Spark lacks as built-ins, re-expressed as
compositions of shuffle-bounded DataFrame ops (reference gap noted
in SURVEY.md §2.4 "Not present: range/as-of/interval joins"; the
composition patterns are the standard ones used by time-series
engines on top of sort-merge machinery).

- ``asof_join``: for each left row, the LATEST right row with
  ``right.ts <= left.ts`` per key (DuckDB/pandas "backward" ASOF).
  NOT a join in the executed plan at all: both sides are tagged and
  unioned, and one window pass per key carries the most recent
  right-side payload forward (last_value ignoreNulls). ONE shuffle
  on the key, no row explosion, no per-row probe — the sort-merge
  an ASOF needs, done by the window machinery Spark already has.

- ``interval_join``: match points to [start, end] intervals without
  a cross join: both sides are bucketed on a fixed time grid, the
  interval explodes to the (bounded) buckets it spans, and an
  equi-join on the bucket id does the pairing, refined by the exact
  range predicate. A point lives in exactly ONE bucket, so each
  matching (point, interval) pair is produced exactly once — no
  post-join dedup. Explosion factor = interval_span / bucket_width
  + 1, so choose the width near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_s: float | None = None,
    how: str = "left",
) -> DataFrame:
    """Backward as-of join: every left row picks the latest right row
    at-or-before its timestamp within the same key group (ties on the
    exact same timestamp match, like ``r.ts <= l.ts``). With
    ``tolerance_s``, matches older than the tolerance are nulled out.
    ``how='left'`` keeps unmatched left rows with NULL right columns;
    ``how='inner'`` drops them.

    Output: all left columns, plus each requested right column as
    ``<name>`` (must not collide with a left column name), plus
    ``_asof_ts`` (the matched right row's timestamp, NULL when no
    match).

    PRECONDITION: the right side must be unique on (keys..., right_ts).
    With duplicate (key, ts) right rows the carried payload is
    NONDETERMINISTIC — the tag-union window orders by (_ts, _side)
    only, so ``last(...ignorenulls)`` picks an arbitrary one of the
    tied rows (ADVICE r7). Deduplicate first (e.g. a row_number over
    (keys, ts, <tiebreak>) like ``scd2_build``'s tiebreak column) if
    the source can carry same-timestamp versions.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    clash = set(rcols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    reserved = {"_ts", "_side", "_lrow", "_asof_ts", "_asof_ts_in"}
    hit = (set(left.columns) | set(right.columns)) & reserved
    if hit:
        raise ValueError(
            f"input columns collide with asof_join internals: {sorted(hit)}"
        )

    # tag and union: right rows carry payload, left rows carry NULLs.
    # _side orders right (0) before left (1) at the same timestamp so
    # an exact-tie right row is visible to the left row (<= semantics).
    # _ts normalizes through TIMESTAMP: parquet sources commonly read
    # as timestamp_ntz, which ANSI refuses to cast straight to double
    lt = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast("timestamp").alias("_asof_ts_in"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in rcols],
    )
    rt = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        F.col(right_ts).cast("timestamp").alias("_asof_ts_in"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    u = lt.unionByName(rt)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        F.last("_asof_ts_in", ignorenulls=True).over(w).alias("_asof_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in rcols
        ],
    ).filter(F.col("_side") == 1)

    in_tol = (
        F.lit(True)
        if tolerance_s is None
        else (
            F.col("_ts").cast("double") - F.col("_asof_ts").cast("double")
            <= F.lit(float(tolerance_s))
        )
    )
    matched = F.col("_asof_ts").isNotNull() & in_tol
    out = carried.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        F.when(matched, F.col("_asof_ts")).alias("_asof_ts"),
        *[F.when(matched, F.col(f"_m_{c}")).alias(c) for c in rcols],
    )
    if how == "inner":
        out = out.filter(F.col("_asof_ts").isNotNull())
    return out


def rolling_aggregate(
    df: DataFrame,
    on: str | list[str],
    ts_col: str,
    value_col: str,
    window_s: float,
) -> DataFrame:
    """Trailing time-RANGE rolling stats per key: for every row, the
    count and sum of ``value_col`` over that key's rows in the
    CLOSED trailing window ``[ts - window_s, ts]`` (time-based, not
    row-based — gaps and bursts are handled correctly, and rows with
    equal timestamps are peers that always see each other).

    Adds ``n_in_window`` and ``sum_in_window``. One shuffle (the key
    partition); per-key state is bounded by the rows inside the time
    window — the same bound a streaming windowed agg would hold.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if window_s <= 0:
        raise ValueError(f"window_s ({window_s}) must be positive")
    if window_s != int(window_s):
        # int() truncation would silently shrink the window (0.5 -> a
        # zero-length frame); whole seconds are the supported grain
        raise ValueError(
            f"window_s ({window_s}) must be a whole number of seconds"
        )
    # rangeBetween takes integer bounds; the ORDER BY value stays
    # fractional-seconds double, so sub-second timestamps still order
    # and frame correctly against the integer window edge. The double
    # goes through TIMESTAMP first: parquet sources commonly read as
    # timestamp_ntz, which ANSI refuses to cast straight to double.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).cast("timestamp").cast("double"))
        .rangeBetween(-int(window_s), 0)
    )
    return df.withColumns(
        {
            "n_in_window": F.count(F.lit(1)).over(w).cast("long"),
            "sum_in_window": F.sum(F.col(value_col).cast("double")).over(w),
        }
    )


def scd2_build(
    changes: DataFrame,
    on: str | list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    tiebreak: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension intervals from a change log:
    one row per change with HALF-OPEN ``[valid_from, valid_to)`` —
    valid_to is the NEXT change's timestamp for the key (NULL =
    current row). For as-of dimension lookups pair with
    ``asof_join`` on ``valid_from`` (backward-latest IS the
    half-open containment, and NULL-ended current rows resolve
    correctly); do NOT feed the intervals to ``interval_join``,
    whose CLOSED [start, end] would double-match probes landing
    exactly on a change instant and drop every current row.

    ``tiebreak`` orders changes sharing an exact timestamp (e.g. a
    sequence/id column) so interval chaining is deterministic;
    without it the caller contract is unique (key, ts) per change
    (collapse with ops/compaction.latest_by_key_agg first if the
    feed can emit two versions at one instant). One shuffle (the
    key-partition window); lead() is O(1) per row.
    """
    keys = [on] if isinstance(on, str) else list(on)
    for c in (valid_from, valid_to):
        if c in changes.columns:
            raise ValueError(f"output column {c!r} already exists in changes")
    ts = F.col(ts_col).cast("timestamp")
    order = [ts.asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return changes.select(
        *[F.col(c) for c in changes.columns if c != ts_col],
        ts.alias(valid_from),
        F.lead(ts).over(w).alias(valid_to),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str] | None,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width_s: int = 3600,
    max_buckets_per_interval: int = 10_000,
    reversed_policy: str = "drop",
) -> DataFrame:
    """Match point rows to the [start, end] CLOSED intervals that
    contain them (optionally also keyed on ``on``). Produces one row
    per matching (point, interval) pair: all point columns + all
    interval columns (names must not collide).

    Malformed-interval policy: a REVERSED interval (start > end)
    matches no point by the closed-range definition; under the
    default ``reversed_policy="drop"`` it is excluded up front
    (documented contract, not an accident). Pass
    ``reversed_policy="strict"`` to route reversed intervals through
    the same runtime ``raise_error`` path as over-long spans so
    corrupt data fails the job instead of vanishing (ADVICE r7).
    NULL-bounded intervals are ALWAYS dropped, under both policies —
    an explicit filter in the plan, not an optimizer side effect:
    they satisfy no closed-range predicate, and a runtime raise for
    them is not reliably reachable anyway (Catalyst infers
    IsNotNull(start)/IsNotNull(end) from the containment refine and
    prunes such rows below any in-plan guard under default constraint
    propagation). Pre-validate with a separate query if null bounds
    must be fatal.

    Plan shape: interval explodes to its covered grid buckets
    (sequence over ints — bounded by span/width), point maps to its
    single bucket, then one equi-join on (keys..., bucket) + the
    exact range refine. No CartesianProduct at any size; the join is
    a plain shuffled/broadcast hash join on the bucket id.

    ``max_buckets_per_interval`` is the malformed-data guard: one
    corrupt interval reaching into year 2100 would otherwise explode
    to millions of grid rows and take the stage down. Intervals over
    the cap FAIL THE JOB with a clear message (runtime
    raise_error, since the data isn't known at plan time) — choose a
    wider bucket_width_s or pre-filter if such spans are legitimate.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    clash = set(points.columns) & set(intervals.columns) - set(keys)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")
    if "_bucket" in points.columns or "_bucket" in intervals.columns:
        raise ValueError(
            "input columns collide with interval_join internals: ['_bucket']"
        )
    if bucket_width_s < 1:
        raise ValueError(f"bucket_width_s ({bucket_width_s}) must be >= 1")
    if reversed_policy not in ("drop", "strict"):
        raise ValueError(
            f"reversed_policy ({reversed_policy!r}) must be 'drop' or 'strict'"
        )

    bw = F.lit(int(bucket_width_s))
    # double goes through TIMESTAMP (timestamp_ntz has no direct
    # double cast under ANSI; parquet sources commonly produce ntz)
    _sec = lambda c: F.col(c).cast("timestamp").cast("double")  # noqa: E731
    p_bucket = F.floor(_sec(point_ts) / bw).cast("long")
    iv_lo = F.floor(_sec(start_col) / bw).cast("long")
    iv_hi = F.floor(_sec(end_col) / bw).cast("long")

    p = points.withColumn("_bucket", p_bucket)
    span_ok = (iv_hi - iv_lo) < F.lit(int(max_buckets_per_interval))
    guarded_hi = F.when(span_ok, iv_hi).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval_join: interval spans >= {max_buckets_per_interval} "
                    f"buckets of {bucket_width_s}s (start="
                ),
                F.col(start_col).cast("string"),
                F.lit(", end="),
                F.col(end_col).cast("string"),
                F.lit("); widen bucket_width_s or pre-filter malformed intervals"),
            )
        ).cast("long")
    )
    if reversed_policy == "strict":
        # NULL-bounded rows are dropped EXPLICITLY here (by
        # construction — not left to Catalyst's inferred-IsNotNull
        # pushdown, which happens to prune them under default
        # constraint propagation but is an optimizer behavior, not a
        # contract). Reversed rows must then REACH the guard to fail
        # the job (a start<=end filter would silently drop them
        # first). The guard lives on sequence's FIRST argument:
        # codegen short-circuits the whole sequence to NULL when arg1
        # is NULL, so a guard on the second argument can be skipped.
        ok = F.col(start_col) <= F.col(end_col)
        guarded_lo = F.when(ok, iv_lo).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("interval_join: reversed interval (start="),
                    F.col(start_col).cast("string"),
                    F.lit(" > end="),
                    F.col(end_col).cast("string"),
                    F.lit(") under reversed_policy='strict'"),
                )
            ).cast("long")
        )
        iv = intervals.filter(
            F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
        ).withColumn("_bucket", F.explode(F.sequence(guarded_lo, guarded_hi)))
    else:
        iv = intervals.filter(
            F.col(start_col) <= F.col(end_col)
        ).withColumn("_bucket", F.explode(F.sequence(iv_lo, guarded_hi)))

    joined = p.join(iv, [*keys, "_bucket"]).filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_bucket")
