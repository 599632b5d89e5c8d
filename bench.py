"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with the noop sink (no
driver-side collect — the data path stays distributed, as it must at
100 TB).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tam_flagship",
    "vintage_union",
    "window_allocation",
    "grouped_total_join",
    "multi_key_join",
    "conditional_pivot",
    "union_conform",
    "events_hourly",
    "missing_cost_full_join",
    "scalar_funcs",
    # llm ops (present once suite/llm.py is populated)
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_capped",
    "dedup_groups",
    "dedup_pipeline",
    "text_quality",
    "embedding_topk",
    "embedding_lsh",
    "dataset_split",
    "shard_plan",
    "corpus_rollup",
]


def _time_set(spark, qs, sf_dir: str, warm_dir: str, runs: int) -> dict[str, float]:
    """Best-of-N wall time per headline query at sf_dir, with a per-query
    codegen/JIT warmup pass at warm_dir: the generated code is identical
    across scale factors, so compile cost (5-20 s/query on this VM) is
    charged to warmup, not to the timed run — the steady-state number is
    the signal that scales to 100 TB."""
    times: dict[str, float] = {}
    for key in HEADLINE:
        fn = qs.get(key)
        if fn is None:
            continue
        if os.path.isdir(warm_dir) and warm_dir != sf_dir:
            try:
                fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception as ex:
                # a warmup failure usually means the timed run fails too —
                # make it visible instead of silently mis-charging codegen
                print(f"bench: warmup failed for {key}: {ex}", file=sys.stderr)
        # best-of-2 by default: this VM shows multi-second scheduler
        # jitter (observed 0.5s -> 15s swings on identical plans), and
        # best-of-N is the standard defense; BENCH_RUNS=1 for a quick
        # single pass
        best = float("inf")
        for _ in range(max(1, runs)):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[key] = round(best, 3)
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as e
    from gcp_dataengineering_spark.session import get_spark

    spark = get_spark("bench")
    qs = e.queries()

    # JVM/codegen warmup on a trivial action so q1 isn't charged for it
    spark.range(1000).selectExpr("sum(id)").collect()

    warm_dir = "/root/testdata/sf0.001"
    runs = int(os.environ.get("BENCH_RUNS", "2"))

    # Scaling-slope check: time the same set one decade smaller first.
    # slope[q] = t(sf) / t(sf/10); linear scaling gives <= ~10 (usually
    # far less here, where fixed scheduler latency dominates small
    # queries) — a ratio > 10 flags hidden super-linear behavior a
    # single-SF bench can't see. BENCH_SLOPE=0 disables the extra pass.
    lo_dir = os.environ.get("SPARK_GRAFT_SF_LO_DIR", "/root/testdata/sf0.01")
    do_slope = (
        os.environ.get("BENCH_SLOPE", "1") != "0"
        and os.path.isdir(lo_dir)
        and os.path.realpath(lo_dir) != os.path.realpath(sf_dir)
    )
    times_lo: dict[str, float] = {}
    if do_slope:
        times_lo = _time_set(spark, qs, lo_dir, warm_dir, runs)

    times = _time_set(spark, qs, sf_dir, warm_dir, runs)

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    if do_slope:
        sf_lo = float(os.path.basename(lo_dir.rstrip("/")).replace("sf", "") or 0.01)
        slope = {
            k: round(times[k] / times_lo[k], 2)
            for k in times
            if k in times_lo and times_lo[k] > 0
        }
        out["sf_lo"] = sf_lo
        out["queries_lo"] = times_lo
        out["slope"] = slope
        out["superlinear"] = sorted(
            k for k, r in slope.items() if r > (sf / sf_lo) * 1.2
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
