"""A/B attribution timing child (BENCH_ATTRIBUTION.md protocol).

Times a comma-separated set of suite keys from an ARBITRARY checkout
root (the working tree, or a git worktree of an older commit) with
exactly the recorded bench protocol: fresh JVM per invocation,
sf0.001 codegen warmup per query, N timed in-JVM runs at the target
sf (all runs reported, so the in-JVM steady-state curve is visible —
per the repo's JIT lore, fresh-JVM medians and steady state can
differ 3x on the heavy queries).

Usage:
  python tools/bench_ab.py <checkout_root> <key,key,...>
Env: SPARK_GRAFT_SF_DIR (default sf0.1), BENCH_RUNS (default 2).

Prints one JSON line: {key: {"best": s, "runs": [s, ...]}, ...}.
Run it 3x per root and take per-key medians of "best" — same
aggregation as BENCH_MEDIAN_RUNS.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    root = os.path.abspath(sys.argv[1])
    keys = [k for k in sys.argv[2].split(",") if k]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    runs = int(os.environ.get("BENCH_RUNS", "2"))

    sys.path.insert(0, root)
    os.chdir(root)
    import __spark_entry__ as e
    from gcp_dataengineering_spark.session import get_spark

    spark = get_spark("bench-ab")
    # full pair universe when the checkout has it (same reasoning as
    # bench.py: rotation must not hide keys); entry queries() for
    # older checkouts that predate the suite registry
    try:
        from gcp_dataengineering_spark.suite import _all_pairs

        qs, _ = _all_pairs()
        qs = dict(qs)
    except ImportError:
        qs = dict(e.queries())
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict[str, dict] = {}
    for key in keys:
        fn = qs[key]
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        per_run = []
        for _ in range(max(1, runs)):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            per_run.append(round(time.perf_counter() - t0, 3))
        out[key] = {"best": min(per_run), "runs": per_run}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
