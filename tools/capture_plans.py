"""Capture .explain('formatted') for headline queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [key ...]
  tag     e.g. r18  -> writes plans/r18/<key>_<suffix>.txt
  suffix  e.g. before / after
  keys    default: every HEADLINE key bench.py knows

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) — the bench
scale. Queries that materialize intermediates eagerly run those jobs
during graph construction; the captured plan is the final consumer
plan (post-barrier), which is what the bench times after the barrier.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r18"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    want = set(sys.argv[3:])

    import bench
    from gcp_dataengineering_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture_plans")
    import __spark_entry__ as e

    qs = bench._bench_queries(e)
    keys = [k for k in bench.HEADLINE if k in qs and (not want or k in want)]
    for key in keys:
        try:
            df = qs[key](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{key}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(f"# {key} @ {sf_dir} ({suffix})\n")
                fh.write(buf.getvalue())
            print(f"ok   {key}", file=sys.stderr)
        except Exception as ex:  # capture the rest even if one breaks
            print(f"FAIL {key}: {ex}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
