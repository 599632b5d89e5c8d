"""Local differential-test harness mimicking the driver's check:
for each key in queries(), run the Spark query and the DuckDB oracle
on the same sf dir and compare row-count + schema + order-insensitive
value hash.

Usage: python tools/compare.py [sf_dir] [key ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and print with enough digits to catch real drift
        if v == 0.0:
            v = 0.0
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as e
    from gcp_dataengineering_spark.session import get_spark

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = sorted(only - set(qs))
    if unknown:
        # a key outside the CURRENT rotation window would otherwise be
        # silently skipped and the run would print a false "0 failures"
        # (r13 verdict finding) — fail loudly, BEFORE paying the Spark
        # startup, so a wrong-parity invocation can't masquerade as a
        # green sweep
        print(
            f"FAIL unknown keys (not in this round's window): {unknown}\n"
            "  (rotation parity flips per round — run under the right "
            "SPARK_GRAFT_ROUND, or check suite/rotation.py groups)\n"
            f"\n{len(unknown)} failures: {unknown}"
        )
        sys.exit(1)

    spark = get_spark("compare", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for key, fn in qs.items():
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {key}: spark error: {ex}")
            failures.append(key)
            continue
        if key not in oracles:
            print(f"WEAK {key}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[key])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {key}: duckdb error: {ex}")
            failures.append(key)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh, oh = table_hash(srows, scols), table_hash(orows, ocols)
            if sh != oh:
                problems.append("value-hash mismatch")
                # show first differing sorted line for debugging
                so = sorted(
                    "\x01".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                )
                oo = sorted(
                    "\x01".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                    )
                    for r in orows
                )
                for a, b in zip(so, oo):
                    if a != b:
                        problems.append(f"  spark : {a[:200]}")
                        problems.append(f"  oracle: {b[:200]}")
                        break
        dt = time.time() - t0
        if problems:
            print(f"FAIL {key}: " + "; ".join(problems[:1]) + f" [{dt:.1f}s]")
            for p in problems[1:]:
                print(p)
            failures.append(key)
        else:
            print(f"OK   {key}: rows={len(srows)} [{dt:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
