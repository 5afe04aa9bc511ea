#!/usr/bin/env python
"""Capture .explain('formatted') for headline queries into plans/r15/.

Usage: python tools/capture_plans.py <suffix> [query ...]
Writes plans/r15/<query>_<suffix>.txt for each query (default: the
bench HEADLINE set).  Plans only — nothing is executed, so timings are
not contaminated by a concurrently running suite.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    if len(sys.argv) < 2:
        print(__doc__.strip().splitlines()[2])   # the Usage line
        sys.exit(2)
    suffix = sys.argv[1]
    import bench
    import __spark_entry__ as entrymod
    from flink_dsl_spark import get_session

    names = sys.argv[2:] or list(bench.HEADLINE)
    spark = get_session("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"skip {name}: not in queries()")
            continue
        try:
            df = fn(spark, SF_DIR)
            if df.isStreaming:
                # streaming frames can't explain('formatted') pre-start
                # the same way; capture the analyzed/optimized text form
                txt = df._jdf.queryExecution().toString()
            else:
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 — record the failure
            txt = f"PLAN CAPTURE FAILED: {e!r}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt")


if __name__ == "__main__":
    main()
