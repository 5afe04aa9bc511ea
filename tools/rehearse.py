#!/usr/bin/env python
"""Pre-driver dress rehearsal: run the driver's 50-key sample window
against the DuckDB oracles with a driver-style compare (row count +
sorted-column schema + stringified-cell values, which is dtype-strict:
an int64-vs-float64 divergence fails here before it can fail the gate).

Usage:  python tools/rehearse.py [sf_dir] [--all] [--only k1,k2]
(default sf0.01).  ``--all`` sweeps EVERY registered query, not just
the 50-key window — the below-fold queries only ever run at sf0.001
in the pytest sweep, so this is the one check that exercises them on
the gate corpus.  ``--only`` takes a comma-separated key list for a
quick driver-style check of specific queries.
Prints one OK/FAIL line per query and a JSON summary; exit code 1 on
any failure.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    argv = sys.argv[1:]
    only: list[str] | None = None
    if "--only" in argv:
        k = argv.index("--only")
        if k + 1 >= len(argv):
            print("usage: --only key1[,key2,...]")
            return 1
        only = [s for s in argv[k + 1].split(",") if s]
        argv = argv[:k] + argv[k + 2:]
    args = [a for a in argv if a != "--all"]
    sweep_all = "--all" in argv
    sf = args[0] if args else "/root/testdata/sf0.01"
    import duckdb

    import __spark_entry__ as entry
    from flink_dsl_spark import get_session

    spark = get_session("rehearse")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")

    results = {}
    if only is not None:
        missing = [k for k in only if k not in qs]
        if missing:
            print(f"unknown keys: {', '.join(missing)}")
            return 1
        todo = only
    else:
        todo = list(qs) if sweep_all else list(qs)[:50]
    for name in todo:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf).toPandas()
            o = oracles.get(name)
            if o is None:
                # No oracle: "ran without error" only — NOT a value
                # check.  Printed as RAN and counted separately so the
                # summary can't be read as 187 value-verified keys.
                results[name] = {"rows": len(sdf), "oracle": None,
                                 "ok": True, "run_only": True}
                continue
            odf = con.sql(o).df()
            cols_s, cols_o = sorted(sdf.columns), sorted(odf.columns)
            schema_ok = cols_s == cols_o
            a = (sdf[cols_s].sort_values(cols_s).reset_index(drop=True)
                 if schema_ok else sdf)
            b = (odf[cols_o].sort_values(cols_o).reset_index(drop=True)
                 if schema_ok else odf)
            vals_ok = bool(
                schema_ok and len(a) == len(b) and all(
                    (a[c].astype(str).values ==
                     b[c].astype(str).values).all() for c in a.columns))
            results[name] = {"rows": len(sdf), "oracle": len(odf),
                             "schema": schema_ok, "values": vals_ok,
                             "ok": vals_ok,
                             "sec": round(time.time() - t0, 2)}
        except Exception as ex:            # noqa: BLE001 — report, don't die
            results[name] = {"ok": False, "err": str(ex)[:300]}
        r = results[name]
        print(name,
              ("RAN (no oracle)" if r.get("run_only")
               else "OK" if r["ok"] else "FAIL"), flush=True)

    bad = [k for k, v in results.items() if not v["ok"]]
    run_only = sum(1 for v in results.values() if v.get("run_only"))
    print(json.dumps({"total": len(results),
                      "value_checked": len(results) - run_only,
                      "run_only": run_only, "failed": bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
