#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <verify_out_dir> <sf_dir> [summary_json]

With a third argument, also writes a machine-readable summary (the
committed CORRECTNESS_LOCAL.json — round-14 verdict item 2: the driver's
correctness artifact arrived empty once, and nothing in the repo could
prove the round was green without a judge re-run; this file is the
builder-side record refreshed at end-of-round).

Reads <verify_out_dir>/oracle_sql.json, registers the sf parquet tables in
DuckDB, runs each oracle SQL, and compares against the Spark result parquet
written by graft.Verify: row count, column names/types (sorted by name),
and exact values after sorting rows by all columns.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(out_dir: str, sf_dir: str, summary_path: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = 0
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            results[name] = {"pass": False, "reason": "oracle_sql_error"}
            failures += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            results[name] = {"pass": False, "reason": "spark_result_unreadable"}
            failures += 1
            continue

        ok = True
        reason = None
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            ok = False
            reason = "columns"
        elif len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            ok = False
            reason = "rows"
        else:
            cols = sorted(exp.columns)
            e = exp[cols].sort_values(cols).reset_index(drop=True)
            g = got[cols].sort_values(cols).reset_index(drop=True)
            for c in cols:
                ev, gv = e[c], g[c]
                if str(ev.dtype) != str(gv.dtype):
                    print(f"WARN {name}.{c}: dtype {gv.dtype} vs {ev.dtype}")
                neq = ~((ev == gv) | (ev.isna() & gv.isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"FAIL {name}.{c}: {int(neq.sum())}/{len(e)} values differ; "
                          f"first at row {i}: spark={gv[i]!r} oracle={ev[i]!r}")
                    ok = False
                    reason = f"values:{c}"
        results[name] = {"pass": ok, "rows": len(exp)} if ok else \
            {"pass": False, "reason": reason}
        if ok:
            print(f"PASS {name} ({len(exp)} rows)")
        else:
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle-checked queries pass")
    if summary_path:
        with open(summary_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "total": len(oracle),
                       "passed": len(oracle) - failures,
                       "queries": results}, f, indent=1, sort_keys=True)
        print(f"summary -> {summary_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
