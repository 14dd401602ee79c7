#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <verify_out_dir> <sf_dir>

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


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue

        ok = True
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            ok = False
        elif len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            ok = False
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
        if ok:
            print(f"PASS {name} ({len(exp)} rows)")
        else:
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle-checked queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
