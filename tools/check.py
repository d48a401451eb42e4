#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify output (parquet per query) against the DuckDB oracle SQL
(oracle_sql.json) over the same testdata parquet tables, compares:
row count, column names (sorted), and cell values (exact, after sorting
columns by name and rows by all values). Exits nonzero on any mismatch.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, then rows; stringify cells for exact compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return repr(v)

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_rows, got_cols = canon(got_rel.fetchall(), got_rel.columns)
            exp_rel = con.sql(sql)
            exp_rows, exp_cols = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failed.append(name)
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            failed.append(name)
        elif len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rowcount {len(got_rows)} != {len(exp_rows)}")
            failed.append(name)
        elif got_rows != exp_rows:
            bad = next(i for i, (a, b) in enumerate(zip(got_rows, exp_rows)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:\n  got {got_rows[bad]}\n  exp {exp_rows[bad]}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(got_rows)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
