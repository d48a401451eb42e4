#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify output (parquet per query) against the DuckDB oracle SQL
(oracle_sql.json) over the same testdata parquet tables, compares:
row count, column names (sorted), and cell values (exact, after sorting
columns by name and rows by all values). Exits nonzero on any mismatch.

IMPORTANT: both sides are fetched through pandas (`rel.df()`), matching the
driver's comparator. This is what surfaces the DuckDB HUGEINT class: an
un-cast integral SUM comes back HUGEINT, pandas renders it float64, and the
stringified cells diverge from Spark's int64 ("3.0" vs "3"). The old
`fetchall()` path silently converted HUGEINT to Python int and hid the bug
from the local gate (round-2/3 q47/q48 finding).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cell(v):
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(cell(x) for x in v) + "]"
    if v is None:
        return "None"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    try:
        if pd.isna(v):
            return "None"
    except (TypeError, ValueError):
        pass
    return repr(v)


def canon(df):
    """Sort columns by name, then rows; stringify pandas cells for compare."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(cell(v) for v in r)
            for r in df.itertuples(index=False, name=None)]
    return sorted(rows), cols, [str(t) for t in df.dtypes]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            got_rows, got_cols, got_dt = canon(got_df)
            exp_rows, exp_cols, exp_dt = canon(con.sql(sql).df())
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
            print(f"FAIL {name}: first diff at sorted row {bad}:\n"
                  f"  got {got_rows[bad]}\n  exp {exp_rows[bad]}\n"
                  f"  dtypes got {got_dt} exp {exp_dt}")
            failed.append(name)
        else:
            if got_dt != exp_dt:
                print(f"WARN {name}: values match but dtypes differ: "
                      f"got {got_dt} exp {exp_dt}")
            print(f"OK   {name} ({len(got_rows)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
