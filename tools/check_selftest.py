#!/usr/bin/env python3
"""Self-test for the gate comparator: proves tools/check.py's pandas-path
actually catches the DuckDB HUGEINT class that burned rounds 2-3.

Builds a tiny Spark-style parquet result (int64, what graft emits), then
compares it against (a) an UN-CAST DuckDB `SUM(int)` — which comes back
HUGEINT → pandas float64 → "3.0" vs "3" — and (b) the same SUM wrapped in
`CAST(... AS BIGINT)`. The un-cast side MUST mismatch and the cast side
MUST match, or the local gate has lost the very coercion it exists to
reproduce (e.g. someone reverts check.py to fetchall()).

Run: python3 tools/check_selftest.py   (exit 0 = comparator healthy)
"""
import os
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import canon  # noqa: E402


def main():
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as tmp:
        spark_side = os.path.join(tmp, "spark.parquet")
        # what Spark writes: an int64 aggregate column
        con.execute(
            "COPY (SELECT CAST(1 AS BIGINT) AS k, CAST(6 AS BIGINT) AS s) "
            f"TO '{spark_side}' (FORMAT PARQUET)")
        got = canon(con.sql(f"SELECT * FROM '{spark_side}'").df())

        uncast = canon(con.sql(
            "SELECT CAST(k AS BIGINT) AS k, SUM(v) AS s "
            "FROM (VALUES (1, 1), (1, 2), (1, 3)) t(k, v) GROUP BY k").df())
        cast = canon(con.sql(
            "SELECT CAST(k AS BIGINT) AS k, CAST(SUM(v) AS BIGINT) AS s "
            "FROM (VALUES (1, 1), (1, 2), (1, 3)) t(k, v) GROUP BY k").df())

    # typeof check: the premise (un-cast SUM is HUGEINT) must still hold
    hugeint = con.sql("SELECT typeof(SUM(CAST(1 AS BIGINT)))").fetchone()[0]
    assert hugeint == "HUGEINT", f"premise changed: SUM now returns {hugeint}"

    assert got[0] != uncast[0], (
        "comparator REGRESSION: un-cast HUGEINT SUM compared equal to int64 — "
        f"the gate would pass a q47/q48-class bug (got {got[0]} vs {uncast[0]})")
    assert got[0] == cast[0], (
        f"CAST(... AS BIGINT) side must match exactly: {got[0]} vs {cast[0]}")
    assert got[2] == cast[2], f"dtypes must match after cast: {got[2]} vs {cast[2]}"
    print("selftest OK: un-cast integral SUM is caught; cast side matches exactly")


if __name__ == "__main__":
    main()
