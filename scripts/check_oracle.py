#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only, not
part of the engine). Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
loads each query's parquet dump, runs the oracle SQL in DuckDB against the
same sf tables, sorts columns by name + rows by value, and compares.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)


def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    ok, bad = [], []
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            bad.append((name, f"ERROR {e}"))
            continue
        if sorted(got_cols) != sorted(want_cols):
            bad.append((name, f"cols {sorted(got_cols)} != {sorted(want_cols)}"))
            continue
        g, w = table_key(got_rows, got_cols), table_key(want_rows, want_cols)
        if len(g) != len(w):
            bad.append((name, f"rows {len(g)} != {len(w)}"))
        elif g != w:
            diff = next(i for i in range(len(g)) if g[i] != w[i])
            bad.append((name, f"value mismatch at sorted-row {diff}:\n"
                              f"    spark:  {g[diff]}\n    duckdb: {w[diff]}"))
        else:
            ok.append((name, len(g)))
    for name, n in ok:
        print(f"  OK   {name} ({n} rows)")
    for name, msg in bad:
        print(f"  FAIL {name}: {msg}")
    print(f"{len(ok)}/{len(ok) + len(bad)} queries match")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
