#!/usr/bin/env python3
"""Fixture self-tests for scripts/check_oracle.py (dev tooling only).

check_oracle.py is a reverse-engineered replica of the driver's
stringify-sort-hash comparator — the wall between local green and driver
red. Its protocol was inferred from round artifacts (the decimal
trailing-zero repr that kept rel_compact red for three rounds, the
pandas-ISO midnight-date rendering, the numpy-bool/str coercion rules),
and any quiet drift in the replica would silently desync local
verification from the driver again. These fixtures PIN the replica's
classifications on planted disagreements: each case writes a Spark-dump
parquet exactly the way graft.Verify does (pyarrow types preserved) and
an oracle SQL of literals, then asserts the replica classifies the pair
the way the driver protocol demands.

The `decimal_trailing_zero` case is the archived regression fixture for
the r10-era red: a DECIMAL(18,2) Spark dump cell landing on a trailing
zero ("506627.00") against DuckDB's float64 rendering ("506627.0") —
equal values, driver hash mismatch. It must classify HASH-only forever;
if it ever reports OK, the replica has regressed to the pre-r11 value
comparison that hid the driver red.

Usage: python3 scripts/check_oracle_selftest.py   (exit 0 = all pinned)
"""
import contextlib
import decimal
import io
import json
import os
import shutil
import sys
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle

# Any sf dir works: the fixture oracle SQLs are literal SELECTs and never
# touch the tables; main() only needs the view DDL to succeed.
SF_DIR = "/root/testdata/sf0.001"


def spark_dump(out_dir, name, table: pa.Table):
    d = os.path.join(out_dir, name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "part-0.parquet"))


def run(cases):
    """cases: name -> (pyarrow table, oracle sql). Returns {name: line}."""
    out_dir = tempfile.mkdtemp(prefix="oracle_selftest_")
    try:
        for name, (table, _) in cases.items():
            spark_dump(out_dir, name, table)
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump({n: sql for n, (_, sql) in cases.items()}, f)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            check_oracle.main(SF_DIR, out_dir)
        lines = {}
        for line in buf.getvalue().splitlines():
            line = line.strip()
            for prefix in ("OK   ", "FAIL "):
                if line.startswith(prefix):
                    rest = line[len(prefix):]
                    qname = rest.split(" ")[0].split(":")[0]
                    lines[qname] = line
        return lines
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def main():
    dec = pa.array([decimal.Decimal("506627.00"), decimal.Decimal("1.50")],
                   type=pa.decimal128(18, 2))
    cases = {
        # --- the archived r10-era red: equal values, driver hash mismatch.
        "decimal_trailing_zero": (
            pa.table({"v": dec}),
            "SELECT CAST(506627.00 AS DECIMAL(18,2)) AS v "
            "UNION ALL SELECT CAST(1.50 AS DECIMAL(18,2))"),
        # --- a decimal that does NOT land on a trailing zero renders the
        # same on both sides and must stay green (the fix guidance is
        # "change the output surface", not "decimals always fail").
        "decimal_no_trailing_zero": (
            pa.table({"v": pa.array([decimal.Decimal("2.25")],
                                    type=pa.decimal128(18, 2))}),
            "SELECT CAST(2.25 AS DECIMAL(18,2)) AS v"),
        # --- midnight timestamps render as their DATE (pandas-ISO): a
        # Spark TIMESTAMP column against a DuckDB DATE is green.
        "midnight_timestamp_vs_date": (
            pa.table({"d": pa.array([pd.Timestamp("2024-03-01")],
                                    type=pa.timestamp("us"))}),
            "SELECT DATE '2024-03-01' AS d"),
        # --- a non-midnight timestamp against a DATE is a real mismatch.
        "non_midnight_timestamp_vs_date": (
            pa.table({"d": pa.array([pd.Timestamp("2024-03-01 01:00:00")],
                                    type=pa.timestamp("us"))}),
            "SELECT DATE '2024-03-01' AS d"),
        # --- NaN == NaN under the driver protocol (both render "nan").
        "nan_agrees": (
            pa.table({"v": pa.array([float("nan"), 1.0])}),
            "SELECT CAST('nan' AS DOUBLE) AS v UNION ALL SELECT 1.0"),
        # --- bools compare as strings, NEVER coerce to numbers: True vs 1
        # is a VALUE mismatch, not a rendering one (numpy.bool_ is not a
        # Python bool — the coercion trap the numeric() docstring pins).
        "bool_vs_int": (
            pa.table({"v": pa.array([True])}),
            "SELECT 1 AS v"),
        "bool_agrees": (
            pa.table({"v": pa.array([True, False])}),
            "SELECT true AS v UNION ALL SELECT false"),
        # --- '1' vs '1.0' as STRINGS is a genuine VALUE difference; a
        # float() coercion would mislabel it rendering-only.
        "string_one_vs_one_point_zero": (
            pa.table({"v": pa.array(["1"])}),
            "SELECT '1.0' AS v"),
        # --- int64 dump vs float64 oracle (a NULL anywhere floats the
        # whole pandas column): equal values, rendering-only difference.
        "int_vs_floated_column": (
            pa.table({"v": pa.array([3, None], type=pa.int64())}),
            "SELECT 3 AS v UNION ALL SELECT NULL"),
        # --- row-count and column-name disagreements fail structurally.
        "row_count_mismatch": (
            pa.table({"v": pa.array([1, 2], type=pa.int64())}),
            "SELECT CAST(1 AS BIGINT) AS v"),
        "column_name_mismatch": (
            pa.table({"sum_qty": pa.array([1], type=pa.int64())}),
            "SELECT CAST(1 AS BIGINT) AS \"sum(l_quantity)\""),
        # --- near-equal floats (12-sig-digit sort alignment): the sorted
        # rows align and the 1e-9 tolerance calls the values equal.
        "float_thirteenth_digit": (
            pa.table({"v": pa.array([0.1234567890123, 2.0])}),
            "SELECT 0.1234567890124 AS v UNION ALL SELECT 2.0"),
    }
    expect = {
        "decimal_trailing_zero": "HASH-only",
        "decimal_no_trailing_zero": "OK",
        "midnight_timestamp_vs_date": "OK",
        "non_midnight_timestamp_vs_date": "VALUE mismatch",
        "nan_agrees": "OK",
        "bool_vs_int": "VALUE mismatch",
        "bool_agrees": "OK",
        "string_one_vs_one_point_zero": "VALUE mismatch",
        "int_vs_floated_column": "OK",
        "row_count_mismatch": "rows 2 != 1",
        "column_name_mismatch": "cols",
        "float_thirteenth_digit": "HASH-only",
    }
    lines = run(cases)
    failures = []
    for name, want in sorted(expect.items()):
        got = lines.get(name)
        if got is None:
            failures.append(f"{name}: no classification line produced")
            continue
        ok = (want == "OK" and got.startswith("OK")) or \
             (want != "OK" and got.startswith("FAIL") and want in got)
        status = "ok " if ok else "BAD"
        print(f"  {status} {name}: expect [{want}] got [{got[:90]}]")
        if not ok:
            failures.append(f"{name}: expected [{want}], got [{got}]")
    if failures:
        print(f"{len(failures)} fixture(s) DISAGREE with the pinned protocol:")
        for f in failures:
            print(f"  {f}")
        return 1
    print(f"{len(expect)}/{len(expect)} comparator fixtures pinned")
    return 0


if __name__ == "__main__":
    sys.exit(main())
