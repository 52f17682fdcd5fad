#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/validate.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet dump produced by graft.Verify,
runs the matching SQL from oracle_sql.json in DuckDB over the same fixture
tables, and compares: row count, column names (sorted), and cell values
(exact; NaN==NaN; floats bit-compared; decimals by value+scale).

This mirrors SURVEY.md §5.2's differential-testing gate so mismatches are
caught before the driver runs.
"""
import json
import math
import sys
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, Decimal):
        return str(v)  # scale-sensitive on purpose
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if type(v).__name__ == "ndarray":  # list columns via fetch_df
        return tuple(norm(x) for x in v.tolist())
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_df()
            want = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols got={sorted(got.columns)} want={sorted(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows got={len(got)} want={len(want)}")
        else:
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            for ci, c in enumerate(got.columns):
                gv = [norm(v) for v in got[c].tolist()]
                wv = [norm(v) for v in want[c].tolist()]
                # pandas turns SQL NULL into NaN/None inconsistently
                gv = ["NULL" if v is None or v != v else v for v in gv]
                wv = ["NULL" if v is None or v != v else v for v in wv]
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(gv, wv)) if a != b]
                if bad:
                    i, a, b = bad[0]
                    problems.append(
                        f"col {c}: {len(bad)} diffs; first at row {i}: got={a!r} want={b!r}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
