#!/usr/bin/env python3
"""Scale-rehearsal variant of validate.py: same comparator, but every
DuckDB oracle runs in a worker process with a wall-clock budget, so the
handful of deliberately brute-force oracles (quadratic n-gram joins,
recursive-CTE closures) time out and are SKIPPED-with-record instead of
grinding for hours at 10x fixtures. Spark-side outputs are still fully
read + canonicalized (sortability is part of the driver contract).

Usage: python3 tools/validate_scale.py <sfDir> <verifyOutDir> [timeout_s]
"""
import json
import multiprocessing as mp
import os
import sys

import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True).astype(str)


def run_oracle(sf_dir, sql, q):
    """Worker: evaluate one oracle; ship the canonicalized frame back."""
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")
    try:
        q.put(("ok", canon(con.execute(sql).fetch_df())))
    except Exception as e:
        q.put(("err", str(e)[:200]))


def main(sf_dir, out_dir, timeout_s):
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = n_timeout = 0
    timed_out = []
    for name, sql in sorted(oracles.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark-side read/sort error: {str(e)[:120]}")
            n_fail += 1
            continue
        q = mp.Queue()
        p = mp.Process(target=run_oracle, args=(sf_dir, sql, q))
        p.start()
        try:
            status, want = q.get(timeout=timeout_s)
        except Exception:
            p.terminate()
            p.join()
            print(f"SKIP {name}: oracle exceeded {timeout_s}s "
                  f"(brute-force oracle at scale — spark rows={len(got)})")
            n_timeout += 1
            timed_out.append(name)
            continue
        p.join()
        if status == "err":
            print(f"FAIL {name}: oracle error: {want}")
            n_fail += 1
            continue
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(
                f"cols got={list(got.columns)} want={list(want.columns)}")
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

    for name in sorted(os.listdir(out_dir)):
        if name in oracles or not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            df = canon(pd.read_parquet(f"{out_dir}/{name}"))
            print(f"PASS {name} (no oracle; {len(df)} rows, sortable)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: no-oracle output unreadable: {str(e)[:120]}")
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_timeout} oracle-timeout "
          f"({', '.join(timed_out)})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    sys.exit(main(sys.argv[1], sys.argv[2], t))
