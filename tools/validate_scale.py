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


def nrows(path):
    import glob
    import pyarrow.parquet as pq
    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in glob.glob(f"{path}/*.parquet"))


def check_one(name, sql, sf_dir, out_dir, timeout_s, max_rows):
    """One oracle check; returns ('PASS'|'FAIL'|'SKIP', message)."""
    n_out = nrows(f"{out_dir}/{name}")
    if n_out > max_rows:
        # a pandas stringify-sort of a 10^8-row pair table is not a
        # meaningful check (and its oracle is the quadratic one that
        # times out anyway) — record and move on
        return ("SKIP", f"SKIP {name}: spark output {n_out} rows > "
                f"{max_rows} row comparator cap")
    try:
        got = canon(pd.read_parquet(f"{out_dir}/{name}"))
    except Exception as e:
        return ("FAIL",
                f"FAIL {name}: spark-side read/sort error: {str(e)[:120]}")
    q = mp.Queue()
    p = mp.Process(target=run_oracle, args=(sf_dir, sql, q))
    p.start()
    try:
        status, want = q.get(timeout=timeout_s)
    except Exception:
        p.terminate()
        p.join()
        return ("SKIP", f"SKIP {name}: oracle exceeded {timeout_s}s "
                f"(brute-force oracle at scale — spark rows={len(got)})")
    p.join()
    if status == "err":
        return ("FAIL", f"FAIL {name}: oracle error: {want}")
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
        return ("FAIL", f"FAIL {name}: " + "; ".join(problems))
    return ("PASS", f"PASS {name} ({len(got)} rows)")


def main(sf_dir, out_dir, timeout_s, max_rows=5_000_000, workers=6):
    from concurrent.futures import ThreadPoolExecutor
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = n_timeout = 0
    timed_out = []
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs = {name: ex.submit(check_one, name, sql, sf_dir, out_dir,
                                timeout_s, max_rows)
                for name, sql in sorted(oracles.items())}
        for name in sorted(futs):
            status, msg = futs[name].result()
            print(msg, flush=True)
            if status == "PASS":
                n_pass += 1
            elif status == "FAIL":
                n_fail += 1
            else:
                n_timeout += 1
                timed_out.append(name)

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
