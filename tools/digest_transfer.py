#!/usr/bin/env python3
"""Dump-to-dump digest transfer for the heavy sf1 oracles.

Some past-cap oracle digests cost hours of DuckDB wall (q_dedup_ngram's
brute-force quadratic Jaccard: ~3.5 h at sf1). Once such an oracle has
DIGEST-PASSED against a Spark dump D_old, a FRESH dump D_new of the same
query at the same scale is verified by transitivity: if
digest(D_new) == digest(D_old) (all four fields of validate_scale's
order-independent digest: n, bit_xor fp, lo, hi) then
D_new == D_old == oracle as multisets. This script computes both dump
digests inside one DuckDB process using the SAME _digest_sql device and
prints TRANSFER-PASS/FAIL per query.

Usage: python3 tools/digest_transfer.py <newVerifyDir> <oldVerifyDir> q_a,q_b
"""
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from validate_scale import _digest_sql, _norm_exprs  # noqa: E402


def dump_digest(con, glob):
    src = f"read_parquet('{glob}')"
    cols = {r[0]: r[1]
            for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()}
    norm = _norm_exprs(cols, cols)
    return cols, con.execute(_digest_sql(cols, norm, src)).fetchone()


def main():
    new_dir, old_dir, names = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute("SET preserve_insertion_order=false")
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    fails = 0
    for q in names.split(","):
        cn, dn = dump_digest(con, f"{new_dir}/{q}/*.parquet")
        co, do = dump_digest(con, f"{old_dir}/{q}/*.parquet")
        if sorted(cn) != sorted(co):
            print(f"TRANSFER-FAIL {q}: schema drift new={sorted(cn)} "
                  f"old={sorted(co)}")
            fails += 1
        elif tuple(dn) != tuple(do):
            print(f"TRANSFER-FAIL {q}: new={tuple(dn)} old={tuple(do)}")
            fails += 1
        else:
            print(f"TRANSFER-PASS {q} ({dn[0]} rows, fp={dn[1]:#x} == "
                  f"r-verified dump)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
