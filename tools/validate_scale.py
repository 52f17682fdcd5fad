#!/usr/bin/env python3
"""Scale-rehearsal variant of validate.py: same comparator, but every
DuckDB oracle runs in a worker process with a wall-clock budget, so the
handful of deliberately brute-force oracles (quadratic n-gram joins,
recursive-CTE closures) time out and are SKIPPED-with-record instead of
grinding for hours at 10x fixtures. Spark-side outputs are still fully
read + canonicalized (sortability is part of the driver contract).

Usage: python3 tools/validate_scale.py <sfDir> <verifyOutDir> [timeout_s]
           [--digest-timeout S] [--workers N] [--force-digest]
           [--transfer-from PRIOR_VERIFIED_DIR]

`--transfer-from` names a prior verify dir whose dumps a previous gate
PASSED against: any oracle TIMEOUT in this run falls back to the
digest-transitivity check (DESIGN.md §15) — byte-identical oracle SQL
plus all-four-fields dump-digest equality reclassifies the timeout as
TRANSFER-PASS without re-running the hours-long oracle.

Outputs past the 5M-row comparator cap are no longer skipped (round 14):
they get an order-independent DIGEST comparison — count + bit_xor + the
summed 30-bit halves of a 60-bit hash over length-prefixed stringified
rows (the q_ingest_manifest device) — computed inside ONE DuckDB worker
over both the oracle SQL and read_parquet() of the Spark dump, so value
stringification is a single engine's and cancels. `--force-digest`
routes EVERY query through the digest path (the sf0.01 self-check that
proves the digest agrees with the frame comparator); `--digest-timeout`
gives the heavy past-cap oracles their own watchdog.

Sampled gate for the perpetual infeasible-oracle skips (round 13):

    python3 tools/validate_scale.py --sample <sfDir> <workDir> [timeout_s] \
        [--only q_a,q_b]

For each query in SAMPLE_SPECS this builds a deterministic SLICE of its
one scaling input table — predicate `(key % 10^7) % M = 0`, where 10^7
is GenScale.Span so every key-shifted mirror copy of a selected entity
(its whole dup group / basket / user) survives the cut together — runs
the Spark side (graft.Verify) against the sliced fixture dir, and then
runs the SAME DuckDB oracle SQL on the same slice. Small enough for the
quadratic oracles, real enough to catch engine divergence: the data is
drawn from the scale fixture itself, not regenerated.
"""
import json
import multiprocessing as mp
import os
import time
import subprocess
import sys

import pandas as pd

# GenScale.Span — mirror copies shift every key by c * 10^7, so the
# composite predicate keeps entity groups (dup copies, baskets) whole.
SPAN = 10_000_000

# query -> (table, key column, predicate). Predicates:
#   ("mod", M)  keep (key % SPAN) % M == 0   — uniform entity sample
#   ("lt", K)   keep (key % SPAN) < K        — contiguous key-range slice
# One scaling input table each (verified against the oracle SQL); sized
# so the quadratic oracle lands near sf0.01 volume while drawing from
# the scale fixture. The graph/basket queries use a PART-range slice
# (all baskets survive, the item/node domain contracts): a basket
# sample instead destroys co-occurrence — a 1/37 basket slice yields an
# edgeless graph and zero rules, which the 0-row guard below rejects.
SAMPLE_SPECS = {
    # lineitem-driven: whole baskets survive (all rows share l_orderkey)
    "q_projection": ("lineitem", "l_orderkey", ("mod", 37)),
    "q_unpivot": ("lineitem", "l_orderkey", ("mod", 37)),
    "q_join_broadcast": ("lineitem", "l_orderkey", ("mod", 37)),
    "q_join_delta_view": ("lineitem", "l_orderkey", ("mod", 37)),
    "q_join_salted": ("lineitem", "l_orderkey", ("mod", 37)),
    # co-order graph: induced subgraph on a 500-part node subset
    # (includes the BFS seed nodes pk <= 10). q_basket_rules and
    # q_graph_kcore are NOT sampleable this way — pair support scales
    # with the SQUARE of the node-keep fraction, so any slice sparse
    # enough for the quadratic oracle yields an empty result; their
    # scale record is the full oracle under a dedicated long watchdog
    # (basket_rules PASS at sf1/1800s in r12; kcore r13, BASELINE.md).
    "q_graph_bfs": ("lineitem", "l_partkey", ("lt", 500)),
    # customer-driven pair queries
    "q_join_theta_range": ("customer", "c_custkey", ("mod", 37)),
    "q_geo_neighbors": ("customer", "c_custkey", ("mod", 37)),
    "q_geo_neighbors_haversine": ("customer", "c_custkey", ("mod", 37)),
    # events-driven full-output queries (sf10 comparator-cap relief)
    "q_outlier_iqr": ("events", "event_id", ("mod", 7)),
    # documents-driven quadratic dedup/curation oracles; dup groups stay
    # whole under the composite predicate
    "q_corpus_curate": ("documents", "doc_id", ("mod", 199)),
    "q_dedup_cluster": ("documents", "doc_id", ("mod", 199)),
    "q_dedup_cross_matrix": ("documents", "doc_id", ("mod", 199)),
    "q_dedup_minhash_pairs": ("documents", "doc_id", ("mod", 199)),
    "q_dedup_ngram": ("documents", "doc_id", ("mod", 199)),
    # embeddings-driven ANN dedup oracles. Round 14: the contracted +
    # streaming oracle (Similarity.embedLshCtes) full-passes at sf1
    # with GRAFT_DUCKDB_DISABLE_OPT=join_order; at sf10 the candidate
    # COUNT itself (~8e9 at 4-bit buckets) stays past the oracle
    # ceiling, so the mod-63/mod-7 sampled slices remain the 100×
    # evidence (whole 100-copy dup groups survive the composite cut)
    "q_dedup_embed_cluster": ("embeddings", "vec_id", ("mod", 63)),
    "q_dedup_embed_incremental": ("embeddings", "vec_id", ("mod", 63)),
    "q_dedup_embed_lsh": ("embeddings", "vec_id", ("mod", 7)),
}


def pred_sql(key, pred):
    kind, arg = pred
    if kind == "mod":
        return f"({key} % {SPAN}) % {arg} = 0"
    return f"({key} % {SPAN}) < {arg}"

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
    # heavy oracles (recursive BFS at sf10) spill; give DuckDB a temp
    # dir with real space + an explicit memory budget instead of dying
    # on the default cwd-relative temp file (the r12 out-of-disk)
    # PER-PROCESS temp subdir: concurrent DuckDB workers sharing one
    # temp_directory collide on duckdb_temp_storage-*.tmp (worker A
    # removes worker B's spill file -> hard terminate; round-14 catch)
    tmp = os.environ.get("GRAFT_DUCKDB_TMP")
    if tmp:
        tmp = f"{tmp}/w{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        # the comparator re-sorts both sides anyway; dropping insertion-
        # order preservation lets DuckDB stream the big CTE pipelines
        # instead of buffering them (the sf10 BFS oracle's 60 GB spill)
        con.execute("SET preserve_insertion_order=false")
        # DuckDB's perfect-hash GROUP BY shifts by the key RANGE; the
        # GenScale mirrors spread keys across c*10^7 spans, so at sf10
        # the range (~9.9e8) overflows the shift ("Left-shift value
        # ... out of range" on q_dedup_simhash) or builds enormous
        # sparse tables (the 1800s q_dedup_cluster timeouts). Plain
        # hash aggregation finishes the same oracle in ~23 s — an
        # evaluation setting, zero semantic change (round 13).
        con.execute("SET perfect_ht_threshold=0")
    dis = os.environ.get("GRAFT_DUCKDB_DISABLE_OPT")
    if dis:
        con.execute(f"SET disabled_optimizers='{dis}'")
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


# --- digest comparator (round 14) -----------------------------------------
# For outputs past the row cap, compare an ORDER-INDEPENDENT digest instead
# of materialized frames: count + bit_xor + the summed 30-bit halves of a
# 60-bit per-row hash over length-prefixed stringified values — the exact
# device q_ingest_manifest (operators/Maintenance.scala) already proves
# engine-independent. BOTH digests are computed inside the SAME DuckDB
# worker — one over the oracle SQL, one over read_parquet() of the Spark
# dump — so stringification is one engine's and cancels; the only inputs
# that must agree are the VALUES.

def _norm_exprs(cols_a, cols_b):
    """Per-column normalization derived from BOTH schemas at once.
    Returns {col: sql_wrapper} applied identically to the two sides."""
    import re as _re
    out = {}
    for c in cols_a:
        ta, tb = cols_a[c].upper(), cols_b[c].upper()
        v = f'"{c}"'
        if "TIMESTAMP" in ta or "TIMESTAMP" in tb:
            # Spark parquet lands TIMESTAMPTZ (isAdjustedToUTC); the
            # oracle computes naive TIMESTAMP — strip to naive UTC
            v = f"CAST({v} AS TIMESTAMP)"
        elif {ta, tb} & {"FLOAT", "REAL"}:
            v = f"CAST({v} AS DOUBLE)"  # exact widening
        elif ta.startswith("DECIMAL") or tb.startswith("DECIMAL"):
            scales = [int(m.group(2)) for t in (ta, tb)
                      for m in [_re.match(r"DECIMAL\((\d+),(\d+)\)", t)]
                      if m]
            if scales and len(set(scales)) > 1:
                v = f"CAST({v} AS DECIMAL(38,{max(scales)}))"
        out[c] = v
    return out


def _digest_sql(cols, norm, src):
    parts = []
    for c in sorted(cols):
        # NULL is tagged OUTSIDE the length-prefixed value space ('N' vs
        # 'V' || len:value), so a NULL can never digest equal to any
        # genuine string value (ADVICE r14: chr(1) collided with a real
        # one-character '\x01' cell)
        v = f"CAST({norm[c]} AS VARCHAR)"
        s = (f"CASE WHEN {v} IS NULL THEN 'N' ELSE"
             f" 'V' || CAST(length({v}) AS VARCHAR) || ':' || {v} END")
        parts.append(s)
    row = " || '|' || ".join(parts)
    return (
        "SELECT count(*) AS n, coalesce(bit_xor(h), 0) AS fp,"
        " coalesce(sum(h % 1073741824), 0) AS lo,"
        " coalesce(sum(h // 1073741824), 0) AS hi FROM"
        f" (SELECT CAST(('0x' || substring(md5({row}), 1, 15)) AS BIGINT)"
        f" AS h FROM {src})")


def strip_trailing_order_by(sql):
    """Remove a TOP-LEVEL trailing ORDER BY from an oracle before
    digesting it: the digest is order-independent, but DuckDB does not
    prune a subquery's ORDER BY, so a 3e9-row oracle would pay a full
    external sort (46 GB of spill on q_join_theta_range) for nothing.
    Only strips when the last depth-0 'ORDER BY' is followed solely by
    sort-key tokens (idents/commas/ASC/DESC/numbers) to the end of the
    string — anything else (LIMIT/OFFSET/FETCH, parens) leaves the SQL
    untouched. Depth scanning skips single-quoted literals so a quoted
    paren or 'ORDER BY' inside a string cannot mis-locate the clause
    (ADVICE r14)."""
    import re
    up = sql.upper()
    if "DISTINCT ON" in up:
        # DuckDB's DISTINCT ON picks the surviving row FROM the ORDER BY
        # — stripping it would change which rows the oracle returns
        return sql
    depth = 0
    pos = -1
    in_str = False
    for i, ch in enumerate(sql):
        if in_str:
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and up.startswith("ORDER BY", i):
            pos = i
    if pos < 0:
        return sql
    tail = sql[pos + len("ORDER BY"):]
    tailUp = tail.upper()
    # ASC/DESC/NULLS FIRST|LAST are words the token regex admits;
    # LIMIT/OFFSET/FETCH are row-set-changing words it must reject
    # (ADVICE r14: 'ORDER BY x OFFSET 5' would have stripped silently)
    if re.fullmatch(r"[\sA-Za-z0-9_.,]*", tail) and \
            not any(w in tailUp for w in ("LIMIT", "OFFSET", "FETCH")):
        return sql[:pos]
    return sql


def run_digest(sf_dir, sql, out_glob, q):
    """Worker: digest the oracle result AND the Spark dump, ship both."""
    import duckdb
    sql = strip_trailing_order_by(sql)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # PER-PROCESS temp subdir: concurrent DuckDB workers sharing one
    # temp_directory collide on duckdb_temp_storage-*.tmp (worker A
    # removes worker B's spill file -> hard terminate; round-14 catch)
    tmp = os.environ.get("GRAFT_DUCKDB_TMP")
    if tmp:
        tmp = f"{tmp}/w{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET perfect_ht_threshold=0")
    dis = os.environ.get("GRAFT_DUCKDB_DISABLE_OPT")
    if dis:
        # e.g. 'join_order': keep written join order (build = right
        # child) for oracles whose candidate side is mis-estimated as
        # the build — the embed-LSH ver join at sf1 otherwise hashes
        # the 10^8-row candidate stream and spills >50 GB
        con.execute(f"SET disabled_optimizers='{dis}'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")
    spark_src = f"read_parquet('{out_glob}')"
    try:
        cols_s = {r[0]: r[1] for r in
                  con.execute(f"DESCRIBE SELECT * FROM {spark_src}")
                  .fetchall()}
        cols_o = {r[0]: r[1] for r in
                  con.execute(f"DESCRIBE ({sql})").fetchall()}
        if sorted(cols_s) != sorted(cols_o):
            q.put(("err", f"digest schema: spark={sorted(cols_s)} "
                   f"oracle={sorted(cols_o)}"))
            return
        norm = _norm_exprs(cols_s, cols_o)
        got = con.execute(_digest_sql(cols_s, norm, spark_src)).fetchone()
        want = con.execute(_digest_sql(cols_o, norm, f"({sql})")).fetchone()
        # ship both schemas too: the verified manifest records them so a
        # later --transfer-from run can reproduce this digest's exact
        # normalization basis (ADVICE r16)
        q.put(("ok", (tuple(got), tuple(want), cols_s, cols_o)))
    except Exception as e:
        q.put(("err", str(e)[:300]))


def check_digest(name, sql, sf_dir, out_dir, timeout_s, n_out):
    q = mp.Queue()
    p = mp.Process(target=run_digest,
                   args=(sf_dir, sql, f"{out_dir}/{name}/*.parquet", q))
    p.start()
    # Poll in slices so a worker that DIES without posting (DuckDB
    # segfault / OOM kill) is reported as a FAIL with its exit code, not
    # silently recorded as a timeout SKIP (ADVICE r14)
    import queue as _queue
    deadline = time.time() + timeout_s
    status = payload = None
    while True:
        try:
            status, payload = q.get(timeout=min(5, max(0.1,
                deadline - time.time())))
            break
        except _queue.Empty:
            if not p.is_alive() and p.exitcode != 0:
                p.join()
                return ("FAIL", f"FAIL {name}: digest worker died "
                        f"(exitcode={p.exitcode}, spark rows={n_out})", {})
            if time.time() >= deadline:
                p.terminate()
                p.join()
                return ("SKIP", f"SKIP {name}: digest oracle exceeded "
                        f"{timeout_s}s (spark rows={n_out})", {})
    p.join()
    if status == "err":
        return ("FAIL", f"FAIL {name}: digest error: {payload}", {})
    got, want, cols_s, cols_o = payload
    if got != want:
        return ("FAIL", f"FAIL {name}: digest mismatch "
                f"got(n,fp,lo,hi)={got} want={want}", {})
    return ("PASS", f"DIGEST-PASS {name} ({got[0]} rows, "
            f"fp={got[1]:#x})",
            {"mode": "digest", "rows": got[0], "digest": list(got),
             "cols": cols_s, "oracle_cols": cols_o})


def check_one(name, sql, sf_dir, out_dir, timeout_s, max_rows,
              digest_timeout=None, force_digest=False):
    """One oracle check; returns ('PASS'|'FAIL'|'SKIP', message, record).
    `record` feeds the out dir's verified_manifest.json (ADVICE r16)."""
    n_out = nrows(f"{out_dir}/{name}")
    if force_digest or n_out > max_rows:
        # past the cap, a pandas stringify-sort of a 10^8-row pair table
        # is not meaningful — compare order-independent digests computed
        # inside DuckDB on both sides instead (round 14)
        return check_digest(name, sql, sf_dir, out_dir,
                            digest_timeout or timeout_s, n_out)
    try:
        got = canon(pd.read_parquet(f"{out_dir}/{name}"))
    except Exception as e:
        return ("FAIL",
                f"FAIL {name}: spark-side read/sort error: {str(e)[:120]}",
                {})
    q = mp.Queue()
    p = mp.Process(target=run_oracle, args=(sf_dir, sql, q))
    p.start()
    try:
        status, want = q.get(timeout=timeout_s)
    except Exception:
        p.terminate()
        p.join()
        return ("SKIP", f"SKIP {name}: oracle exceeded {timeout_s}s "
                f"(brute-force oracle at scale — spark rows={len(got)})", {})
    p.join()
    if status == "err":
        return ("FAIL", f"FAIL {name}: oracle error: {want}", {})
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
        return ("FAIL", f"FAIL {name}: " + "; ".join(problems), {})
    return ("PASS", f"PASS {name} ({len(got)} rows)",
            {"mode": "frame", "rows": len(got)})


def check_transfer(name, out_dir, old_dir, oracles):
    """Digest-transitivity fallback for an oracle timeout (DESIGN.md
    §15): if the prior VERIFIED dir has the SAME oracle SQL and its dump
    digests equal to the fresh dump's, the fresh dump inherits that
    dir's oracle pass without re-running the hours-long oracle.

    "Verified" is no longer the caller's bare assertion (ADVICE r16):
    the old dir must carry a verified_manifest.json whose entry for this
    query records status PASS; when that entry also recorded a digest,
    the old dump is re-digested under the SAME normalization basis the
    original gate used (the manifest's recorded schemas) and must still
    match — a dump modified after its gate PASSED is refused. Schema
    comparison is sorted(cols.items()) — names AND types — so a type
    change cannot hide under the VARCHAR-normalized digest."""
    import duckdb
    old_sql_path = f"{old_dir}/oracle_sql.json"
    if not os.path.exists(old_sql_path) or \
            not os.path.isdir(f"{old_dir}/{name}"):
        return None
    with open(old_sql_path) as f:
        old_oracles = json.load(f)
    if old_oracles.get(name) != oracles.get(name):
        return ("SKIP", f"SKIP {name}: oracle SQL changed since {old_dir} "
                "— transfer invalid, full oracle re-run required", {})
    man_path = f"{old_dir}/verified_manifest.json"
    if not os.path.exists(man_path):
        return ("SKIP", f"SKIP {name}: {old_dir} carries no "
                "verified_manifest.json — cannot prove the prior dump "
                "passed its own gate; transfer refused", {})
    with open(man_path) as f:
        ent = json.load(f).get(name)
    if not ent or ent.get("status") != "PASS":
        return ("SKIP", f"SKIP {name}: prior manifest records "
                f"status={ent.get('status') if ent else None} for this "
                "query — transfer requires a recorded PASS", {})
    try:
        con = duckdb.connect()
        con.execute("SET TimeZone='UTC'")
        con.execute("SET preserve_insertion_order=false")
        mem = os.environ.get("GRAFT_DUCKDB_MEM")
        if mem:
            con.execute(f"SET memory_limit='{mem}'")
        # normalization basis: the original gate's recorded schemas when
        # the manifest has them (digest-mode PASS), else dump-vs-dump
        rec_cols, rec_ocols = ent.get("cols"), ent.get("oracle_cols")
        digs = []
        for d in (out_dir, old_dir):
            src = f"read_parquet('{d}/{name}/*.parquet')"
            cols = {r[0]: r[1] for r in
                    con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()}
            norm = (_norm_exprs(rec_cols, rec_ocols)
                    if rec_cols and rec_ocols and
                    sorted(cols.items()) == sorted(rec_cols.items())
                    else _norm_exprs(cols, cols))
            digs.append((sorted(cols.items()),
                         con.execute(_digest_sql(cols, norm, src))
                         .fetchone()))
        (cn, dn), (co, do) = digs
        if cn != co:
            return ("FAIL", f"FAIL {name}: transfer schema drift "
                    f"new={cn} old={co}", {})
        if ent.get("digest") is not None and \
                sorted(co) == sorted((rec_cols or {}).items()) and \
                list(do) != list(ent["digest"]):
            return ("FAIL", f"FAIL {name}: prior dump no longer matches "
                    f"its own verified manifest (recorded="
                    f"{tuple(ent['digest'])} now={tuple(do)}) — dir "
                    "modified since its gate PASSED; transfer refused", {})
        if tuple(dn) != tuple(do):
            return ("FAIL", f"FAIL {name}: transfer digest mismatch "
                    f"new={tuple(dn)} old={tuple(do)}", {})
        return ("PASS", f"TRANSFER-PASS {name} ({dn[0]} rows, "
                f"fp={dn[1]:#x} == prior verified dump)",
                {"mode": "transfer", "rows": dn[0], "digest": list(dn),
                 "cols": dict(cn), "from": old_dir})
    except Exception as e:
        return ("SKIP", f"SKIP {name}: transfer error: {str(e)[:200]}", {})


def main(sf_dir, out_dir, timeout_s, max_rows=5_000_000, workers=6,
         digest_timeout=None, force_digest=False, only=None,
         transfer_from=None):
    from concurrent.futures import ThreadPoolExecutor
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}

    n_pass = n_fail = n_timeout = 0
    timed_out = []
    manifest = {}
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs = {name: ex.submit(check_one, name, sql, sf_dir, out_dir,
                                timeout_s, max_rows, digest_timeout,
                                force_digest)
                for name, sql in sorted(oracles.items())}
        for name in sorted(futs):
            status, msg, rec = futs[name].result()
            print(msg, flush=True)
            manifest[name] = dict(rec, status=status)
            if status == "PASS":
                n_pass += 1
            elif status == "FAIL":
                n_fail += 1
            else:
                n_timeout += 1
                timed_out.append(name)

    if transfer_from and timed_out:
        for name in list(timed_out):
            r = check_transfer(name, out_dir, transfer_from, oracles)
            if r is None:
                continue
            status, msg, rec = r
            print(msg, flush=True)
            if status == "PASS":
                manifest[name] = dict(rec, status=status)
                n_pass += 1
                n_timeout -= 1
                timed_out.remove(name)
            elif status == "FAIL":
                manifest[name] = dict(rec, status=status)
                n_fail += 1
                n_timeout -= 1
                timed_out.remove(name)

    for name in sorted(os.listdir(out_dir)):
        if name in oracles or not os.path.isdir(f"{out_dir}/{name}"):
            continue
        if only is not None and name not in only:
            continue
        try:
            df = canon(pd.read_parquet(f"{out_dir}/{name}"))
            print(f"PASS {name} (no oracle; {len(df)} rows, sortable)")
            manifest[name] = {"status": "PASS", "mode": "no-oracle",
                              "rows": len(df)}
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: no-oracle output unreadable: {str(e)[:120]}")
            manifest[name] = {"status": "FAIL"}
            n_fail += 1

    # the verified-manifest marker (ADVICE r16): per-query status + the
    # digest/schema the gate computed, written into the dump dir so a
    # later --transfer-from run can PROVE this dir passed rather than
    # trusting the caller's word. Partial runs (--only) merge into any
    # existing manifest instead of clobbering other queries' records.
    man_path = f"{out_dir}/verified_manifest.json"
    merged = {}
    if os.path.exists(man_path):
        with open(man_path) as f:
            merged = json.load(f)
    merged.update(manifest)
    with open(man_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)

    print(f"\n{n_pass} pass, {n_fail} fail, {n_timeout} oracle-timeout "
          f"({', '.join(timed_out)})")
    return 1 if n_fail else 0


def build_slice(sf_dir, slice_dir, table, key, pred):
    """Materialize the sliced fixture dir: symlink every table, rewrite
    the sliced one through DuckDB with the group-preserving predicate."""
    import duckdb
    os.makedirs(slice_dir, exist_ok=True)
    for t in TABLES:
        dst = f"{slice_dir}/{t}.parquet"
        if os.path.lexists(dst):
            continue
        if t != table:
            os.symlink(os.path.abspath(f"{sf_dir}/{t}.parquet"), dst)
    dst = f"{slice_dir}/{table}.parquet"
    if not os.path.exists(dst):
        src = f"{sf_dir}/{table}.parquet"
        glob = f"{src}/*.parquet" if os.path.isdir(src) else src
        con = duckdb.connect()
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{glob}') "
            f"WHERE {pred_sql(key, pred)}) "
            f"TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')"
                        ).fetchone()[0]
        print(f"[sample] {table} sliced {pred_sql(key, pred)} "
              f"-> {n} rows", flush=True)


def sample_main(sf_dir, work_dir, timeout_s, only=None):
    names = sorted(n for n in SAMPLE_SPECS if not only or n in only)
    if not names:
        print("no sampled queries selected")
        return 1
    groups = {}
    for n in names:
        groups.setdefault(SAMPLE_SPECS[n], []).append(n)

    n_pass = n_fail = n_skip = 0
    for (table, key, pred), qs in sorted(groups.items()):
        tag = f"{table}_{pred[0]}{pred[1]}"
        slice_dir = os.path.abspath(f"{work_dir}/slice_{tag}")
        dump_dir = os.path.abspath(f"{work_dir}/dump_{tag}")
        build_slice(sf_dir, slice_dir, table, key, pred)
        print(f"[sample] spark side: {','.join(qs)} on {slice_dir}",
              flush=True)
        r = subprocess.run(
            ["sbt", "-batch",
             f"runMain graft.Verify {slice_dir} {dump_dir} {','.join(qs)}"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True)
        if r.returncode != 0:
            print(f"FAIL group {tag}: graft.Verify rc="
                  f"{r.returncode}\n{r.stdout[-2000:]}", flush=True)
            n_fail += len(qs)
            continue
        with open(f"{dump_dir}/oracle_sql.json") as f:
            oracles = json.load(f)
        for name in qs:
            if name not in oracles:
                print(f"SKIP {name}: no oracle SQL (sketch/float class)")
                n_skip += 1
                continue
            status, msg, _rec = check_one(name, oracles[name], slice_dir,
                                          dump_dir, timeout_s, 5_000_000)
            # a sampled gate that verifies zero rows proves nothing —
            # the slice must be re-tuned, not waved through
            if status == "PASS" and msg.endswith("(0 rows)"):
                status, msg = "FAIL", (f"FAIL {name}: sampled slice "
                                       "produced 0 rows — widen the slice")
            print("SAMPLED " + msg, flush=True)
            if status == "PASS":
                n_pass += 1
            elif status == "FAIL":
                n_fail += 1
            else:
                n_skip += 1
    print(f"\nsampled gate: {n_pass} pass, {n_fail} fail, {n_skip} skip")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--sample":
        argv = argv[1:]
        only = None
        if "--only" in argv:
            i = argv.index("--only")
            only = set(argv[i + 1].split(","))
            argv = argv[:i] + argv[i + 2:]
        t = int(argv[2]) if len(argv) > 2 else 600
        sys.exit(sample_main(argv[0], argv[1], t, only))
    force_digest = "--force-digest" in argv
    if force_digest:
        argv.remove("--force-digest")
    digest_t = None
    if "--digest-timeout" in argv:
        i = argv.index("--digest-timeout")
        digest_t = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    workers = 6
    if "--workers" in argv:
        i = argv.index("--workers")
        workers = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    transfer_from = None
    if "--transfer-from" in argv:
        i = argv.index("--transfer-from")
        transfer_from = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    t = int(argv[2]) if len(argv) > 2 else 180
    sys.exit(main(argv[0], argv[1], t, workers=workers,
                  digest_timeout=digest_t, force_digest=force_digest,
                  only=only, transfer_from=transfer_from))
