#!/usr/bin/env python3
"""Generate docs/QUERIES.md — a one-line-per-query index of the declared
registry (name, one-phrase what, module, oracle class) — from the source
itself, so the index can never drift from the code the way a hand-written
list would.

How it reads the source (no Scala tooling needed):
  - walks src/main/scala for `queries`/`oracleSql` Map blocks and collects
    `"q_*" ->` registrations per block kind;
  - for a `"q_x" -> valName` registration it finds `val valName` in the
    same file and lifts the first sentence of the scaladoc block directly
    above it;
  - a registration whose RHS is not a plain identifier (inline lambda,
    expression) falls back to the scaladoc above the registration line.

Run: python3 tools/gen_index.py            # rewrites docs/QUERIES.md
     python3 tools/gen_index.py --check    # exit 1 if the file is stale
"""
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src", "main", "scala")
OUT = os.path.join(ROOT, "docs", "QUERIES.md")

REG = re.compile(r'"(q_[a-z0-9_]+)"\s*->\s*(.*)')
QUERIES_OPEN = re.compile(r"\bqueries\s*[:=].*Map\(|\bqueries\s*:\s*Map\[")
ORACLE_OPEN = re.compile(r"\boracleSql\s*[:=].*Map\(|\boracleSql\s*:\s*Map\[")
IDENT = re.compile(r"^([A-Za-z][A-Za-z0-9_]*)\s*[,)]?\s*$")


def first_sentence(doc_lines):
    text = " ".join(
        l.strip().lstrip("/*").lstrip("*").strip() for l in doc_lines)
    text = re.sub(r"\[\[([^\]]+)\]\]", r"\1", text)
    text = re.sub(r"\s+", " ", text).strip()
    # cut at the first sentence boundary, then at the first em-dash clause
    for sep in (". ", " — ", " -- "):
        i = text.find(sep)
        if 0 < i < 140:
            text = text[:i]
            break
    text = text.rstrip(".")
    return (text[:117] + "...") if len(text) > 120 else text


def scaladoc_above(lines, idx):
    """The /** ... */ block whose closing */ is nearest above lines[idx]."""
    i = idx - 1
    while i >= 0 and lines[i].strip() == "":
        i -= 1
    if i < 0 or not lines[i].strip().endswith("*/"):
        return None
    end = i
    while i >= 0 and "/**" not in lines[i]:
        i -= 1
    if i < 0:
        return None
    return lines[i:end + 1]


# Block-lambda registrations whose scaladoc sits on a shared helper the
# chaser can't reach (family doc above a sibling def / an intervening
# const). One explicit phrase each; everything else is source-derived.
OVERRIDES = {
    "q_basket_rules": "Market-basket association rules (support/confidence"
        "/lift, Agrawal 1993) with the A-Priori prune before the pair"
        " self-join",
    "q_negative_sample": "Deterministic contrastive negative sampling: k"
        " hash-drawn negatives per doc, flagged hard when same-source",
    "q_privacy_pseudonym": "Stable salted-SHA pseudonymization of customer"
        " keys (joinable, irreversible without the salt)",
    "q_rollup_incremental": "Incremental (type, day) rollup maintenance:"
        " merge a CDC delta into the stored aggregate without a full"
        " recompute",
    "q_sample_reservoir": "Fixed-size per-source sample via md5-hash"
        " order statistics (the deterministic reservoir equivalent)",
    "q_similarity_lsh": "Random-hyperplane LSH bucketed ANN top-k (recall"
        " property-pinned vs the exact baseline)",
    "q_similarity_topk": "Brute-force cosine top-k over embeddings"
        " (integer-exact scores) — the ANN recall baseline",
    "q_text_clean": "Control-char strip + whitespace-run collapse text"
        " normalization with per-doc change accounting",
    "q_text_perplexity": "Per-doc perplexity under an add-one-smoothed"
        " corpus unigram LM (float ln fold)",
    "q_train_split": "Deterministic md5-hash 80/10/10 train/val/test"
        " assignment (rerun-stable, engine-exact)",
}


def doc_for(val, lines, depth=0):
    """Scaladoc of `val`; an undocumented thin registration like
    `val qX: Q = (s, d) => underlying(...)` chases the underlying def."""
    if depth > 2:
        return None
    pat = re.compile(
        r"^\s*(?:private\s+)?(?:lazy\s+)?(?:val|def)\s+"
        + re.escape(val) + r"\b")
    for dn, dl in enumerate(lines):
        if not pat.match(dl):
            continue
        doc = scaladoc_above(lines, dn)
        if doc:
            return first_sentence(doc)
        body = " ".join(lines[dn:dn + 2])
        m = re.search(r"=>\s*(?:[A-Za-z]\w*\.)?([a-z]\w*)\(", body)
        if m and m.group(1) != val:
            return doc_for(m.group(1), lines, depth + 1)
        return None
    return None


def harvest(path):
    with open(path) as f:
        lines = f.read().splitlines()
    regs, oracles = [], set()
    mode = None
    for n, line in enumerate(lines):
        if QUERIES_OPEN.search(line):
            mode = "q"
        elif ORACLE_OPEN.search(line):
            mode = "o"
        m = REG.search(line)
        if not m or mode is None:
            continue
        if mode == "o":
            oracles.add(m.group(1))
            continue
        name, rhs = m.group(1), m.group(2).strip()
        if name in OVERRIDES:
            regs.append((name, OVERRIDES[name]))
            continue
        mi = IDENT.match(rhs)
        desc = doc_for(mi.group(1), lines) if mi else None
        if desc is None:
            doc = scaladoc_above(lines, n)
            desc = first_sentence(doc) if doc else ""
        regs.append((name, desc))
    return regs, oracles


def collect():
    entries, oracles = {}, set()
    for dirpath, _, files in os.walk(SRC):
        for fn in sorted(files):
            if not fn.endswith(".scala"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, ROOT)
            regs, orc = harvest(path)
            oracles |= orc
            for name, desc in regs:
                if name in entries:
                    raise SystemExit(
                        f"duplicate registration {name}: "
                        f"{entries[name][1]} and {rel}")
                entries[name] = (desc, rel)
    return entries, oracles


def render(entries, oracles):
    rows = []
    for name in sorted(entries):
        desc, rel = entries[name]
        mod = os.path.basename(rel).replace(".scala", "")
        oc = "exact" if name in oracles else "no-oracle"
        rows.append(f"| `{name}` | {desc} | {mod} | {oc} |")
    n, no = len(entries), sum(1 for q in entries if q not in oracles)
    head = [
        "# Query registry index",
        "",
        "GENERATED by `python3 tools/gen_index.py` — do not edit by hand.",
        f"{n} registered queries: {n - no} with exact DuckDB oracles, "
        f"{no} no-oracle (scalatest/property-verified sketch/float/codec "
        "classes).",
        "",
        "| query | what | module | oracle |",
        "|---|---|---|---|",
    ]
    return "\n".join(head + rows) + "\n"


def main():
    entries, oracles = collect()
    missing_desc = [q for q, (d, _) in entries.items() if not d]
    if missing_desc:
        print(f"warning: {len(missing_desc)} queries without scaladoc: "
              + ", ".join(sorted(missing_desc)), file=sys.stderr)
    text = render(entries, oracles)
    if "--check" in sys.argv:
        with open(OUT) as f:
            if f.read() != text:
                raise SystemExit("docs/QUERIES.md is stale — rerun "
                                 "python3 tools/gen_index.py")
        print("docs/QUERIES.md up to date")
        return
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write(text)
    print(f"wrote {OUT}: {len(entries)} queries, "
          f"{len([q for q in entries if q in oracles])} oracle-bearing")


if __name__ == "__main__":
    main()
