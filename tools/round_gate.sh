#!/usr/bin/env bash
# Round-end evidence gate (round 13, VERDICT r12 item 9): one command
# that produces the round's durable records itself — regenerated docs,
# green suite, oracle gate, bench JSON — and APPENDS the BASELINE.md
# row, so the record can't be left stranded in an untracked session log
# (the r11 SURVEY drift and the r12 sf10 row were both that failure).
#
# Usage: tools/round_gate.sh <round> [verifySf] [benchSf]
#   round    round number, e.g. 13 (names the artifacts)
#   verifySf fixture dir for the correctness gate  (default /root/testdata/sf0.01)
#   benchSf  fixture dir for the bench             (default /root/testdata/sf0.1)
#
# Produces: .tmp/gate_r<N>/{sbt_test,verify,validate}.log, bench_diff.txt
#           BENCH_r<N>_session.json (tracked-candidate per-query bench)
#           one appended BASELINE.md row
# The script does NOT git-commit — review the diff, then commit.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND=${1:?usage: tools/round_gate.sh <round> [verifySf] [benchSf]}
SF=${2:-/root/testdata/sf0.01}
BSF=${3:-/root/testdata/sf0.1}
STAMP=$(date -u +%F)
OUT=.tmp/gate_r$ROUND
mkdir -p "$OUT"

echo "[gate] 1/6 regenerate docs (QUERIES.md + plan census)"
python3 tools/gen_index.py
sbt -batch "runMain graft.tools.PlanCensus" >"$OUT/census.log" 2>&1
tail -1 "$OUT/census.log"

echo "[gate] 2/6 sbt test"
if ! sbt -batch test >"$OUT/sbt_test.log" 2>&1; then
  tail -40 "$OUT/sbt_test.log"
  exit 1
fi
TESTS=$(grep -E "^\[info\] Tests:" "$OUT/sbt_test.log" | tail -1 \
  | sed 's/^\[info\] //')
echo "  $TESTS"

echo "[gate] 3/6 graft.Verify @ $SF"
sbt -batch "runMain graft.Verify $SF $OUT/verify" >"$OUT/verify.log" 2>&1

echo "[gate] 4/6 DuckDB oracle gate"
python3 tools/validate.py "$SF" "$OUT/verify" >"$OUT/validate.log" 2>&1 \
  || true
GATE=$(tail -1 "$OUT/validate.log")
echo "  $GATE"
case "$GATE" in *" 0 fail"*) : ;; *)
  echo "[gate] ORACLE FAILURES — no BASELINE row appended"; exit 1 ;;
esac

echo "[gate] 5/6 graft.Bench @ $BSF"
SPARK_GRAFT_SF_DIR=$BSF sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '"metric"' | sed 's/^\[info\] //' | head -1 \
  >"BENCH_r${ROUND}_session.json"
BENCH=$(python3 - "$ROUND" <<'PY'
import json, sys
d = json.load(open(f"BENCH_r{sys.argv[1]}_session.json"))
print(f"{d['value']:.2f} s total / {len(d['queries'])} queries, "
      f"local[{d.get('cpus','?')}]/shuffle={d.get('shuffle','?')}, "
      f"median-of-{d.get('reps','?')}, loadavg "
      f"{d.get('loadavg_start','?')}->{d.get('loadavg_end','?')}")
PY
)
echo "  $BENCH"
# Idle-vs-idle diff (VERDICT r14 item 4): the r14 gate compared a
# loadavg-72.9 session bench against a loadavg-2.9 one and printed 82
# spurious movers. Diff THIS round's idle artifact (BENCH_r<N>_idle.json
# — produce it on a quiet host before running the gate) against the
# newest prior idle/full artifact; only fall back to the session bench
# when no idle artifact exists, and say so. Both sides' loadavg is
# stamped into the diff header so every mover line reads against it.
NEW="BENCH_r${ROUND}_session.json"; NEWKIND="session (NO idle artifact — movers unreliable under gate load)"
if [ -f "BENCH_r${ROUND}_idle.json" ]; then
  NEW="BENCH_r${ROUND}_idle.json"; NEWKIND="idle"
fi
# Prior artifacts may have been pruned into docs/bench/ (root carries
# only the latest round's trio + bench.json) — search both locations.
PREV=$(ls BENCH_r*_idle.json BENCH_r*_full.json \
  docs/bench/BENCH_r*_idle.json docs/bench/BENCH_r*_full.json \
  2>/dev/null | grep -v "BENCH_r${ROUND}_" | sort -t r -k 2 -V \
  | tail -1 || true)
MOVERS="(no prior per-query bench found)"
if [ -n "$PREV" ]; then
  {
    python3 - "$PREV" "$NEW" <<'PY'
import json, sys
for f in sys.argv[1:3]:
    d = json.load(open(f))
    print(f"# {f}: loadavg {d.get('loadavg_start','?')}->"
          f"{d.get('loadavg_end','?')}, local[{d.get('cpus','?')}], "
          f"total {d.get('value','?')} s")
PY
    python3 tools/bench_diff.py "$PREV" "$NEW" 2>&1 || true
  } >"$OUT/bench_diff.txt"
  MOVERS=$(grep -c "  q_" "$OUT/bench_diff.txt" || true)
  MOVERS="$MOVERS movers beyond the ±30%/50 ms band, $NEWKIND vs $PREV (see $OUT/bench_diff.txt)"
fi
echo "  $MOVERS"

echo "[gate] 6/6 appending BASELINE.md row"
printf '| Round-%s gate record (tools/round_gate.sh) | %s: %s; oracle gate **%s** at %s; Bench **%s** at %s; %s. Per-query bench tracked as `BENCH_r%s_session.json` | `SPARK_GRAFT_SF_DIR=%s` | `.tmp/gate_r%s/` logs |\n' \
  "$ROUND" "$STAMP" "$TESTS" "$GATE" "$SF" "$BENCH" "$BSF" "$MOVERS" \
  "$ROUND" "$BSF" "$ROUND" >>BASELINE.md
echo "[gate] done — review git diff (BASELINE.md, docs/, BENCH_r${ROUND}_session.json), then commit"
