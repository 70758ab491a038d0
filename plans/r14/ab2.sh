#!/bin/bash
# Paired A/B runner, per-leg tree + env (extends ab.sh for cross-tree
# comparisons: legA can run the inherited-HEAD worktree while legB runs
# the optimized repo). Two legs back-to-back through the same harness
# (SPARK_GRAFT_BENCH_ONLY); subset absolutes are not comparable to
# full-suite rows.
# Usage: ab2.sh <tag> <queries-csv> <treeA> <envA> <treeB> <envB>
# Each env is a ;-separated list of VAR=VALUE pairs (empty = none).
set -u
TAG=$1; ONLY=$2; TREEA=$3; ENVA=${4:-}; TREEB=$5; ENVB=${6:-}
OUT=/tmp/ab_${TAG}
run_leg() {
  local leg=$1 tree=$2 envs=$3
  local -a pre=()
  IFS=';' read -ra kv <<< "$envs"
  for p in "${kv[@]}"; do [ -n "$p" ] && pre+=("$p"); done
  (cd "$tree" && env ${pre[@]+"${pre[@]}"} \
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${AB_CPUS:-32} \
     SPARK_GRAFT_BENCH_ONLY="$ONLY" \
     python bench.py > "${OUT}_${leg}.json" 2> "${OUT}_${leg}.err")
}
run_leg A "$TREEA" "$ENVA"
sleep 75
run_leg B "$TREEB" "$ENVB"
python - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
legs = {}
for leg in ("A", "B"):
    with open(f"{out}_{leg}.json") as fh:
        lines = [l for l in fh if l.strip().startswith("{")]
    legs[leg] = json.loads(lines[0])["queries"]
names = sorted(set(legs["A"]) | set(legs["B"]))
print(f"{'query':42s} {'A':>8s} {'B':>8s}  B/A")
for n in names:
    a, b = legs["A"].get(n), legs["B"].get(n)
    r = f"{b/a:.2f}" if a and b else "-"
    print(f"{n:42s} {a!s:>8s} {b!s:>8s}  {r}")
ta = sum(v for v in legs['A'].values() if v)
tb = sum(v for v in legs['B'].values() if v)
print(f"{'TOTAL':42s} {ta:8.2f} {tb:8.2f}  {tb/ta:.2f}")
EOF
