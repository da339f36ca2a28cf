#!/bin/bash
# SPILL GATE (round-13, VERDICT r12 item 1): run the heavy-tail queries
# under local-cluster[2,2,1024] — 1 GiB executor JVMs — at sf0.1 and sf1
# so external sort / shuffle spill / RocksDB-under-small-heap actually
# engage, and require every result to fingerprint-match an
# ample-memory local[16] run of the same JVM (graft.SpillCheck).
#
# Usage: tools/spill_gate.sh [sf01Dir] [sf1Dir]
# Writes SPILLCHECK.json in the repo root (one entry per SF) and exits
# non-zero if either SF run had a mismatch, a failed query, or failed to
# produce its artifact.
set -u
cd "$(dirname "$0")/.."
TD=${SPARK_GRAFT_TESTDATA:-/root/testdata}
SF01=${1:-$TD/sf0.1}
SF1=${2:-/tmp/sf1}

# same executor-launch farm as tools/cluster_gate.sh (see its comments)
SH=/tmp/graft_spark_home
mkdir -p "$SH"
ln -sfn /opt/spark/jars "$SH/jars"
ln -sfn /opt/spark/conf "$SH/conf"
ln -sfn /opt/spark/RELEASE "$SH/RELEASE"
export SPARK_HOME="$SH"
export SPARK_SCALA_VERSION=2.13

if [ ! -d "$SF1" ]; then
  echo "[spill_gate] $SF1 absent — generating with GenScale (10x $SF01)"
  sbt -batch "runMain graft.GenScale $SF01 $SF1" > /tmp/spill_genscale.log 2>&1 \
    || { echo "[spill_gate] GenScale FAILED"; tail -20 /tmp/spill_genscale.log >&2; exit 1; }
fi

EXITS=0
for SF in "$SF01" "$SF1"; do
  echo "[spill_gate] SpillCheck at $SF (heavy tail, 1 GiB executors)"
  sbt -batch "runMain graft.SpillCheck $SF" > "/tmp/spill_$(basename "$SF").log" 2>&1
  E=$?
  grep -o '{"gate":"spill".*}' "/tmp/spill_$(basename "$SF").log" | head -c 600; echo
  if [ "$E" -ne 0 ]; then
    echo "[spill_gate] FAILED at $SF (exit $E)" >&2
    tail -30 "/tmp/spill_$(basename "$SF").log" >&2
    EXITS=1
  fi
done

python3 - "$SF01" "$SF1" <<'EOF'
import json, os, sys
out = {}
for sf in sys.argv[1:]:
    base = os.path.basename(sf)
    path = f"SPILLCHECK_{base}.json"
    out[base] = json.load(open(path)) if os.path.exists(path) else None
json.dump(out, open("SPILLCHECK.json", "w"), indent=1)
bad = [k for k, v in out.items()
       if v is None or not v.get("all_match") or v.get("queries_spilled", 0) == 0]
if bad:
    print(f"[spill_gate] GATE FAILED for: {bad}", file=sys.stderr)
    sys.exit(1)
print("[spill_gate] ok:", {k: (v["queries_spilled"], v["queries_total"]) for k, v in out.items()})
EOF
PEXIT=$?
exit $(( EXITS || PEXIT ))
