#!/bin/bash
# STREAM REPLAY GATE (round 13): replay every registered stream query as
# a genuine MULTI-BATCH stream — ReplayStage time-slices the events table
# (bounded ±60 s arrival jitter, inside every watermark delay) and
# hash-slices documents; with SPARK_GRAFT_STREAM_REPLAY set the stream
# sources deliver one slice per micro-batch (watermark sentinels arrive
# as the final slice) — then hash-compare each result against the SAME
# DuckDB oracle the single-batch drains are graded on. This executes the
# cross-batch state machinery (state commit/reload between batches,
# batch-over-batch watermark advance, buffered-replay holds, join-state
# eviction against late rows) that no single-batch gate can reach.
#
# Usage: tools/stream_replay_gate.sh [sfDir] [slices]
# Writes STREAMREPLAY.json in the repo root; exits non-zero when any
# query fails the oracle, any sliced-source query ran <2 data batches,
# or a pipeline step dies (no stale-dump compares — the cluster-gate
# lesson, r12 ADVICE).
#
# SPARK_GRAFT_MASTER=local-cluster[...] combines the time axis with the
# process boundary: every micro-batch's state commits then happen in
# REAL executor JVMs (RPC-coordinated store commits, remote shuffle
# between batches). The farm staging mirrors cluster_gate.sh; the
# artifact becomes STREAMREPLAY_cluster.json so the local gating
# artifact can never be clobbered by a cluster run.
set -u
cd "$(dirname "$0")/.."
TD=${SPARK_GRAFT_TESTDATA:-/root/testdata}
SF=${1:-$TD/sf0.1}
SLICES=${2:-8}
STAGE=/tmp/graft_replay_stage
OUT=/tmp/replay_verify
MASTER=${SPARK_GRAFT_MASTER:-}
# artifact name derives from the SF dir (the Bench rule: a non-gating
# run must never clobber the committed gating artifact) and carries a
# _cluster tag under a real-executor master
BASE=$(basename "$SF")
if [ "$BASE" = "sf0.1" ]; then ARTIFACT=STREAMREPLAY.json
else ARTIFACT="STREAMREPLAY_${BASE}.json"; fi
if [[ "$MASTER" == local-cluster* ]]; then
  ARTIFACT="${ARTIFACT%.json}_cluster.json"
  SH=/tmp/graft_spark_home
  mkdir -p "$SH"
  ln -sfn /opt/spark/jars "$SH/jars"
  ln -sfn /opt/spark/conf "$SH/conf"
  ln -sfn /opt/spark/RELEASE "$SH/RELEASE"
  export SPARK_HOME="$SH"
  export SPARK_SCALA_VERSION=2.13
fi

# every registered stream query (q79's delta-file merge stages its own
# multi-batch input and never reads the sliced sources — exempt from the
# batch-count demand, still oracle-checked)
QS=$(grep -oE '"q[0-9]+_stream[a-z_0-9]*"' src/main/scala/graft/SparkEntry.scala \
  | tr -d '"' | sort -u | paste -sd,)
echo "[stream_replay] queries: $QS"

echo "[stream_replay] staging $SLICES slices from $SF"
sbt -batch "runMain graft.ReplayStage $SF $STAGE $SLICES 60" \
  > /tmp/stream_replay_stage.log 2>&1
if [ $? -ne 0 ]; then
  echo "[stream_replay] FATAL: ReplayStage failed" >&2
  tail -30 /tmp/stream_replay_stage.log >&2
  exit 1
fi
grep -o '{"stage":"replay".*}' /tmp/stream_replay_stage.log || true

rm -rf "$OUT"
echo "[stream_replay] Verify stream queries in replay mode"
SPARK_GRAFT_STREAM_REPLAY="$STAGE" SPARK_GRAFT_CPUS=8 \
  sbt -batch "runMain graft.Verify $SF $OUT $QS" \
  > /tmp/stream_replay_verify.log 2>&1
VEXIT=$?
grep -E '^\[info\] \[replay\]|\[verify\]' /tmp/stream_replay_verify.log || true
if [ "$VEXIT" -ne 0 ]; then
  echo "[stream_replay] FATAL: Verify exited $VEXIT — refusing to oracle-compare a stale/empty dump" >&2
  tail -40 /tmp/stream_replay_verify.log >&2
  exit "$VEXIT"
fi

echo "[stream_replay] oracle compare"
python3 tools/check_oracle.py "$SF" "$OUT" | tee /tmp/stream_replay_oracle.txt

python3 - "$SF" "$SLICES" "$QS" "${MASTER:-local}" "$ARTIFACT" <<'EOF'
import json, re, sys
sf, slices, qs = sys.argv[1], int(sys.argv[2]), sys.argv[3].split(',')
mode, artifact = sys.argv[4], sys.argv[5]
oracle = open('/tmp/stream_replay_oracle.txt').read()
passes = re.findall(r'^pass (\S+?):', oracle, re.M)
fails  = re.findall(r'^FAIL (\S+?):', oracle, re.M)
vlog = open('/tmp/stream_replay_verify.log').read()
crashed = re.findall(r'\[verify\] (\S+) failed', vlog)
fails = sorted(set(fails) | set(crashed))
# batch evidence: the drain helpers print one [replay] line per drained
# stream; sink names differ from query names, so demand global coverage —
# at least one line per sliced-source query, every line > 1 data batch
batches = [int(m) for m in re.findall(r'\[replay\] query=\S+ data_batches=(\d+)', vlog)]
expected = len([q for q in qs if q != 'q79_stream_merge'])
out = {"gate": "stream_replay", "sf": sf, "slices": slices, "mode": mode,
       "queries": len(qs), "pass": len(passes), "fail": len(fails),
       "failed": fails, "drains_logged": len(batches),
       "min_data_batches": min(batches) if batches else 0,
       "max_data_batches": max(batches) if batches else 0}
json.dump(out, open(artifact, 'w'), indent=1)
print(json.dumps(out))
problems = []
if len(passes) + len(fails) < len(qs):
    problems.append(f"only {len(passes)+len(fails)}/{len(qs)} queries reached the oracle")
if fails:
    problems.append(f"{len(fails)} oracle failures")
if len(batches) < expected:
    problems.append(f"only {len(batches)} [replay] drain lines for {expected} sliced-source queries")
# the bar is slices-1, not 2: a two-phase flush sentinel is its own
# input-bearing batch, so a collapsed replay still reads 2 — only a
# count tied to the slice count evidences per-slice delivery
if batches and min(batches) < slices - 1:
    problems.append(f"a drain ran {min(batches)} data batches for {slices} slices — replay collapsed")
if problems:
    print("[stream_replay] GATE FAILED: " + "; ".join(problems), file=sys.stderr)
    sys.exit(1)
EOF
