#!/bin/bash
# CLUSTER GATE (round-12, VERDICT r11 item 1; hardened round-13): run the
# full driver correctness pipeline under local-cluster[2,2,1024] — the
# only in-sandbox mode where executors are SEPARATE JVM PROCESSES — so
# closure serialization, task-binary transport, broadcast over the wire,
# and remote shuffle reads actually execute for all registered queries,
# then demonstrate executor-loss recovery TWICE: SIGKILL one executor
# mid-q105 (batch, reliable-checkpoint mode) and mid-q225_stream_kmv
# (RocksDB transformWithState, killed while a micro-batch is in flight) —
# identical result fingerprints required for both.
#
# Usage: tools/cluster_gate.sh [sfDir] [outDir]
# Writes CLUSTERCHECK.json in the repo root:
#   {"mode":"local-cluster[2,2,1024]","sf":...,"pass":N,"fail":N,
#    "failed":[...],"recovery":{...batch demo...},
#    "recovery_stream":{...stream demo...}}
#
# EXIT CODE (r12 ADVICE + VERDICT item 4): non-zero when the Verify step
# fails to run (no stale-dump oracle compares), when any query fails the
# oracle, or when either recovery demo is missing or mismatched — so CI
# and callers can gate on it.
set -u
cd "$(dirname "$0")/.."
TD=${SPARK_GRAFT_TESTDATA:-/root/testdata}
SF=${1:-$TD/sf0.01}
OUT=${2:-/tmp/cluster_verify}
RECOVERY_SF=${RECOVERY_SF:-$TD/sf0.1}

# The in-process standalone Worker builds each executor's launch command
# from SPARK_HOME (jars dir + RELEASE marker) and drops executor logs in
# $SPARK_HOME/work — point it at a symlink farm in /tmp so the real
# distribution stays untouched. The executor CLASSPATH itself comes from
# spark.executor.extraClassPath (the driver's full sbt classpath,
# including this build's classes — see Graft.sessionBuilder).
SH=/tmp/graft_spark_home
mkdir -p "$SH"
ln -sfn /opt/spark/jars "$SH/jars"
ln -sfn /opt/spark/conf "$SH/conf"
ln -sfn /opt/spark/RELEASE "$SH/RELEASE"
export SPARK_HOME="$SH"
# the executor launcher infers the Scala version from build dirs when the
# dist layout is a symlink farm — pin it
export SPARK_SCALA_VERSION=2.13

rm -rf "$OUT"
echo "[cluster_gate] Verify all queries at $SF under local-cluster[2,2,1024]"
SPARK_GRAFT_MASTER='local-cluster[2,2,1024]' SPARK_GRAFT_CPUS=8 \
  sbt -batch "runMain graft.Verify $SF $OUT" > /tmp/cluster_verify.log 2>&1
VEXIT=$?
grep -E '^\[verify\]|\[error\] \[verify\]' /tmp/cluster_verify.log || true
if [ "$VEXIT" -ne 0 ]; then
  echo "[cluster_gate] FATAL: Verify exited $VEXIT — refusing to oracle-compare a stale/empty dump" >&2
  tail -40 /tmp/cluster_verify.log >&2
  exit "$VEXIT"
fi

echo "[cluster_gate] oracle compare"
python3 tools/check_oracle.py "$SF" "$OUT" | tee /tmp/cluster_oracle.txt

echo "[cluster_gate] executor-kill recovery demo: BATCH (q105, reliable checkpoints)"
sbt -batch "runMain graft.ClusterRecoveryDemo $RECOVERY_SF q105_pagerank" \
  > /tmp/cluster_recovery.txt 2>&1
grep '"demo"' /tmp/cluster_recovery.txt || tail -20 /tmp/cluster_recovery.txt >&2

echo "[cluster_gate] executor-kill recovery demo: STREAM (q225 transformWithState/RocksDB)"
# killAt 1.5 s: the warm disturbed drain finishes in ~4 s, and the kill
# must land inside the first processAllAvailable (micro-batch in flight)
# — at 4.0 s the kill fired post-completion and the timestamp guard
# correctly voided the demo (trial log, round 13)
sbt -batch "runMain graft.ClusterRecoveryDemo $RECOVERY_SF q225_stream_kmv ${STREAM_KILL_AT:-1.5}" \
  > /tmp/cluster_recovery_stream.txt 2>&1
grep '"demo"' /tmp/cluster_recovery_stream.txt || tail -20 /tmp/cluster_recovery_stream.txt >&2

python3 - "$SF" <<'EOF'
import json, re, sys
oracle = open('/tmp/cluster_oracle.txt').read()
passes = re.findall(r'^pass (\S+?):', oracle, re.M)
fails  = re.findall(r'^FAIL (\S+?):', oracle, re.M)
# a query that THREW inside Verify leaves no dump dir (cleared by design),
# so the oracle compare never sees it — fold the [verify] failure lines in
# explicitly (the EdgeCorpusSpec coverage-hole rule, replicated here)
crashed = re.findall(r'\[verify\] (\S+) failed', open('/tmp/cluster_verify.log').read())
fails = sorted(set(fails) | set(crashed))
def demo(path):
    try:
        for line in open(path):
            i = line.find('{"demo"')
            if i >= 0:
                return json.loads(line[i:].strip())
    except OSError:
        pass
    return None
rec = demo('/tmp/cluster_recovery.txt')
rec_stream = demo('/tmp/cluster_recovery_stream.txt')
out = {"mode": "local-cluster[2,2,1024]", "sf": sys.argv[1],
       "pass": len(passes), "fail": len(fails), "failed": sorted(fails),
       "recovery": rec, "recovery_stream": rec_stream}
json.dump(out, open('CLUSTERCHECK.json', 'w'), indent=1)
print(json.dumps(out)[:500])
problems = []
if not passes:
    problems.append("zero oracle passes")
if fails:
    problems.append(f"{len(fails)} oracle failures")
for name, r in (("batch", rec), ("stream", rec_stream)):
    if r is None:
        problems.append(f"{name} recovery demo produced no result line")
    elif not (r.get("match") is True and r.get("executor_killed") is True):
        problems.append(f"{name} recovery demo did not pass: {r}")
if problems:
    print("[cluster_gate] GATE FAILED: " + "; ".join(problems), file=sys.stderr)
    sys.exit(1)
EOF
