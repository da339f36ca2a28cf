#!/bin/bash
# CLUSTER GATE (round-12, VERDICT r11 item 1): run the full driver
# correctness pipeline under local-cluster[2,2,1024] — the only in-sandbox
# mode where executors are SEPARATE JVM PROCESSES — so closure
# serialization, task-binary transport, broadcast over the wire, and
# remote shuffle reads actually execute for all registered queries, then
# demonstrate executor-loss recovery (SIGKILL one executor mid-q105 in
# reliable-checkpoint mode, identical result required).
#
# Usage: tools/cluster_gate.sh [sfDir] [outDir]
# Writes CLUSTERCHECK.json in the repo root:
#   {"mode":"local-cluster[2,2,1024]","sf":...,"pass":N,"fail":N,
#    "failed":[...],"recovery":{...executor-kill demo line...}}
set -u
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/cluster_verify}

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
  sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 \
  | grep -E '^\[verify\]|\[error\] \[verify\]' || true

echo "[cluster_gate] oracle compare"
python3 tools/check_oracle.py "$SF" "$OUT" | tee /tmp/cluster_oracle.txt

echo "[cluster_gate] executor-kill recovery demo (q105, reliable checkpoints)"
sbt -batch "runMain graft.ClusterRecoveryDemo /root/testdata/sf0.1 q105_pagerank" 2>&1 \
  | tee /tmp/cluster_recovery.txt | grep '"demo"' || true

python3 - "$SF" <<'EOF'
import json, re, sys
oracle = open('/tmp/cluster_oracle.txt').read()
passes = re.findall(r'^pass (\S+?):', oracle, re.M)
fails  = re.findall(r'^FAIL (\S+?):', oracle, re.M)
rec = None
for line in open('/tmp/cluster_recovery.txt'):
    line = line.strip()
    i = line.find('{"demo"')
    if i >= 0:
        rec = json.loads(line[i:])
out = {"mode": "local-cluster[2,2,1024]", "sf": sys.argv[1],
       "pass": len(passes), "fail": len(fails), "failed": sorted(fails),
       "recovery": rec}
json.dump(out, open('CLUSTERCHECK.json', 'w'), indent=1)
print(json.dumps(out)[:400])
EOF
