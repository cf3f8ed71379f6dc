#!/bin/bash
# End-of-round gate (VERDICT r9 item 5): one command that proves the
# snapshot is shippable. Run before the round closes; if any stage is
# red, fix or revert to last green BEFORE the snapshot.
#   tools/round_gate.sh            # compile + test + verify(sf0.01)
#   tools/round_gate.sh --bench    # ... + a full sf0.1 bench
set -eo pipefail
cd /root/repo

echo "== [1/4] sbt compile =="
sbt -batch compile > /tmp/gate_compile.log 2>&1 \
  || { tail -20 /tmp/gate_compile.log; echo "GATE: COMPILE RED"; exit 1; }

echo "== [2/4] sbt test =="
sbt -batch test > /tmp/gate_test.log 2>&1 \
  || { grep -E "FAILED|\*\*\*" /tmp/gate_test.log | tail -20; echo "GATE: TESTS RED"; exit 1; }
grep -E "Tests: succeeded" /tmp/gate_test.log | tail -1

echo "== [3/4] differential verify (sf0.01) =="
bash tools/verify.sh /root/testdata/sf0.01 2>&1 | tail -1 | tee /tmp/gate_verify.log
grep -q " 0 fail," /tmp/gate_verify.log || { echo "GATE: VERIFY RED"; exit 1; }

if [ "$1" = "--bench" ]; then
  echo "== [4/4] bench (sf0.1) =="
  ADDOPENS=""
  for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
           java.util java.util.concurrent java.util.concurrent.atomic \
           sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
    ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
  done
  sbt -batch package > /tmp/gate_pkg.log 2>&1
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/ed_clickhousespark_2.13-0.1.0.jar:/opt/spark/jars/*" \
    graft.Bench 2>/tmp/gate_bench.err | tail -1
else
  echo "== [4/4] bench skipped (pass --bench to run) =="
fi
echo "GATE: GREEN"
