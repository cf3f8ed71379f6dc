#!/bin/bash
# End-of-round gate (VERDICT r9 item 5): one command that proves the
# snapshot is shippable. Run before the round closes; if any stage is
# red, fix or revert to last green BEFORE the snapshot.
#   tools/round_gate.sh            # compile + test + verify(sf0.01) + leakcheck
#   tools/round_gate.sh --bench    # ... + a full sf0.1 bench
# Gating relies on each command's EXIT CODE only (ADVICE r10: summary
# greps are informational and must not red the gate if sbt reformats).
set -eo pipefail
cd /root/repo

echo "== [1/5] sbt compile =="
sbt -batch compile > /tmp/gate_compile.log 2>&1 \
  || { tail -20 /tmp/gate_compile.log; echo "GATE: COMPILE RED"; exit 1; }

echo "== [2/5] sbt test =="
sbt -batch test > /tmp/gate_test.log 2>&1 \
  || { grep -E "FAILED|\*\*\*" /tmp/gate_test.log | tail -20 || true
       echo "GATE: TESTS RED"; exit 1; }
grep -E "Tests: succeeded" /tmp/gate_test.log | tail -1 || true

echo "== [3/5] differential verify (sf0.01) =="
bash tools/verify.sh /root/testdata/sf0.01 > /tmp/gate_verify.log 2>&1 \
  || { tail -10 /tmp/gate_verify.log; echo "GATE: VERIFY RED"; exit 1; }
tail -2 /tmp/gate_verify.log || true

echo "== [4/5] leakcheck =="
python3 tools/leakcheck.py || { echo "GATE: LEAKCHECK RED"; exit 1; }

echo "== [4.5/5] differential SQL fuzz (sf0.001, 3 seeds x 70) =="
sbt -batch package > /tmp/gate_pkg_fuzz.log 2>&1 \
  || { tail -20 /tmp/gate_pkg_fuzz.log; echo "GATE: PACKAGE RED"; exit 1; }
# >=200 queries across >=3 seeds (VERDICT r12 #1); distinct out dirs so a
# red run leaves every seed's repro .sql on disk
for SEED in 42 7 13; do
  python3 tools/difffuzz.py /root/testdata/sf0.001 /tmp/gate_fuzz_s$SEED \
    --n 70 --seed $SEED > /tmp/gate_fuzz_s$SEED.log 2>&1 \
    || { tail -10 /tmp/gate_fuzz_s$SEED.log
         echo "GATE: FUZZ RED (seed $SEED)"; exit 1; }
  tail -2 /tmp/gate_fuzz_s$SEED.log | tr '\n' ' '; echo
done

echo "== [4.6/5] differential PIPELINE fuzz (planted corpora, 3 seeds) =="
python3 tools/pipefuzz.py /tmp/gate_pipefuzz --seeds 3,5,8 \
  > /tmp/gate_pipefuzz.log 2>&1 \
  || { tail -12 /tmp/gate_pipefuzz.log; echo "GATE: PIPEFUZZ RED"; exit 1; }
grep -E "^pipefuzz|== " /tmp/gate_pipefuzz.log | tail -6

if [ "${1:-}" = "--bench" ]; then
  echo "== [5/5] bench (sf0.1) =="
  ADDOPENS=""
  for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
           java.util java.util.concurrent java.util.concurrent.atomic \
           sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
    ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
  done
  sbt -batch package > /tmp/gate_pkg.log 2>&1 \
    || { tail -20 /tmp/gate_pkg.log; echo "GATE: PACKAGE RED"; exit 1; }
  # derive the jar from the build output, not a hardcoded name — and
  # never the tests jar, which carries no graft.Bench and can be newer
  JAR=$(ls -t target/scala-2.13/*.jar | grep -v -- '-tests.jar' | head -1)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$JAR:/opt/spark/jars/*" \
    graft.Bench 2>/tmp/gate_bench.err | tail -1
  # stamp the gate record to its own file (VERDICT r13 #8): BENCH_LAST.json
  # is rewritten by EVERY Bench invocation, so a later loaded re-run can
  # silently overwrite the quiet closing number. Only round_gate writes
  # the stamped copy; the round number is one past the newest driver bench.
  # `|| true` inside the substitution: under set -eo pipefail a no-match
  # ls would otherwise kill the gate silently right after a good bench
  ROUND=$(( $({ ls BENCH_r*.json 2>/dev/null || true; } | sed 's/[^0-9]//g' | sort -n | tail -1 | grep . || echo 0) + 1 ))
  cp BENCH_LAST.json "BENCH_GATE_r${ROUND}.json"
  echo "stamped BENCH_GATE_r${ROUND}.json"

  echo "== [5.5] shuffle audit (soft gate: super-linear growth sf0.01->sf0.1) =="
  # stale JSONs from a previous round must not be silently adjudicated
  # when this round's audit dies (the compare would mix rounds)
  rm -f /tmp/gate_shuffle_0.01.json /tmp/gate_shuffle_0.1.json
  for SF in 0.01 0.1; do
    SPARK_GRAFT_SF_DIR=/root/testdata/sf$SF \
    java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$JAR:/opt/spark/jars/*" \
      graft.pipeline.ShuffleAudit --json /tmp/gate_shuffle_$SF.json \
      > /tmp/gate_shuffle_$SF.log 2>&1 \
      || { tail -5 /tmp/gate_shuffle_$SF.log; echo "GATE: SHUFFLE AUDIT FAILED (soft, continuing)"; }
  done
  # --expect pins the key universe to the prior round's merged record so a
  # key erroring at BOTH SFs (no ratio either way) still trips the gate
  PRIOR_SHUF=$({ ls SHUFFLE_r*.json 2>/dev/null || true; } | sort -V | tail -1)
  python3 tools/shuffle_gate.py /tmp/gate_shuffle_0.01.json \
    /tmp/gate_shuffle_0.1.json SHUFFLE_LAST.json \
    ${PRIOR_SHUF:+--expect "$PRIOR_SHUF"} \
    || echo "GATE: SHUFFLE WARNING (soft — see flags above)"
else
  echo "== [5/5] bench skipped (pass --bench to run) =="
fi
echo "GATE: GREEN"
