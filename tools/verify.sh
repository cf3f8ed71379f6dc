#!/bin/bash
# Local t2-gate replica: package, run graft.Verify, compare vs DuckDB.
# Usage: tools/verify.sh [sfDir] [outDir]
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
sbt -batch package > /tmp/sbt_package.log 2>&1 || { tail -30 /tmp/sbt_package.log; exit 1; }
rm -rf "$OUT"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $ADDOPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/ed_clickhousespark_2.13-0.1.0.jar:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" 2>/tmp/verify_stderr.log || { tail -40 /tmp/verify_stderr.log; exit 1; }
grep -E '^\[verify\]' /tmp/verify_stderr.log || true
python3 tools/check.py "$SF" "$OUT"
