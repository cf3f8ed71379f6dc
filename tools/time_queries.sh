#!/bin/bash
# Time individual catalog queries: tools/time_queries.sh <sfDir> q1 q2 ...
# (drill-down companion of verify.sh/Bench; uses graft.TimeQueries)
set -eo pipefail
cd /root/repo
# guard BEFORE shift: bare `shift` under set -e exits silently with no
# args, and a forgotten <sfDir> would eat the first query name as the dir
[ $# -ge 2 ] || { echo "usage: time_queries.sh <sfDir> q1 [q2 ...]" >&2; exit 1; }
SF=$1; shift
sbt -batch package > /tmp/sbt_package.log 2>&1 || { tail -30 /tmp/sbt_package.log; exit 1; }
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/ed_clickhousespark_2.13-0.1.0.jar:/opt/spark/jars/*" \
  graft.TimeQueries "$SF" "$@" 2>&1 | grep -E "^\[timeq\]|^\[graph\]|Exception|Error"
