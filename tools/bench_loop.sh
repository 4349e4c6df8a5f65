#!/bin/bash
# Repeated full-registry bench runs that merge per-query floors into
# bench_results/r{N}.json (Bench keeps per-query minima across runs).
# Runs the compiled classes directly so the sbt lock stays free for
# development; floors only ever improve, so runs that share the host
# with other work simply contribute less.
#
# Bench's floor merge is an unlocked read-modify-write of
# bench_results/r{N}.json + floors_cum.json, so each run is serialized
# under an exclusive flock: two concurrent Bench processes would
# interleave read/write and silently lose floors (and corrupt the
# per-query `runs` depth counts the equal-depth methodology relies on).
#
# Usage: tools/bench_loop.sh [n_runs]   (default 100; stop with
#        touch /tmp/graft_bench_stop or kill)
set -u
cd "$(dirname "$0")/.."
N="${1:-100}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
TMPD="/dev/shm/graft_tmp"
mkdir -p "$TMPD" bench_results
rm -f /tmp/graft_bench_stop
for i in $(seq 1 "$N"); do
  [ -e /tmp/graft_bench_stop ] && { echo "[bench_loop] stop flag"; break; }
  echo "[bench_loop] run $i/$N $(date +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  flock bench_results/.bench.lock \
  java $OPENS -Xmx8g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Djava.io.tmpdir="$TMPD" \
    -cp "$CP" graft.Bench > /tmp/graft_bench_run.txt 2>&1
  tail -1 /tmp/graft_bench_run.txt | head -c 300
  echo
done
