#!/usr/bin/env bash
# Uncontended bench fold — the COVERAGE.md adjudication protocol made a
# committed script (VERDICT r19 item 7): N solo `graft.Bench` runs on an
# otherwise-idle box, folded ELEMENT-WISE to per-query minima. Run it
# TWICE per round — once at round start (on the round's inherited code)
# and once at round close (on final code) — so "the box got slower" is
# measurable separately from "the code got slower": rows untouched by
# the round's diffs are box-drift sentinels between the two folds.
#
#   tools/bench_fold.sh OUT.json [N_RUNS=6] [CLASSES_DIR=target/scala-2.13/classes] [SF_DIR=/root/testdata/sf0.1]
#
# The JVM flags mirror build.sbt's forked-run options (Spark 4 on JDK 17
# needs the add-opens outside spark-submit). Any run with n_err > 0
# fails the fold loudly — a crash must never fold into a fast minimum.
set -euo pipefail
OUT="$1"; N="${2:-6}"
CP="$(readlink -f "${3:-target/scala-2.13/classes}")"
SF="${4:-/root/testdata/sf0.1}"
OUT="$(readlink -f "$(dirname "$OUT")")/$(basename "$OUT")"
FOLDER="$(readlink -f "$(dirname "$0")")/fold_bench.py"
WORK="$(mktemp -d /tmp/benchfold.XXXXXX)"
ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
for i in $(seq 1 "$N"); do
  echo "[bench_fold] run $i/$N ($(date -u +%H:%M:%S))" >&2
  # each run runs in its own cwd: Bench writes the FULL 287-row line to
  # <cwd>/target/bench_latest.json (stdout carries only the 22-row
  # compact line, sized for the driver's 2 kB tail window — folding
  # THAT loses 265 rows, the r20 lesson)
  RUNDIR="$WORK/cwd$i"; mkdir -p "$RUNDIR/target"
  ( cd "$RUNDIR" && SPARK_GRAFT_SF_DIR="$SF" java "${ADD_OPENS[@]}" \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -Dspark.sql.maxPlanStringLength=1000000 -Xmx8g \
      -cp "$CP:/opt/spark/jars/*" graft.Bench >"$WORK/run$i.out" \
      2>"$WORK/run$i.err" )
  cp "$RUNDIR/target/bench_latest.json" "$WORK/run$i.json" 2>/dev/null \
    || { echo "[bench_fold] run $i wrote no bench_latest.json; stderr tail:" >&2; tail -5 "$WORK/run$i.err" >&2; exit 1; }
done
python3 "$FOLDER" "$OUT" "$WORK"/run*.json
echo "[bench_fold] wrote $OUT (runs kept in $WORK)" >&2
