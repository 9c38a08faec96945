#!/bin/bash
# Interleaved A/B bench: r12 classes (worktree at 0b2792b) vs current
# classes, same box, same JVM flags, alternating invocations so ambient
# drift hits both arms equally. Usage:
#   scripts/ab_bench.sh <reps> <outdir> [BENCH_ONLY value]
# Each invocation prints one bench JSON line into
# <outdir>/{r12,r13}_<i>.json. Leave BENCH_ONLY empty for the full
# battery.
set -u
REPS="${1:?reps}"
OUT="${2:?outdir}"
ONLY="${3:-}"
mkdir -p "$OUT"
JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
run() { # run <classesdir> <outfile>
  local cls="$1" out="$2"
  ( cd "$OUT" && \
    SPARK_GRAFT_BENCH_ONLY="$ONLY" \
    SPARK_GRAFT_BENCH_FULL="$out" \
    java -Xmx100g --add-opens=java.base/java.lang=ALL-UNNAMED \
      --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
      --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
      --add-opens=java.base/java.io=ALL-UNNAMED \
      --add-opens=java.base/java.net=ALL-UNNAMED \
      --add-opens=java.base/java.nio=ALL-UNNAMED \
      --add-opens=java.base/java.util=ALL-UNNAMED \
      --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
      --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
      --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
      --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
      --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
      --add-opens=java.base/sun.security.action=ALL-UNNAMED \
      --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
      -cp "$cls:$JARS" graft.Bench > "$out.stdout" 2> "$out.stderr" )
}
for i in $(seq 1 "$REPS"); do
  echo "[ab] rep $i: r12"
  run /root/r12tree/target/scala-2.13/classes "$OUT/r12_$i.json"
  echo "[ab] rep $i: r13"
  run /root/repo/target/scala-2.13/classes "$OUT/r13_$i.json"
done
echo "[ab] done"
