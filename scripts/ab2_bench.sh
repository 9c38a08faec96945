#!/bin/bash
# Generalized interleaved A/B bench between two class trees.
# Usage: scripts/ab2_bench.sh <clsA> <clsB> <reps> <outdir> [BENCH_ONLY]
set -u
CLSA="${1:?clsA}"; CLSB="${2:?clsB}"; REPS="${3:?reps}"; OUT="${4:?outdir}"
ONLY="${5:-}"
mkdir -p "$OUT"
JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
run() {
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
  echo "[ab2] rep $i: A"
  run "$CLSA" "$OUT/A_$i.json"
  echo "[ab2] rep $i: B"
  run "$CLSB" "$OUT/B_$i.json"
done
echo "[ab2] done"
