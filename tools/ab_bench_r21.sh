#!/bin/bash
# Interleaved A/B full-bench comparison for the r21 optimization round
# (the graft-sandbox-drift discipline: never compare across hours —
# alternate the two binaries inside one window, same JVM flags, fresh
# JVM per run, full suite each time).
#
#   A = r20-close binary (worktree at cd757d4)
#   B = current working tree classes
#
# Usage: tools/ab_bench_r21.sh <A-classes> <B-classes> <outdir> [rounds]
set -u
cd "$(dirname "$0")/.."
A="$(readlink -f "$1")"; B="$(readlink -f "$2")"; OUT="$3"; ROUNDS="${4:-2}"
mkdir -p "$OUT"
run() { # $1 classes, $2 outfile — runs in a scratch cwd so the bench's
        # artifact writes (bench_results.json etc.) never touch the repo
  local scratch
  scratch=$(mktemp -d /tmp/ab_bench.XXXXXX)
  ( cd "$scratch" &&
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ITERS=3 SPARK_GRAFT_NO_ADJUDICATE=1 \
      java --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
        --add-opens java.base/java.nio=ALL-UNNAMED \
        --add-opens java.base/java.util=ALL-UNNAMED \
        --add-opens java.base/java.lang=ALL-UNNAMED \
        --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
        -Xmx48g -cp "$1:/opt/spark/jars/*" graft.Bench \
        > "$2" 2>"$2.err" )
  grep '"metric":"total"' "$2" | head -1
}
for i in $(seq 1 "$ROUNDS"); do
  echo "== round $i A ($(date +%T)) ==" >&2
  run "$A" "$OUT/a$i.out" > "$OUT/a$i.json"
  echo "== round $i B ($(date +%T)) ==" >&2
  run "$B" "$OUT/b$i.out" > "$OUT/b$i.json"
done
echo "done: $OUT" >&2
