#!/bin/bash
# Bench-regression adjudication protocol (VERDICT r8 item 1).
#
# For each query flagged >25% slower in bench_regressions.json, re-run it
# ALONE in a fresh JVM (nothing else on the session, 5 iterations, median)
# at the same SF as the flagged vector. A flag is adjudicated:
#   noise — isolated median <= prev * 1.25 (the regression does not
#           reproduce without the rest of the bench sharing the JVM)
#   real  — isolated median still exceeds prev * 1.25
# Output: one line per query "ISOLATED <name> <median-seconds>" (or
# "ISOLATED <name> FAILED" when the rerun produced no JSON), consumed by
# the adjudication step that records verdicts in bench_adjudication_*.json.
set -u
cd "$(dirname "$0")/.."
QUERIES="$*"
for q in $QUERIES; do
  out=$(SPARK_GRAFT_SF_DIR="${ADJ_SF_DIR:-/root/testdata/sf0.1}" SPARK_GRAFT_CPUS=4 \
    SPARK_GRAFT_BENCH_ITERS=5 SPARK_GRAFT_BENCH_ONLY="$q" \
    java --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
      --add-opens java.base/java.nio=ALL-UNNAMED \
      --add-opens java.base/java.util=ALL-UNNAMED \
      --add-opens java.base/java.lang=ALL-UNNAMED \
      --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
      -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench 2>/dev/null | tail -1)
  iso=$(echo "$out" | sed -n "s/.*\"$q\":\([0-9.]*\).*/\1/p")
  if [ -z "$iso" ]; then
    # a crashed/JSON-less rerun must surface as a FAILED adjudication,
    # never masquerade as noise
    echo "ISOLATED $q FAILED"
  else
    echo "ISOLATED $q $iso"
  fi
done
