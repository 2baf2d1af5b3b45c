#!/bin/bash
# Record a FULL-WIDTH isolated bench baseline (VERDICT r15 item 2).
#
# The two-vector adjudication discipline compares a flagged gate's
# isolated rerun against the PREVIOUS round's isolated reading — but
# the merged live baseline only covers gates that have been flagged at
# least once, so every gate added since the last full freeze
# adjudicates "no_baseline" exactly where adjudication matters most
# (a new gate's first regression). This script records every gate,
# one at a time, each in a fresh JVM on an otherwise idle box
# (SPARK_GRAFT_CPUS=4, 5 iterations, median — the exact protocol of
# tools/adjudicate_bench.sh), against a caller-chosen classes dir so
# the baseline can be pinned to a specific round's binary.
#
# Usage:
#   tools/record_isolated_baseline.sh <classes-dir> <gate-list-file> <out.json>
# e.g.
#   tools/record_isolated_baseline.sh .r15wt/target/scala-2.13/classes \
#     /tmp/gates_112.txt bench_isolated_baseline_r15.json
#
# VERDICT r19 item 2: this script (at round close) is the ONLY writer
# of bench_isolated_baseline.json — post_adjudicate.py merges into
# bench_isolated_latest.json and bands against the freeze COMMIT.
# After recording, run tools/freeze_baseline_meta.py (stamps commit,
# frozen_at_epoch, testdata content fingerprints) and COMMIT both.
set -u
cd "$(dirname "$0")/.."
CLASSES="$1"; LIST="$2"; OUT="$3"
: > "$OUT.tmp"
first=1
printf '{' >> "$OUT.tmp"
while read -r q; do
  [ -z "$q" ] && continue
  out=$(SPARK_GRAFT_SF_DIR="${ADJ_SF_DIR:-/root/testdata/sf0.1}" SPARK_GRAFT_CPUS=4 \
    SPARK_GRAFT_BENCH_ITERS=5 SPARK_GRAFT_BENCH_ONLY="$q" \
    java --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
      --add-opens java.base/java.nio=ALL-UNNAMED \
      --add-opens java.base/java.util=ALL-UNNAMED \
      --add-opens java.base/java.lang=ALL-UNNAMED \
      --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
      -cp "$CLASSES:/opt/spark/jars/*" graft.Bench 2>/dev/null | tail -1)
  iso=$(echo "$out" | sed -n "s/.*\"$q\":\([0-9.]*\).*/\1/p")
  if [ -z "$iso" ]; then
    echo "RECORD $q FAILED" >&2
    continue
  fi
  [ $first -eq 0 ] && printf ',' >> "$OUT.tmp"
  printf '"%s":%s' "$q" "$iso" >> "$OUT.tmp"
  first=0
  echo "RECORD $q $iso" >&2
done < "$LIST"
printf '}\n' >> "$OUT.tmp"
mv "$OUT.tmp" "$OUT"
