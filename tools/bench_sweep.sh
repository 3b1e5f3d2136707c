#!/bin/bash
# Round-2 TPU measurement queue.  Runs bench.py configs sequentially,
# appending one labelled JSON line per run to $OUT.  Never run two of
# these (or any second TPU process) at once.
set -u
OUT=${OUT:-/tmp/bench_sweep.jsonl}
run() {
  local label="$1"; shift
  echo "=== $label ($*) $(date -u +%H:%M:%S) ===" >> "$OUT.log"
  env "$@" timeout 2400 python bench.py >> "$OUT.log" 2>&1
  local rc=$?
  local line
  line=$(tail -5 "$OUT.log" | grep -E '^\{' | tail -1)
  echo "{\"label\": \"$label\", \"rc\": $rc, \"result\": ${line:-null}}" >> "$OUT"
  echo "done $label rc=$rc" >> "$OUT.log"
}
for spec in "$@"; do
  label="${spec%%::*}"
  envs="${spec#*::}"
  # shellcheck disable=SC2086
  run "$label" $envs
done
echo ALL_DONE >> "$OUT.log"
