#!/bin/bash
# Serial TPU experiment queue (VERDICT r3 #3). One chip, one process at a
# time: each job waits for the tunnel (quick matmul probe), runs under
# `timeout`, and logs to bench_artifacts/tpuq/<name>.out. Restart-safe:
# a job whose .out already ends with "== DONE" or "== TIMEOUT" is skipped,
# so re-running the script resumes where it left off.
#
# Usage: bash scripts/tpuq/run_queue.sh [jobs-file]   (default: jobs.txt)
set -u
cd "$(dirname "$0")/../.."
OUT=bench_artifacts/tpuq
mkdir -p "$OUT"
LOG="$OUT/log"
JOBS="${1:-scripts/tpuq/jobs.txt}"

say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

# A healthy probe completes in <10s (tunnel RTT ~30ms, small program); a
# down tunnel HANGS in backend init (~5 min before raising UNAVAILABLE), so
# a short timeout is the down-detector. 90s leaves headroom for a cold
# backend setup on a fresh up-window.
probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
assert float(jnp.sum(x@x)) > 0" >/dev/null 2>&1
}

wait_tpu() {
  local tries=0
  while ! probe; do
    tries=$((tries+1))
    say "tpu DOWN (probe $tries); sleeping 45s"
    if [ "$tries" -ge 90 ]; then return 1; fi
    sleep 45
  done
  return 0
}

while IFS='|' read -r name tmo cmd; do
  [ -z "$name" ] && continue
  case "$name" in \#*) continue;; esac
  f="$OUT/$name.out"
  if [ -f "$f" ] && tail -1 "$f" | grep -q "^== \(DONE\|TIMEOUT\)"; then
    say "skip $name (already complete)"
    continue
  fi
  if ! wait_tpu; then
    say "giving up waiting for tpu before $name"
    break
  fi
  say "start $name: $cmd (timeout ${tmo}s)"
  t0=$(date +%s)
  timeout "$tmo" bash -c "$cmd" > "$f" 2>&1
  rc=$?
  dt=$(( $(date +%s) - t0 ))
  if [ $rc -eq 124 ]; then
    echo "== TIMEOUT after ${dt}s" >> "$f"; say "TIMEOUT $name (${dt}s)"
  elif [ $rc -ne 0 ]; then
    echo "== FAIL rc=$rc after ${dt}s" >> "$f"; say "FAIL $name rc=$rc (${dt}s)"
  else
    echo "== DONE in ${dt}s" >> "$f"; say "done $name (${dt}s)"
  fi
done < "$JOBS"
say "queue drained"
