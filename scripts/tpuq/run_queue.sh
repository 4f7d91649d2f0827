#!/bin/bash
# Serial TPU experiment queue (VERDICT r3 #3). One chip, one process at a
# time: each job waits for the tunnel (quick matmul probe), runs under
# `timeout`, and logs to bench_artifacts/tpuq/<name>.out.
#
# Retry semantics (the tunnel flaps in ~7-minute up-windows, so long jobs
# routinely die mid-run): a job is terminal only when its .out ends with
# "== DONE". FAIL (tunnel dropped mid-run -> UNAVAILABLE) and TIMEOUT are
# retried on later passes, up to TPUQ_MAX_ATTEMPTS (default 4) attempts —
# each attempt appends exactly one "== " marker line, so the marker count
# IS the attempt counter. Retries are cheap: the persistent JAX compile
# cache (durable, ~/.cache/evdr_jax_cache) skips recompiles, and the long
# scripts (bench_pq, qat_quality) checkpoint per-section.
#
# Restart-safe and double-run-safe (flock). Launch:
#   setsid nohup bash scripts/tpuq/run_queue.sh >/tmp/tpuq_runner.out 2>&1 &
set -u
cd "$(dirname "$0")/../.."
OUT=bench_artifacts/tpuq
mkdir -p "$OUT"
LOG="$OUT/log"
JOBS="${1:-scripts/tpuq/jobs.txt}"
MAX_ATTEMPTS="${TPUQ_MAX_ATTEMPTS:-4}"
MAX_PASSES="${TPUQ_MAX_PASSES:-200}"

exec 9>"$OUT/runner.lock"
if ! flock -n 9; then
  echo "another run_queue.sh holds $OUT/runner.lock; exiting" >&2
  exit 1
fi
echo $$ > "$OUT/runner.pid"

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

# Bounded: give up after ~25 min so the outer pass loop keeps cycling (an
# hours-long outage must not kill the queue — that is how the r3 /tmp
# queue starved).
wait_tpu() {
  local tries=0
  while ! probe; do
    tries=$((tries+1))
    say "tpu DOWN (probe $tries); sleeping 45s"
    if [ "$tries" -ge 33 ]; then return 1; fi
    sleep 45
  done
  return 0
}

for pass in $(seq 1 "$MAX_PASSES"); do
  pending=0
  ran=0
  while IFS='|' read -r name tmo cmd; do
    [ -z "$name" ] && continue
    case "$name" in \#*) continue;; esac
    f="$OUT/$name.out"
    if [ -f "$f" ] && tail -1 "$f" | grep -q "^== DONE"; then
      continue
    fi
    att=$(grep -c '^== ' "$f" 2>/dev/null || true)
    att=${att:-0}
    if [ "$att" -ge "$MAX_ATTEMPTS" ]; then
      continue  # exhausted; counted as terminal
    fi
    pending=1
    if ! wait_tpu; then
      say "pass $pass: tpu stayed down; re-cycling"
      break
    fi
    say "start $name (attempt $((att+1))/$MAX_ATTEMPTS): $cmd (timeout ${tmo}s)"
    t0=$(date +%s)
    timeout "$tmo" bash -c "$cmd" >> "$f" 2>&1
    rc=$?
    dt=$(( $(date +%s) - t0 ))
    ran=1
    if [ $rc -eq 124 ]; then
      echo "== TIMEOUT after ${dt}s" >> "$f"; say "TIMEOUT $name (${dt}s)"
    elif [ $rc -ne 0 ]; then
      echo "== FAIL rc=$rc after ${dt}s" >> "$f"; say "FAIL $name rc=$rc (${dt}s)"
    else
      echo "== DONE in ${dt}s" >> "$f"; say "done $name (${dt}s)"
    fi
  done < "$JOBS"
  if [ "$pending" -eq 0 ]; then
    say "queue drained (all jobs DONE or exhausted)"
    exit 0
  fi
  # nothing ran this pass (tunnel down the whole time) -> brief breather
  [ "$ran" -eq 0 ] && sleep 30
done
say "queue stopped after $MAX_PASSES passes with work still pending"
