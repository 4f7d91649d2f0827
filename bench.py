"""Headline benchmark: MaxSim retrieval throughput (queries/sec) on TPU.

Workload mirrors the ViDoRe eval path (BASELINE config 2): ColQwen-scale
teacher index (500 pages x 768 patch tokens x 128 dims), 256 queries x 32
tokens, masked MaxSim scoring with the fused Pallas kernel in the production
serving configuration: int8-quantized index + on-device int8 queries
(int8 x int8 MXU dot; measured 1.000 top-1 agreement and 0.2% max relative
score error vs the fp32 oracle, and 0.000 nDCG@5 delta on the synthetic
suite — scripts/index_quality.py). The fused bf16 kernel's q/s is also
reported as a field.

Prints ONE JSON line:
  {"metric": "maxsim_queries_per_sec", "value": N, "unit": "q/s",
   "vs_baseline": N}
``vs_baseline`` = speedup over the fp32 CPU (XLA) baseline on the identical
workload (target from BASELINE.md: >= 10x). The CPU baseline is measured in a
subprocess on a query subset (queries are embarrassingly parallel, qps scales
linearly) and cached per workload.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

NQ, LQ, ND, LP, D = 256, 32, 500, 768, 128
CPU_NQ = 32  # CPU baseline measured on a subset, scaled linearly
CACHE = pathlib.Path("/tmp/evdr_bench_cpu_baseline.json")
WORKLOAD_KEY = f"{NQ}x{LQ}x{ND}x{LP}x{D}"


def make_workload(nq):
    rng = np.random.default_rng(0)

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    Q = unit(rng.normal(size=(nq, LQ, D))).astype(np.float32)
    P = unit(rng.normal(size=(ND, LP, D))).astype(np.float32)
    qmask = rng.random((nq, LQ)) > 0.15
    pmask = rng.random((ND, LP)) > 0.1
    return Q, P, qmask, pmask


def _timed_chained(run, args, K=8, reps=None):
    """Honest timing on a tunneled TPU backend requires all of:
    - K kernel applications CHAINED INSIDE one program (per-dispatch tunnel
      RTT is ~30 ms and would otherwise dominate device time),
    - distinct inputs per application AND per timing rep (the client memoizes
      identical dispatches — a repeated (program, args) pair can be served
      from cache, so every rep carries a fresh rep-index argument),
    - a forced device->host fetch (block_until_ready does not reliably
      block on the experimental remote backend),
    - big arrays as jit ARGUMENTS (closure capture inlines them into the
      shipped program, which remote-compile rejects).

    Returns a stats dict {qps, qps_min, qps_max, reps}: same-day chip runs
    have shown up to 9% drift on UNCHANGED code (wave-1 vs headline2 bf16,
    RESULTS.md round-5 section), larger than the 1-6% effects tiling
    decisions rest on — so the headline is the MEDIAN of ``reps`` timed
    dispatches (default 7, env EVDR_BENCH_REPS) with the spread reported
    alongside, not a best-of-3."""
    import statistics

    import jax
    import jax.numpy as jnp

    if reps is None:
        reps = int(os.environ.get("EVDR_BENCH_REPS", "7"))

    def chained(rep, q, *rest):
        total = jnp.float32(0)
        for i in range(K):
            total = total + jnp.sum(run(jnp.roll(q, rep * K + i, axis=0), *rest))
        return total

    g = jax.jit(chained)
    float(g(jnp.int32(99), *args))  # compile + warm
    times = []
    for rep in range(reps):
        t0 = time.perf_counter()
        float(g(jnp.int32(rep), *args))
        times.append(time.perf_counter() - t0)
    return {
        "qps": NQ * K / statistics.median(times),
        "qps_min": NQ * K / max(times),
        "qps_max": NQ * K / min(times),
        "reps": reps,
    }


_PROBE_SNIPPET = r"""
import jax, jax.numpy as jnp
x = jnp.ones((8, 8))
assert float(jnp.sum(x @ x)) == 512.0
print(jax.default_backend())
"""


def tpu_available(retries: int = None, probe_timeout: int = 240,
                  sleep_s: int = 30, wait_s: float = None) -> bool:
    """Probe the axon tunnel in a SUBPROCESS before touching jax in-process.

    The tunnel can be down for extended stretches; in-process backend init
    then hangs ~5 min and the failure is cached for the life of the process.
    A subprocess probe keeps this process clean and lets us retry.

    Round-3 postmortem: ONE failed probe -> CPU fallback lost the round's
    perf record to a transient outage. Default behavior is now a bounded
    wait-and-retry window: keep probing every ``sleep_s`` until ``wait_s``
    wall-clock seconds elapse (env EVDR_BENCH_TPU_WAIT_S, default 600
    — chosen so wait + CPU-fallback measurement stays comfortably inside
    an unknown driver timeout: an empty killed record is worse than a
    fallback record carrying last_known_tpu_qps;
    worst case ~wait_s + probe_timeout). ``retries`` caps the number of
    probes when given (tests / quick checks)."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return False
    if retries is None and os.environ.get("EVDR_BENCH_TPU_RETRIES"):
        retries = int(os.environ["EVDR_BENCH_TPU_RETRIES"])
        if wait_s is None and not os.environ.get("EVDR_BENCH_TPU_WAIT_S"):
            # an EXPLICIT retry count means "run all N probes": don't let
            # the default wait window cut it short (each hanging probe
            # burns up to probe_timeout, so N=10 needs ~N*(240+30)s)
            wait_s = retries * (probe_timeout + sleep_s) + 60.0
    if wait_s is None:
        wait_s = float(os.environ.get("EVDR_BENCH_TPU_WAIT_S", "600"))
    deadline = time.monotonic() + wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run([sys.executable, "-c", _PROBE_SNIPPET],
                                 capture_output=True, text=True,
                                 timeout=probe_timeout)
            if out.returncode == 0:
                return True
            print(f"[bench] TPU probe {attempt} failed: "
                  f"{out.stdout.strip().splitlines()[-1:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"[bench] TPU probe {attempt} timed out", file=sys.stderr)
        if retries is not None and attempt >= retries:
            return False
        if time.monotonic() + sleep_s >= deadline:
            print(f"[bench] TPU wait window ({wait_s:.0f}s) exhausted after "
                  f"{attempt} probes", file=sys.stderr)
            return False
        time.sleep(sleep_s)


# In-repo, NOT /tmp: the 8/19 machine restart wiped /tmp, and this file is
# the outage fallback's freshest source — it must survive restarts.
_LAST_QPS_FILE = (pathlib.Path(__file__).resolve().parent
                  / "bench_artifacts" / "last_tpu_qps.json")


def last_known_tpu_qps():
    """(source, qps) of the newest REAL chip headline, or None.

    Sources: the driver's committed BENCH_r*.json artifacts (skipping
    cpu-fallback records) and this box's own last successful run
    (/tmp/evdr_last_tpu_qps.json, which postdates any artifact). Lets a
    fallback record carry the last good number so a parser never mistakes
    a tunnel outage for a 7000x regression."""
    best = None
    for f in sorted(pathlib.Path(__file__).resolve().parent.glob(
            "BENCH_r*.json")):
        try:
            tail = json.loads(f.read_text()).get("tail", "")
        except Exception:
            continue
        for line in tail.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except Exception:
                continue
            if (rec.get("metric") == "maxsim_queries_per_sec"
                    and "cpu-fallback" not in rec.get("backend", "")):
                best = (f.name, float(rec["value"]))
    try:
        rec = json.loads(_LAST_QPS_FILE.read_text())
        best = (rec["source"], float(rec["qps"]))
    except Exception:
        pass
    return best


def measure_tpu_qps():
    """Returns (int8-serving q/s, bf16 q/s)."""
    import jax

    # persistent compilation cache: repeat runs skip the 1-2 min compile
    from evdr_tpu.utils.timing import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from evdr_tpu.ops.maxsim import maxsim_xla
    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas, maxsim_pallas_int8full
    from evdr_tpu.ops.quantize import quantize_tokens_int8

    Qh, Ph, qmh, pmh = make_workload(NQ)
    Q, P, qmask, pmask = map(jnp.asarray, (Qh, Ph, qmh, pmh))
    on_tpu = jax.default_backend() in ("tpu", "axon")

    if not on_tpu:
        st = _timed_chained(
            lambda q, p, qm, pm: maxsim_xla(q, p, qm, pm, chunk_p=128),
            (Q, P, qmask, pmask))
        return st, st

    codes, scales = quantize_tokens_int8(Ph * pmh[..., None], pmh)
    st_int8 = _timed_chained(
        maxsim_pallas_int8full,
        (Q, jnp.asarray(codes), jnp.asarray(scales), qmask, pmask))
    st_bf16 = _timed_chained(maxsim_pallas, (Q, P, qmask, pmask))
    return st_int8, st_bf16


_CPU_SNIPPET = r"""
import json, os, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import sys
sys.path.insert(0, {repo!r})
import bench
from evdr_tpu.ops.maxsim import maxsim_xla

Q, P, qmask, pmask = map(jnp.asarray, bench.make_workload(bench.CPU_NQ))
f = lambda: maxsim_xla(Q, P, qmask, pmask, chunk_p=128)
jax.block_until_ready(f())
t0 = time.perf_counter()
out = f()
jax.block_until_ready(out)
dt = time.perf_counter() - t0
print(json.dumps({{"cpu_qps": bench.CPU_NQ / dt}}))
"""


def measure_cpu_qps(fresh: bool = True) -> float:
    """fp32 CPU (XLA) baseline qps on the identical workload.

    Measured FRESH per run by default — the /tmp cache drifted the
    ``vs_baseline`` field 6,817x -> 17,416x across rounds (different
    box load when the cache was populated), making round-over-round
    comparisons unfalsifiable. The cache is now only a fallback for when
    the fresh subprocess fails (and is still written for the outage path,
    where burning ~1 min of CPU just to annotate a fallback is wasteful)."""
    if not fresh and CACHE.exists():
        try:
            data = json.loads(CACHE.read_text())
            if data.get("key") == WORKLOAD_KEY:
                return float(data["cpu_qps"])
        except Exception:
            pass
    repo = str(pathlib.Path(__file__).resolve().parent)
    code = _CPU_SNIPPET.format(repo=repo)
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=1800)
        line = out.stdout.strip().splitlines()[-1]
        cpu_qps = float(json.loads(line)["cpu_qps"])
    except Exception:
        # fall back to the cache rather than report nothing
        data = json.loads(CACHE.read_text())
        if data.get("key") != WORKLOAD_KEY:
            raise
        return float(data["cpu_qps"])
    CACHE.write_text(json.dumps({"key": WORKLOAD_KEY, "cpu_qps": cpu_qps}))
    return cpu_qps


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the measured "
                         "section into DIR (perfetto/tensorboard-loadable)")
    args = ap.parse_args()

    from evdr_tpu.utils.timing import trace_ctx

    if not tpu_available():
        # The axon tunnel can be down for extended stretches. Emit an
        # HONEST annotated CPU number instead of hanging ~5 min in backend
        # init and crashing with no JSON line at all.
        try:
            cpu_qps = measure_cpu_qps(fresh=False)
        except Exception as e:
            print(f"[bench] cpu fallback failed too: {e}", file=sys.stderr)
            cpu_qps = 0.0
        known = last_known_tpu_qps()
        rec = {
            "metric": "maxsim_queries_per_sec",
            "value": round(cpu_qps, 1),
            "unit": "q/s",
            "vs_baseline": 1.0,
            "backend": "cpu-fallback (TPU backend unavailable for the whole "
                       "wait window; value is NOT a regression — see "
                       "last_known_tpu_qps)",
        }
        if known is not None:
            rec["last_known_tpu_qps"] = known[1]
            rec["last_known_source"] = known[0]
        print(json.dumps(rec))
        return

    try:
        with trace_ctx(args.trace):
            st_int8, st_bf16 = measure_tpu_qps()
    except Exception as e:
        # A mid-run failure (kernel compile error, tunnel dying between the
        # probe and the measurement) must still leave a parseable record —
        # an uncaught crash prints no JSON line at all.
        print(f"[bench] TPU measurement failed mid-run: {e}", file=sys.stderr)
        known = last_known_tpu_qps()
        rec = {
            "metric": "maxsim_queries_per_sec",
            "value": 0.0,
            "unit": "q/s",
            "vs_baseline": 0.0,
            "backend": f"tpu-error ({type(e).__name__}; see stderr — value "
                       "is NOT a measurement)",
        }
        if known is not None:
            rec["last_known_tpu_qps"] = known[1]
            rec["last_known_source"] = known[0]
        print(json.dumps(rec))
        return
    tpu_qps = st_int8["qps"]
    try:  # record the chip number for future outage fallbacks
        _LAST_QPS_FILE.write_text(json.dumps(
            {"source": "local-run", "qps": round(tpu_qps, 1)}))
    except Exception:
        pass
    try:
        cpu_qps = measure_cpu_qps()
        vs = tpu_qps / cpu_qps
    except Exception as e:  # CPU baseline unavailable: report speedup 0
        print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)
        cpu_qps, vs = 0.0, 0.0
    print(json.dumps({
        "metric": "maxsim_queries_per_sec",
        "value": round(tpu_qps, 1),  # MEDIAN of `reps` chained dispatches
        "unit": "q/s",
        "vs_baseline": round(vs, 2),
        "reps": st_int8["reps"],
        "spread": [round(st_int8["qps_min"], 1),
                   round(st_int8["qps_max"], 1)],
        "bf16_qps": round(st_bf16["qps"], 1),
        "bf16_spread": [round(st_bf16["qps_min"], 1),
                        round(st_bf16["qps_max"], 1)],
        "cpu_qps": round(cpu_qps, 2),  # measured fresh this run
        "serving_config": "int8 index + on-device int8 queries (top-1 parity "
                          "1.000 vs fp32)",
    }))


if __name__ == "__main__":
    main()
