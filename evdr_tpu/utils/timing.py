"""Profiling helpers: blocked wall timers and device memory reporting
(TPU-native replacements for the reference's CUDA memory dump,
mainv2_distill_infonce.py:44-53, and einsum timing prints,
evaluator/retrieval.py:135-145)."""

from __future__ import annotations

import os

from typing import Dict

import jax


def enable_persistent_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (best effort).

    TPU compiles through the remote tunnel take 1-3 minutes; the cache makes
    repeat invocations (bench reruns, CLI restarts, resumed training) free.
    Default location is DURABLE (~/.cache, not /tmp): the 8/19 machine
    restart wiped /tmp and turned every queued benchmark retry into a cold
    compile. Override with EVDR_JAX_CACHE.
    """
    try:
        if path is None:
            path = os.environ.get(
                "EVDR_JAX_CACHE",
                os.path.join(os.path.expanduser("~"), ".cache",
                             "evdr_jax_cache"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


# NOTE: there is deliberately NO generic repeat-and-block wall timer here.
# On this repo's remote-TPU backend, identical repeated dispatches are
# MEMOIZED by the client and jax.block_until_ready does not reliably block,
# so the obvious `for _ in range(iters): fn(*args)` pattern reports
# arbitrarily inflated throughput. Honest timing needs distinct input
# buffers per iteration, K applications chained inside ONE jit, and a
# forced float(jnp.sum(...)) fetch — see bench.py:_timed_chained for the
# canonical implementation.


def device_memory_report() -> Dict[str, float]:
    """Per-device live-buffer bytes (best effort across backends)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", -1),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
            }
        except Exception:
            out[str(d)] = {}
    return out


def trace_ctx(trace_dir=None):
    """jax.profiler trace context (SURVEY §5 profiling hook).

    With a directory, captures a perfetto/tensorboard-loadable trace of
    everything run inside the context (``tensorboard --logdir DIR`` or
    ui.perfetto.dev on the .trace.json.gz); with None it is a no-op, so call
    sites can wrap their hot section unconditionally:

        with trace_ctx(args.trace):
            run_benchmark()
    """
    import contextlib

    if not trace_dir:
        return contextlib.nullcontext()
    os.makedirs(trace_dir, exist_ok=True)
    return jax.profiler.trace(str(trace_dir))
