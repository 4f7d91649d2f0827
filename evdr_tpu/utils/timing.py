"""Profiling helpers: blocked wall timers and device memory reporting
(TPU-native replacements for the reference's CUDA memory dump,
mainv2_distill_infonce.py:44-53, and einsum timing prints,
evaluator/retrieval.py:135-145)."""

from __future__ import annotations

import os
import time
from typing import Callable, Dict

import jax


def enable_persistent_cache(path: str = "/tmp/evdr_jax_cache") -> None:
    """Turn on JAX's persistent compilation cache (best effort).

    TPU compiles through the remote tunnel take 1-3 minutes; the cache makes
    repeat invocations (bench reruns, CLI restarts, resumed training) free.
    """
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


class Timer:
    """Wall timer that blocks on device results for honest kernel timing."""

    def __init__(self):
        self.records: Dict[str, list] = {}

    def timed(self, name: str, fn: Callable, *args, warmup: int = 1, iters: int = 10,
              **kwargs):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args, **kwargs))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        self.records.setdefault(name, []).append(dt)
        return out, dt

    def stats(self, name: str) -> Dict[str, float]:
        xs = self.records.get(name, [])
        if not xs:
            return {}
        return {"mean_s": sum(xs) / len(xs), "min_s": min(xs), "max_s": max(xs),
                "n": len(xs)}


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
