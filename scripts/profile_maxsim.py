"""MaxSim kernel profiling: tile sweep + MXU/VPU breakdown (VERDICT r1 #4).

Measures the fused forward on the config-2 workload (256q x 32t vs 1000d x
768t, d=128) across tile configurations, plus diagnostic variants that
isolate where the non-MXU time goes:

- nomask: same kernel with the mask `where` removed (VPU cost of masking)
- nomax: matmul only, no running max (VPU cost of the segmented max)
- --epilogue {sublane,f32,bf16,none,...}: the Lq-sum epilogue variant
  (see ops/pallas_maxsim._finish_sum); 'none' is the epilogue-free ceiling
- --small-lp: switch to the config-5 shape (250k docs x 16 tokens), where
  the epilogue dominates (it runs once per q/doc block with a single
  contraction step to amortize it)

Timing uses the honest remote protocol (distinct inputs per application, K
applications chained in ONE jit, forced fetch). Run: python
scripts/profile_maxsim.py [--sweep] [--backward] [--epilogue E] [--small-lp]
"""

from __future__ import annotations

import argparse
import functools
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

NQ, LQ, ND, LP, D = 256, 32, 1000, 768, 128


def _data(seed=0):
    rng = np.random.default_rng(seed)

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    Q = unit(rng.normal(size=(NQ, LQ, D))).astype(np.float32)
    P = unit(rng.normal(size=(ND, LP, D))).astype(np.float32)
    qm = rng.random((NQ, LQ)) > 0.15
    pm = rng.random((ND, LP)) > 0.1
    return Q, P, qm, pm


def timed_tflops(fn, Qd, Pd, qmd, pmd, K=8, reps=3):
    """K chained applications in one jit; returns best TFLOP/s.

    Every dispatch is distinct (rep-index rolled into the inputs): the remote
    client memoizes identical (program, args) pairs, which would otherwise
    inflate repeat-rep timings by ~5-10%."""
    import jax
    import jax.numpy as jnp

    def g(rep, Q, P, qm, pm):
        tot = jnp.float32(0)
        for i in range(K):
            tot = tot + jnp.sum(fn(jnp.roll(Q, rep * K + i, axis=0), P, qm, pm))
        return tot

    j = jax.jit(g)
    float(j(jnp.int32(99), Qd, Pd, qmd, pmd))  # compile + warm
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        float(j(jnp.int32(rep), Qd, Pd, qmd, pmd))
        best = min(best, time.perf_counter() - t0)
    flops = 2 * NQ * LQ * ND * LP * D * K
    return flops / best / 1e12


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sweep", action="store_true")
    p.add_argument("--backward", action="store_true")
    p.add_argument("--rows", type=int, nargs="+",
                   default=[512, 1024, 2048])
    p.add_argument("--cols", type=int, nargs="+",
                   default=[512, 1024, 2048, 3072])
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the baseline "
                        "measurement into DIR")
    p.add_argument("--epilogue", default="sublane",
                   help="Lq-sum epilogue variant (ops/pallas_maxsim."
                        "_finish_sum): auto, sublane, tokmajor, tokmajor_nt,"
                        " tokchain, tokpre, tokfuse{G}, f32, bf16, f32d,"
                        " reduce, or 'none' = epilogue-free ceiling "
                        "(wrong results, profiling only)")
    p.add_argument("--small-lp", action="store_true",
                   help="config-5 shape: 250k docs x 16 tokens/page")
    p.add_argument("--int8", default="off", choices=["off", "index", "full"],
                   help="profile the int8-index kernel (bf16 dot) or the "
                        "fully-quantized int8xint8 kernel instead of bf16")
    p.add_argument("--int4", default="off", choices=["off", "index", "full"],
                   help="profile the packed-int4 kernel (ops/int4.py token-"
                        "pair layout): 'index' = bf16 dot, 'full' = int8 "
                        "queries x int4 codes on the int8 MXU path")
    p.add_argument("--pq", default="off", choices=["off", "index", "full"],
                   help="profile the fused PQ kernel (decode-in-VMEM, "
                        "int8 books): 'index' = float queries (bf16 dot), "
                        "'full' = int8 queries (int8 x int8 scoring dot "
                        "for compact books)")
    p.add_argument("--pq-m", type=int, default=16,
                   help="PQ subspaces (bytes/token) for --pq")
    p.add_argument("--max-tlp", type=int, default=None,
                   help="cap the lp-tile so long docs split Lp across "
                        "contraction steps (e.g. 384 at Lp=768 -> db=8, "
                        "enabling the token-major epilogue)")
    p.add_argument("--target-rows", type=int, default=None,
                   help="baseline tile rows (QB*Lq budget); default = the "
                        "kernel's own default")
    p.add_argument("--target-cols", type=int, default=None,
                   help="baseline tile cols (DB*TLP budget)")
    a = p.parse_args()

    # validate --epilogue EARLY (it lost argparse `choices` to admit
    # tokfuse{G}): a typo otherwise fails deep in the kernel, after corpus
    # generation and a 40s-3min tunnel compile attempt
    import re

    _known = {"auto", "sublane", "tokmajor", "tokmajor_nt", "tokchain",
              "tokpre", "f32", "bf16", "f32d", "reduce", "none"}
    if not (a.epilogue in _known or re.fullmatch(r"tok(fuse)?\d+", a.epilogue)):
        p.error(f"unknown --epilogue {a.epilogue!r}; expected one of "
                f"{sorted(_known)} or tokfuse<G>/tok<N>")

    global ND, LP
    if a.small_lp:
        ND, LP = 250_000, 16

    import jax
    import jax.numpy as jnp

    from evdr_tpu.ops.pallas_maxsim import _maxsim_pallas_fwd
    from evdr_tpu.utils.timing import enable_persistent_cache, trace_ctx

    enable_persistent_cache()
    Q, P, qm, pm = _data()
    if a.pq != "off":
        from evdr_tpu.ops.pallas_maxsim import (maxsim_pallas_pq,
                                                maxsim_pallas_pqfull)
        from evdr_tpu.ops.pq import encode_pq_device, train_pq

        books = train_pq(P, pm, m=a.pq_m)
        codes = encode_pq_device(P, books, pm)
        Qd, qmd, pmd = map(jnp.asarray, (Q, qm, pm))
        Pd, bkd = jnp.asarray(codes), jnp.asarray(books)
        if a.max_tlp is not None:
            # the PQ kernel has no max_tlp knob (its tlp is bounded by the
            # decode-transient VMEM clamp instead) — fail loudly rather
            # than profile the default tiling under a mislabeled flag
            p.error("--max-tlp is not supported on the --pq path "
                    "(tlp is set by _clamp_pq_tiles)")
        kern = maxsim_pallas_pqfull if a.pq == "full" else maxsim_pallas_pq
        fwd = functools.partial(kern, epilogue=a.epilogue)

        def _wrapq(f):
            return lambda q, p_, qm_, pm_, **kw: f(q, p_, qm_, pm_, bkd, **kw)

        fwd = _wrapq(fwd)
    elif a.int4 != "off":
        from evdr_tpu.ops.int4 import quantize_tokens_int4
        from evdr_tpu.ops.pallas_maxsim import (maxsim_pallas_int4,
                                                maxsim_pallas_int4full)

        packed, scales = quantize_tokens_int4(P, pm)
        Qd, qmd, pmd = map(jnp.asarray, (Q, qm, pm))
        Pd, scd = jnp.asarray(packed), jnp.asarray(scales)
        kern = (maxsim_pallas_int4full if a.int4 == "full"
                else maxsim_pallas_int4)
        fwd = functools.partial(kern, epilogue=a.epilogue, max_tlp=a.max_tlp)

        def _wrap4(f):
            return lambda q, p_, qm_, pm_, **kw: f(q, p_, scd, qm_, pm_, **kw)

        fwd = _wrap4(fwd)
    elif a.int8 != "off":
        from evdr_tpu.ops.pallas_maxsim import (maxsim_pallas_int8,
                                                maxsim_pallas_int8full)
        from evdr_tpu.ops.quantize import quantize_tokens_int8

        codes, scales = quantize_tokens_int8(P, pm)
        Qd, qmd, pmd = map(jnp.asarray, (Q, qm, pm))
        Pd, scd = jnp.asarray(codes), jnp.asarray(scales)
        kern = (maxsim_pallas_int8full if a.int8 == "full"
                else maxsim_pallas_int8)
        fwd = functools.partial(kern, epilogue=a.epilogue, max_tlp=a.max_tlp)

        def _wrap(f):
            return lambda q, p_, qm_, pm_, **kw: f(q, p_, scd, qm_, pm_, **kw)

        fwd = _wrap(fwd)
    else:
        Qd, Pd, qmd, pmd = map(jnp.asarray, (Q, P, qm, pm))
        fwd = functools.partial(_maxsim_pallas_fwd, epilogue=a.epilogue,
                                max_tlp=a.max_tlp)

    tile_kw = {}
    if a.target_rows is not None:
        tile_kw["target_rows"] = a.target_rows
    if a.target_cols is not None:
        tile_kw["target_cols"] = a.target_cols
    fwd_base = functools.partial(fwd, **tile_kw) if tile_kw else fwd

    # A failing baseline (VMEM overflow at this tiling) must not kill the
    # sweep: the sweep exists precisely to find tilings that DO compile
    # (the int4 small-Lp auto tiling scope-OOMs — bench_artifacts/tpuq).
    try:
        with trace_ctx(a.trace):
            base = timed_tflops(
                lambda q, p_, qm_, pm_: fwd_base(q, p_, qm_, pm_),
                Qd, Pd, qmd, pmd)
        print(f"baseline (epilogue={a.epilogue}{', ' + str(tile_kw) if tile_kw else ''}):"
              f" {base:.1f} TFLOP/s", flush=True)
    except Exception as e:
        print(f"baseline (epilogue={a.epilogue}): FAIL {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        if not a.sweep:
            raise

    if a.sweep:
        results = []
        for r in a.rows:
            for c in a.cols:
                try:
                    t = timed_tflops(
                        functools.partial(fwd, target_rows=r, target_cols=c),
                        Qd, Pd, qmd, pmd)
                except Exception as e:  # VMEM overflow etc.
                    print(f"rows={r:5d} cols={c:5d}: FAIL {type(e).__name__}",
                          flush=True)
                    continue
                results.append((t, r, c))
                print(f"rows={r:5d} cols={c:5d}: {t:6.1f} TFLOP/s", flush=True)
        t, r, c = max(results)
        print(f"best: {t:.1f} TFLOP/s at rows={r} cols={c}", flush=True)

    if a.backward:
        from evdr_tpu.ops.pallas_maxsim import maxsim_pallas

        def loss(q, p_, qm_, pm_):
            return jnp.sum(maxsim_pallas(q, p_, qm_, pm_) ** 2)

        gradfn = jax.grad(loss, argnums=(0, 1))

        def fwdbwd(q, p_, qm_, pm_):
            dq, dp = gradfn(q, p_, qm_, pm_)
            return jnp.sum(dq) + jnp.sum(dp)

        t = timed_tflops(fwdbwd, Qd, Pd, qmd, pmd, K=4)
        # fwd+bwd = fwd train (1x sim) + combined bwd (1x sim recompute +
        # 2 gradient matmuls) ~ 4x the forward matmul FLOPs
        print(f"fwd+bwd chained: {t:.1f} 'fwd-equivalent' TFLOP/s "
              f"(~{t * 4:.0f} actual)", flush=True)


if __name__ == "__main__":
    main()
