"""PQ serving-path benchmark: throughput + index bytes vs int8/bf16.

Measures exact top-10 retrieval over a synthetic corpus for three index
tiers at the same (N, Lp) shape, with the honest remote protocol (distinct
inputs, K chained applications in one jit, forced fetch — CLAUDE.md):

- bf16 tokens + fused Pallas kernel      (2 D bytes/token)
- int8 tokens + int8-index kernel        (D + 4 bytes/token)
- int4 packed codes (ops/int4.py)        (D/2 + 4 bytes/token)
- PQ / OPQ codes + LUT (ops/pq.py)       (M bytes/token)

PQ trades MXU-kernel throughput for an 8x (at D=128, M=16) smaller index —
the pages-per-chip lever. Run: python scripts/bench_pq.py
[--n_docs 250000 --lp 16 --batch 64 --pq_m 16]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timed_qps(fn, args, nq: int, K: int = 3, reps: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    def g(rep, Q, qm, *rest):
        tot = jnp.float32(0)
        for i in range(K):
            v, _ = fn(jnp.roll(Q, rep * K + i, axis=0), qm, *rest)
            tot = tot + jnp.sum(v)
        return tot

    j = jax.jit(g)
    float(j(np.int32(99), *args))  # compile + warm
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        float(j(np.int32(rep), *args))
        best = min(best, time.perf_counter() - t0)
    return nq * K / best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_docs", type=int, default=250_000)
    p.add_argument("--lp", type=int, default=16)
    p.add_argument("--lq", type=int, default=32)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--pq_m", type=int, default=16)
    p.add_argument("--chunk_p", type=int, default=4096)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas, maxsim_pallas_int8
    from evdr_tpu.ops.pq import encode_pq, maxsim_pq_xla, train_pq
    from evdr_tpu.ops.quantize import quantize_tokens_int8
    from evdr_tpu.utils.timing import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    # clustered corpus (PQ presumes structure, like real patch embeddings)
    protos = unit(rng.normal(size=(256, a.d))).astype(np.float32)
    pick = rng.integers(0, 256, size=(a.n_docs, a.lp))
    P = unit(protos[pick] + 0.15 * rng.normal(size=(a.n_docs, a.lp, a.d))
             ).astype(np.float32)
    pm = rng.random((a.n_docs, a.lp)) > 0.1
    # queries = noisy doc-token copies (timing is shape-only, but the
    # quality probe needs a real nearest neighbor — random queries make
    # top-1 a coin flip between near-equal scores)
    src = rng.integers(0, min(a.n_docs, 20_000), size=a.batch)
    Q = P[src][:, rng.integers(0, a.lp, size=a.lq), :]
    Q = unit(Q + 0.05 * rng.normal(size=Q.shape)).astype(np.float32)
    qm = rng.random((a.batch, a.lq)) > 0.15
    Qd, qmd, pmd = map(jnp.asarray, (Q, qm, pm))

    results = {}
    on_tpu = jax.default_backend() in ("tpu", "axon")

    # --- bf16 fused kernel / xla fallback
    Pd = jnp.asarray(P)
    if on_tpu:
        def f_bf16(q, m, P_, pm_):
            sc = maxsim_pallas(q, P_, m, pm_)
            return jax.lax.top_k(sc, a.k)
    else:
        from evdr_tpu.ops.maxsim import maxsim_xla

        def f_bf16(q, m, P_, pm_):
            sc = maxsim_xla(q, P_, m, pm_, chunk_p=1024)
            return jax.lax.top_k(sc, a.k)
    results["bf16"] = {
        "qps": timed_qps(lambda q, m, P_, pm_: f_bf16(q, m, P_, pm_),
                         (Qd, qmd, Pd, pmd), a.batch),
        "index_bytes": int(a.n_docs * a.lp * a.d * 2)}
    del Pd

    # --- int8 index
    codes, scales = quantize_tokens_int8(P, pm)
    Cd, Sd = jnp.asarray(codes), jnp.asarray(scales)
    if on_tpu:
        def f_i8(q, m, C_, S_, pm_):
            sc = maxsim_pallas_int8(q, C_, S_, m, pm_)
            return jax.lax.top_k(sc, a.k)

        results["int8"] = {
            "qps": timed_qps(lambda q, m, *r: f_i8(q, m, *r),
                             (Qd, qmd, Cd, Sd, pmd), a.batch),
            "index_bytes": int(a.n_docs * a.lp * (a.d + 4))}
    del Cd, Sd

    # --- int4 packed index (capacity rung between int8 and PQ): Pallas
    # in-VMEM unpack kernel on TPU, chunked unpack + matmul elsewhere
    from evdr_tpu.ops.int4 import maxsim_int4_xla, quantize_tokens_int4

    packed4, scales4 = quantize_tokens_int4(P, pm)
    C4d, S4d = jnp.asarray(packed4), jnp.asarray(scales4)

    if on_tpu:
        from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int4

        def f_i4(q, m, C_, S_, pm_):
            sc = maxsim_pallas_int4(q, C_, S_, m, pm_, target_rows=2048)
            return jax.lax.top_k(sc, a.k)
    else:
        def f_i4(q, m, C_, S_, pm_):
            sc = maxsim_int4_xla(q, C_, S_, m, pm_, chunk_p=a.chunk_p)
            return jax.lax.top_k(sc, a.k)

    results["int4"] = {
        "qps": timed_qps(lambda q, m, *r: f_i4(q, m, *r),
                         (Qd, qmd, C4d, S4d, pmd), a.batch),
        "index_bytes": int(a.n_docs * a.lp * (a.d // 2 + 4))}
    del C4d, S4d

    # --- PQ (encode timed: host numpy vs accelerator — the O(corpus)
    # index-build step; engine.build auto-routes to the device past 2M
    # tokens)
    from evdr_tpu.ops.pq import encode_pq_device

    books = train_pq(P, pm, m=a.pq_m)
    n_tok = a.n_docs * a.lp
    t0 = time.perf_counter()
    pq_codes = encode_pq(P, books, pm)
    t_host = time.perf_counter() - t0
    # warm/compile at the EXACT chunk shape the timed run uses: chunk
    # must be a token count both runs share (262144 is not a multiple of
    # every lp — a mismatched tail shape would put a 40s-3min tunnel
    # compile inside t_dev)
    nw = min(a.n_docs, max(1, 262_144 // a.lp))
    chunk = nw * a.lp
    encode_pq_device(P[:nw], books, pm[:nw], chunk_tokens=chunk)
    t0 = time.perf_counter()
    pq_codes_dev = encode_pq_device(P, books, pm, chunk_tokens=chunk)
    t_dev = time.perf_counter() - t0
    results["pq_encode"] = {
        "host_tok_per_s": round(n_tok / t_host),
        "device_tok_per_s": round(n_tok / t_dev),
        "agree": float(np.mean(pq_codes == pq_codes_dev))}
    del pq_codes_dev
    PQd, Bd = jnp.asarray(pq_codes), jnp.asarray(books)

    def f_pq(q, m, C_, pm_, B_):
        sc = maxsim_pq_xla(q, C_, m, pm_, B_, chunk_p=a.chunk_p)
        return jax.lax.top_k(sc, a.k)

    results["pq"] = {
        "qps": timed_qps(lambda q, m, *r: f_pq(q, m, *r),
                         (Qd, qmd, PQd, pmd, Bd), a.batch),
        "index_bytes": int(a.n_docs * a.lp * a.pq_m)}
    del PQd, Bd

    # --- OPQ (same bytes; expanded (M, K, D) books -> a D-wide LUT einsum,
    # the only serving-cost difference vs plain PQ)
    from evdr_tpu.ops.pq import expand_books, train_opq

    obooks, rot = train_opq(P, pm, m=a.pq_m)
    opq_codes = encode_pq(P, obooks, pm, rot=rot)
    ebooks = expand_books(obooks, rot)
    OQd, EBd = jnp.asarray(opq_codes), jnp.asarray(ebooks)
    results["opq"] = {
        "qps": timed_qps(lambda q, m, *r: f_pq(q, m, *r),
                         (Qd, qmd, OQd, pmd, EBd), a.batch),
        "index_bytes": int(a.n_docs * a.lp * a.pq_m)}
    del OQd, EBd

    # quality: top-1 agreement vs the bf16 path on a small exact slice
    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.ops.pq import decode_pq

    ns = min(a.n_docs, 20_000)
    ex = maxsim_numpy(Q[:16], P[:ns], qm[:16], pm[:ns])
    pq_sc = np.asarray(maxsim_pq_xla(Q[:16], pq_codes[:ns], qm[:16],
                                     pm[:ns], books, chunk_p=2048))
    results["pq"]["top1_vs_exact"] = float(
        np.mean(np.argmax(pq_sc, 1) == np.argmax(ex, 1)))
    opq_sc = np.asarray(maxsim_pq_xla(Q[:16], opq_codes[:ns], qm[:16],
                                      pm[:ns], ebooks, chunk_p=2048))
    results["opq"]["top1_vs_exact"] = float(
        np.mean(np.argmax(opq_sc, 1) == np.argmax(ex, 1)))
    i4_sc = np.asarray(maxsim_int4_xla(Q[:16], packed4[:ns], scales4[:ns],
                                       qm[:16], pm[:ns], chunk_p=2048))
    results["int4"]["top1_vs_exact"] = float(
        np.mean(np.argmax(i4_sc, 1) == np.argmax(ex, 1)))

    print(json.dumps({"backend": jax.default_backend(),
                      "shape": [a.n_docs, a.lp, a.d, a.batch],
                      **results}))


if __name__ == "__main__":
    main()
