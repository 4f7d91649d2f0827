"""PQ serving-path benchmark: throughput + index bytes vs int8/bf16.

Measures exact top-10 retrieval over a synthetic corpus for the index-tier
ladder at the same (N, Lp) shape, with the honest remote protocol (distinct
inputs, K chained applications in one jit, forced fetch — CLAUDE.md):

- bf16 tokens + fused Pallas kernel      (2 D bytes/token)
- int8 tokens + int8-index kernel        (D + 4 bytes/token)
- int4 packed codes (ops/int4.py)        (D/2 + 4 bytes/token)
- PQ / OPQ codes + LUT (ops/pq.py)       (M bytes/token)

PQ trades MXU-kernel throughput for an 8x (at D=128, M=16) smaller index —
the pages-per-chip lever. Run: python scripts/bench_pq.py
[--n_docs 250000 --lp 16 --batch 64 --pq_m 16]

RESUMABLE per tier: each completed section is checkpointed to --state
(bench_artifacts/tpuq/pq_state.json) keyed by the shape, so a tunnel flap
mid-run (the ~7-minute up-windows) only costs the tier in flight. A rerun
skips finished tiers and prints the combined JSON when all are present.
"""

from __future__ import annotations

import argparse
import json
import os
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


def _load_state(path: str, key: str) -> dict:
    try:
        with open(path) as f:
            all_state = json.load(f)
        return all_state.get(key, {})
    except Exception:
        return {}


def _save_state(path: str, key: str, state: dict) -> None:
    try:
        with open(path) as f:
            all_state = json.load(f)
    except Exception:
        all_state = {}
    all_state[key] = state
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(all_state, f, indent=1)
    os.replace(tmp, path)


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
    p.add_argument("--state", default="bench_artifacts/tpuq/pq_state.json")
    p.add_argument("--fresh", action="store_true",
                   help="ignore the checkpoint and re-measure every tier")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu). JAX_PLATFORMS in "
                        "the environment is TOO LATE on this machine — "
                        "sitecustomize preloads jax on the axon backend.")
    a = p.parse_args()

    import jax

    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    import jax.numpy as jnp

    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas, maxsim_pallas_int8
    from evdr_tpu.ops.pq import encode_pq, maxsim_pq_xla, train_pq
    from evdr_tpu.ops.quantize import quantize_tokens_int8
    from evdr_tpu.utils.timing import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    key = (f"{jax.default_backend()}:{a.n_docs}x{a.lp}x{a.d}"
           f"_b{a.batch}q{a.lq}_m{a.pq_m}")
    results = {} if a.fresh else _load_state(a.state, key)

    def done(name):
        if name in results:
            print(f"[skip] {name} (checkpointed): "
                  f"{json.dumps(results[name])}", flush=True)
            return True
        return False

    def save(name, val):
        results[name] = val
        _save_state(a.state, key, results)
        print(f"[done] {name}: {json.dumps(val)}", flush=True)

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

    # --- bf16 fused kernel / xla fallback
    if not done("bf16"):
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
        save("bf16", {
            "qps": timed_qps(lambda q, m, P_, pm_: f_bf16(q, m, P_, pm_),
                             (Qd, qmd, Pd, pmd), a.batch),
            "index_bytes": int(a.n_docs * a.lp * a.d * 2)})
        del Pd

    # --- int8 index
    if on_tpu and not done("int8"):
        codes, scales = quantize_tokens_int8(P, pm)
        Cd, Sd = jnp.asarray(codes), jnp.asarray(scales)

        def f_i8(q, m, C_, S_, pm_):
            sc = maxsim_pallas_int8(q, C_, S_, m, pm_)
            return jax.lax.top_k(sc, a.k)

        save("int8", {
            "qps": timed_qps(lambda q, m, *r: f_i8(q, m, *r),
                             (Qd, qmd, Cd, Sd, pmd), a.batch),
            "index_bytes": int(a.n_docs * a.lp * (a.d + 4))})
        del Cd, Sd

    # --- int4 packed index (capacity rung between int8 and PQ): Pallas
    # in-VMEM unpack kernel on TPU, chunked unpack + matmul elsewhere
    from evdr_tpu.ops.int4 import maxsim_int4_xla, quantize_tokens_int4

    if not done("int4"):
        packed4, scales4 = quantize_tokens_int4(P, pm)
        C4d, S4d = jnp.asarray(packed4), jnp.asarray(scales4)

        if on_tpu:
            from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int4

            def f_i4(q, m, C_, S_, pm_):
                # default tiles: the kernel's small-Lp VMEM clamp lands on
                # the swept-best rows=4096/cols->1536 config
                sc = maxsim_pallas_int4(q, C_, S_, m, pm_)
                return jax.lax.top_k(sc, a.k)
        else:
            def f_i4(q, m, C_, S_, pm_):
                sc = maxsim_int4_xla(q, C_, S_, m, pm_, chunk_p=a.chunk_p)
                return jax.lax.top_k(sc, a.k)

        save("int4", {
            "qps": timed_qps(lambda q, m, *r: f_i4(q, m, *r),
                             (Qd, qmd, C4d, S4d, pmd), a.batch),
            "index_bytes": int(a.n_docs * a.lp * (a.d // 2 + 4))})
        del C4d, S4d

    # --- PQ books (needed by every remaining section; kmeans is seeded so
    # reruns reproduce the same books). OPQ books likewise train ONCE here
    # and are shared by the 'opq' and 'quality' sections — train_opq is
    # minutes of host kmeans at 250k docs, too costly to run twice.
    from evdr_tpu.ops.pq import expand_books, train_opq

    need_pq = any(s not in results
                  for s in ("pq_encode", "pq", "opq", "quality",
                            "pq_kernel", "pqfull_kernel", "opq_kernel",
                            "pq_pruned", "pq_pruned_kc8_nc1024",
                            "pq_pruned_kc4_nc4096", "pq_pruned_kc8_nc4096",
                            "pq_pruned_kc8_nc1024_s8",
                            "pq_pruned_kc8_nc4096_s8"))
    need_opq = any(s not in results
                   for s in ("opq", "quality", "opq_kernel"))
    if need_pq:
        books = train_pq(P, pm, m=a.pq_m)
    if need_opq:
        obooks, rot = train_opq(P, pm, m=a.pq_m)
        ebooks = expand_books(obooks, rot)

    # host-encoding 4M tokens is ~4 min (16.2k tok/s measured,
    # bench_pq3.out): encode at most ONCE per invocation and share the
    # codes across the pq/pq_kernel/pqfull_kernel/pq_pruned sections
    # (seeded books -> identical codes everywhere)
    _enc = {}

    def pq_codes_once():
        if "pq" not in _enc:
            _enc["pq"] = encode_pq(P, books, pm)
        return _enc["pq"]

    def opq_codes_once():
        if "opq" not in _enc:
            _enc["opq"] = encode_pq(P, obooks, pm, rot=rot)
        return _enc["opq"]

    # --- PQ encode (timed: host numpy vs accelerator — the O(corpus)
    # index-build step; engine.build auto-routes to the device past 2M
    # tokens)
    if not done("pq_encode"):
        from evdr_tpu.ops.pq import encode_pq_device

        n_tok = a.n_docs * a.lp
        t0 = time.perf_counter()
        pq_codes = encode_pq(P, books, pm)
        t_host = time.perf_counter() - t0
        # warm/compile at the EXACT chunk shape the timed run uses: chunk
        # must be a token count both runs share (262144 is not a multiple
        # of every lp — a mismatched tail shape would put a 40s-3min
        # tunnel compile inside t_dev)
        nw = min(a.n_docs, max(1, 262_144 // a.lp))
        chunk = nw * a.lp
        encode_pq_device(P[:nw], books, pm[:nw], chunk_tokens=chunk)
        t0 = time.perf_counter()
        pq_codes_dev = encode_pq_device(P, books, pm, chunk_tokens=chunk)
        t_dev = time.perf_counter() - t0
        save("pq_encode", {
            "host_tok_per_s": round(n_tok / t_host),
            "device_tok_per_s": round(n_tok / t_dev),
            "agree": float(np.mean(pq_codes == pq_codes_dev))})
        _enc["pq"] = pq_codes
        del pq_codes_dev

    def f_pq(q, m, C_, pm_, B_):
        sc = maxsim_pq_xla(q, C_, m, pm_, B_, chunk_p=a.chunk_p)
        return jax.lax.top_k(sc, a.k)

    if not done("pq"):
        PQd, Bd = jnp.asarray(pq_codes_once()), jnp.asarray(books)
        save("pq", {
            "qps": timed_qps(lambda q, m, *r: f_pq(q, m, *r),
                             (Qd, qmd, PQd, pmd, Bd), a.batch),
            "index_bytes": int(a.n_docs * a.lp * a.pq_m)})
        del PQd, Bd

    # --- OPQ (same bytes; expanded (M, K, D) books -> a D-wide LUT einsum,
    # the only serving-cost difference vs plain PQ)
    if not done("opq"):
        OQd, EBd = jnp.asarray(opq_codes_once()), jnp.asarray(ebooks)
        save("opq", {
            "qps": timed_qps(lambda q, m, *r: f_pq(q, m, *r),
                             (Qd, qmd, OQd, pmd, EBd), a.batch),
            "index_bytes": int(a.n_docs * a.lp * a.pq_m)})
        del OQd, EBd

    # --- fused PQ kernel (decode-in-VMEM, ops/pallas_maxsim.py): the
    # SERVING path for PQ bytes — the LUT-gather sections above are the
    # portable fallback (17.4 q/s on chip at this shape, bench_pq2.out)
    if on_tpu and not done("pq_kernel"):
        from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_pq

        PQd, Bd = jnp.asarray(pq_codes_once()), jnp.asarray(books)

        def f_pqk(q, m, C_, pm_, B_):
            sc = maxsim_pallas_pq(q, C_, m, pm_, B_)
            return jax.lax.top_k(sc, a.k)

        save("pq_kernel", {
            "qps": timed_qps(lambda q, m, *r: f_pqk(q, m, *r),
                             (Qd, qmd, PQd, pmd, Bd), a.batch),
            "index_bytes": int(a.n_docs * a.lp * a.pq_m)})
        del PQd, Bd

    # own done-gate (was nested under pq_kernel's: a run dying between the
    # two saves skipped pqfull_kernel FOREVER on every resume)
    if on_tpu and not done("pqfull_kernel"):
        from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_pqfull

        PQd, Bd = jnp.asarray(pq_codes_once()), jnp.asarray(books)

        def f_pqf(q, m, C_, pm_, B_):
            sc = maxsim_pallas_pqfull(q, C_, m, pm_, B_)
            return jax.lax.top_k(sc, a.k)

        save("pqfull_kernel", {
            "qps": timed_qps(lambda q, m, *r: f_pqf(q, m, *r),
                             (Qd, qmd, PQd, pmd, Bd), a.batch),
            "index_bytes": int(a.n_docs * a.lp * a.pq_m)})
        del PQd, Bd

    if on_tpu and not done("opq_kernel"):
        from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_pq

        OQd, EBd = jnp.asarray(opq_codes_once()), jnp.asarray(ebooks)

        def f_opqk(q, m, C_, pm_, B_):
            sc = maxsim_pallas_pq(q, C_, m, pm_, B_)
            return jax.lax.top_k(sc, a.k)

        save("opq_kernel", {
            "qps": timed_qps(lambda q, m, *r: f_opqk(q, m, *r),
                             (Qd, qmd, OQd, pmd, EBd), a.batch),
            "index_bytes": int(a.n_docs * a.lp * a.pq_m)})
        del OQd, EBd

    # --- PLAID combo at the PQ tier (engine: dtype='pq' + prune_centroids):
    # stage-1 scores a small bf16 summary index (k_centroids tokens/page —
    # the engine keeps PQ summaries at bf16, engine.py ~191), stage-2
    # decodes and exactly reranks only n_cand candidates, fused in ONE
    # program (ops/pruned.pruned_topk_fused). Summaries are built from the
    # PQ RECONSTRUCTIONS — what a PQ-only store can actually provide (the
    # engine's compact() path does the same) — so recall is reported vs the
    # tier's own exact (fused-PQ-kernel) top-k, not vs fp32.
    # GRID over (k_centroids, n_cand): the first cell measured (kc=4,
    # nc=1024 — the historic "pq_pruned" key) was strictly dominated at
    # this shape: 770 q/s (exact PQ kernel: 1,166) at recall 0.48, with
    # bf16 summaries costing 4x the PQ index itself. The grid locates
    # where (if anywhere at 250k docs) the combo earns its bytes; the bf16
    # pruned path needed kc=8 for recall 1.000 (RESULTS.md config 5b).
    # (k_centroids, n_cand, summary dtype): "s8" cells store stage-1
    # summaries int8 (engine: summary_dtype='int8') — at kc=4 the bf16
    # summaries cost 4x the PQ index itself, the capacity killer
    _pruned_grid = [(4, 1024, "bf16"), (8, 1024, "bf16"),
                    (4, 4096, "bf16"), (8, 4096, "bf16"),
                    (8, 1024, "s8"), (8, 4096, "s8")]

    def _pruned_key(kc, nc, sdt="bf16"):
        if (kc, nc, sdt) == (4, 1024, "bf16"):
            return "pq_pruned"
        suf = "" if sdt == "bf16" else f"_{sdt}"
        return f"pq_pruned_kc{kc}_nc{nc}{suf}"

    if on_tpu and any(not done(_pruned_key(*cell)) for cell in _pruned_grid):
        from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_pq
        from evdr_tpu.ops.pq import decode_pq
        from evdr_tpu.ops.pruned import (build_summary_tokens, pruned_recall,
                                         pruned_topk_fused)

        pq_codes = pq_codes_once()
        PQd, Bd = jnp.asarray(pq_codes), jnp.asarray(books)
        sc_ex = maxsim_pallas_pq(Qd, PQd, qmd, pmd, Bd)
        _, ex_idx = jax.lax.top_k(sc_ex, a.k)
        ex_idx = np.asarray(ex_idx)
        recon = decode_pq(pq_codes, books)
        for kc in sorted({kc for kc, _, _ in _pruned_grid}):
            if all(done(_pruned_key(*cell))
                   for cell in _pruned_grid if cell[0] == kc):
                continue
            S, smask = build_summary_tokens(recon, pm, k_centroids=kc)
            smd = jnp.asarray(smask)
            for kc2, n_cand, sdt in _pruned_grid:
                if kc2 != kc or done(_pruned_key(kc, n_cand, sdt)):
                    continue
                if sdt == "s8":
                    from evdr_tpu.ops.quantize import quantize_tokens_int8

                    S8, s8sc = quantize_tokens_int8(S, smask)
                    Sd, ssd = jnp.asarray(S8), jnp.asarray(s8sc)
                    sum_bytes = a.n_docs * kc * (a.d + 4)
                else:
                    Sd, ssd = jnp.asarray(
                        S.astype(np.float32)).astype(jnp.bfloat16), None
                    sum_bytes = a.n_docs * kc * a.d * 2

                def f_pr(q, m, C_, pm_, S_, sm_, B_, _nc=n_cand, _ss=ssd):
                    return pruned_topk_fused(q, m, C_, pm_, S_, sm_, k=a.k,
                                             n_cand=_nc, impl="pallas",
                                             sscales=_ss, books=B_)

                qps = timed_qps(lambda q, m, *r: f_pr(q, m, *r),
                                (Qd, qmd, PQd, pmd, Sd, smd, Bd), a.batch)
                _, pr_idx = f_pr(Qd, qmd, PQd, pmd, Sd, smd, Bd)
                save(_pruned_key(kc, n_cand, sdt), {
                    "qps": qps,
                    "recall_vs_pq_exact": round(
                        pruned_recall(ex_idx, np.asarray(pr_idx)), 4),
                    "k_centroids": kc, "n_cand": n_cand,
                    "summary_dtype": "int8" if sdt == "s8" else "bfloat16",
                    "index_bytes": int(a.n_docs * a.lp * a.pq_m),
                    "summary_bytes": int(sum_bytes)})
                del Sd, ssd
            del S, smd
        del PQd, Bd, recon

    # quality: top-1 agreement vs the exact fp32 path on a small slice
    # (encodes only the slice; scoring runs on the current backend)
    if not done("quality"):
        from evdr_tpu.ops.maxsim import maxsim_numpy

        ns = min(a.n_docs, 20_000)
        ex = maxsim_numpy(Q[:16], P[:ns], qm[:16], pm[:ns])
        pq_sl = encode_pq(P[:ns], books, pm[:ns])
        pq_sc = np.asarray(maxsim_pq_xla(Q[:16], pq_sl, qm[:16],
                                         pm[:ns], books, chunk_p=2048))
        opq_sl = encode_pq(P[:ns], obooks, pm[:ns], rot=rot)
        opq_sc = np.asarray(maxsim_pq_xla(Q[:16], opq_sl, qm[:16],
                                          pm[:ns], ebooks, chunk_p=2048))
        packed4, scales4 = quantize_tokens_int4(P[:ns], pm[:ns])
        i4_sc = np.asarray(maxsim_int4_xla(Q[:16], packed4, scales4,
                                           qm[:16], pm[:ns], chunk_p=2048))
        save("quality", {
            "pq_top1_vs_exact": float(
                np.mean(np.argmax(pq_sc, 1) == np.argmax(ex, 1))),
            "opq_top1_vs_exact": float(
                np.mean(np.argmax(opq_sc, 1) == np.argmax(ex, 1))),
            "int4_top1_vs_exact": float(
                np.mean(np.argmax(i4_sc, 1) == np.argmax(ex, 1)))})

    print(json.dumps({"backend": jax.default_backend(),
                      "shape": [a.n_docs, a.lp, a.d, a.batch],
                      **results}))


if __name__ == "__main__":
    main()
