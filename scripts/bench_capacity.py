"""Capacity benchmark: multi-million-page serving on ONE chip.

The 250k-doc ladder (bench_pq.py) showed the PLAID combo (summary prune +
PQ rerank) strictly dominated by the exact fused PQ kernel — at that scale
the exact scan is cheap. This bench measures the regime the combo exists
for: corpora so large that bf16 cannot fit at all (4M pages x 16 tokens x
128d bf16 = 16 GB) and the exact scan is the bottleneck. Reference analog:
the corpus sizes in /root/reference/evaluator/retrieval.py are ~500 pages;
this is the framework's beyond-reference scaling story.

Tiers at n_pages (default 4M):
- exact_pq      fused decode-in-VMEM kernel over all PQ codes (1 GB index)
- pruned_nc{N}  stage-1 int8-summary scan (kc tokens/page) + exact PQ
                rerank of N candidates, ONE fused program
                (engine equivalent: dtype='pq', prune_centroids=kc,
                summary_dtype='int8')
- exact_int4    packed-int4 kernel over the full corpus (4.4 GB)
- exact_int8    int8 kernel over the full corpus (8.4 GB)

Everything runs DEVICE-RESIDENT: per 62,500-page chunk, one jitted program
generates clustered bf16 tokens, PQ-encodes them, runs per-page k-means
(ops/batched_kmeans._kmeans_chunk) and int8-quantizes the normalized
centers — the float corpus is never materialized on host or device.
Timing uses the honest chained protocol (distinct buffers per rep, K
applications in one jit, forced fetch — CLAUDE.md).

RESUMABLE per section via --state (same scheme as bench_pq.py); the exact
PQ top-k indices are checkpointed so pruned-recall cells survive restarts.

Run: python scripts/bench_capacity.py [--n_pages 4000000]
"""

from __future__ import annotations

import argparse
import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from scripts.bench_pq import _load_state, _save_state  # noqa: E402

N_CENTERS = 8  # per-page token clusters (config 5b's corpus structure)


def _gen_chunk_fn(tokens, d):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen_chunk(key, m):
        kc_, ka, kn = jax.random.split(key, 3)
        centers = jax.random.normal(kc_, (m, N_CENTERS, d), jnp.float32)
        centers = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True)
                             + 1e-12)
        assign = jax.random.randint(ka, (m, tokens), 0, N_CENTERS)
        toks = jnp.take_along_axis(centers, assign[:, :, None], axis=1)
        toks = toks + 0.3 / np.sqrt(d) * jax.random.normal(kn, toks.shape)
        toks = toks / (jnp.linalg.norm(toks, axis=-1, keepdims=True) + 1e-12)
        return toks.astype(jnp.bfloat16)

    return gen_chunk


def _enc_fn(Bd):
    """PQ-encode one token chunk on device (argmin over codebook dists)."""
    import jax
    import jax.numpy as jnp

    m, _, ds = Bd.shape
    c2 = jnp.sum(Bd.astype(jnp.float32) ** 2, axis=-1)  # (M, K)

    @jax.jit
    def enc(toks):
        x = toks.astype(jnp.float32).reshape(
            toks.shape[0] * toks.shape[1], m, ds)
        dots = jnp.einsum("tmd,mkd->tmk", x, Bd.astype(jnp.float32))
        cd = jnp.argmin(c2[None] - 2.0 * dots, axis=-1)
        return cd.astype(jnp.uint8).reshape(toks.shape[0], toks.shape[1], m)

    return enc


def _summ_fn(kc):
    """Per-page kmeans + L2-normalize + int8 per-token quantization, fused
    into one device program (build_summary_tokens would fetch every chunk
    to host — GBs through the tunnel)."""
    import jax
    import jax.numpy as jnp

    from evdr_tpu.ops.batched_kmeans import _kmeans_chunk

    @functools.partial(jax.jit, static_argnames=("seed",))
    def summ(toks, seed):
        pm = jnp.ones(toks.shape[:2], bool)
        cent, cmask = _kmeans_chunk(toks.astype(jnp.float32), pm,
                                    k=kc, iters=5, seed=seed)
        nrm = jnp.linalg.norm(cent, axis=-1, keepdims=True)
        cent = jnp.where(nrm > 0, cent / jnp.maximum(nrm, 1e-12), 0.0)
        amax = jnp.max(jnp.abs(cent), axis=-1)
        sc = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(cent / sc[..., None]), -127, 127)
        return q.astype(jnp.int8), sc.astype(jnp.float32), cmask

    return summ


def _timed(fn, args, nq, K=2, reps=3):
    """Chained remote-honest q/s (config 5b's protocol)."""
    import jax
    import jax.numpy as jnp

    def g(rep, Q, qm, *rest):
        tot = jnp.float32(0)
        idx = None
        for i in range(K):
            v, idx = fn(jnp.roll(Q, rep * K + i, axis=0), qm, *rest)
            tot = tot + jnp.sum(v)
        return tot, idx

    j = jax.jit(g)
    _, idx = j(np.int32(99), *args)
    idx.block_until_ready()
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        s, _ = j(np.int32(rep), *args)
        float(s)
        best = min(best, time.perf_counter() - t0)
    return nq * K / best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_pages", type=int, default=4_000_000)
    p.add_argument("--tokens", type=int, default=16)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--pq_m", type=int, default=16)
    p.add_argument("--kc", type=int, default=4)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lq", type=int, default=32)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--n_cands", type=int, nargs="+", default=[1024, 4096])
    p.add_argument("--chunk", type=int, default=62_500)
    p.add_argument("--impl", default="auto",
                   help="auto: pallas on TPU, xla elsewhere (CPU smoke)")
    p.add_argument("--skip_int8", action="store_true",
                   help="skip the 8.4GB exact-int8 tier")
    p.add_argument("--state",
                   default="bench_artifacts/tpuq/capacity_state.json")
    a = p.parse_args()
    CHUNK = a.chunk
    assert a.n_pages % CHUNK == 0, f"n_pages must divide {CHUNK}"

    import jax
    import jax.numpy as jnp

    if a.impl == "auto":
        a.impl = ("pallas" if jax.default_backend() in ("tpu", "axon")
                  else "xla")

    from evdr_tpu.utils.timing import enable_persistent_cache

    enable_persistent_cache()
    key_str = (f"n{a.n_pages}_t{a.tokens}_d{a.d}_m{a.pq_m}_kc{a.kc}"
               f"_b{a.batch}_lq{a.lq}")
    results = _load_state(a.state, key_str)

    def done(s):
        if s in results:
            print(f"[skip] {s} (checkpointed): {json.dumps(results[s])}",
                  flush=True)
            return True
        return False

    def save(s, payload):
        results[s] = payload
        _save_state(a.state, key_str, results)
        print(f"[done] {s}: {json.dumps(payload)}", flush=True)

    gen_chunk = _gen_chunk_fn(a.tokens, a.d)
    key = jax.random.PRNGKey(7)
    n_chunks = a.n_pages // CHUNK

    # --- books: train on a host sample of chunk 0 (train_pq's own bound)
    from evdr_tpu.ops.pq import train_pq

    toks0 = gen_chunk(jax.random.fold_in(key, 0), CHUNK)
    sample = np.asarray(toks0[:4096], np.float32)
    books = train_pq(sample, np.ones(sample.shape[:2], bool), m=a.pq_m)
    Bd = jnp.asarray(books)
    enc = _enc_fn(Bd)

    # --- grounded queries: noisy copies of chunk-0 target pages' tokens
    rng = np.random.default_rng(7)
    tgt = jnp.asarray(rng.integers(0, CHUNK, size=a.batch))
    take = jnp.asarray(rng.integers(0, a.tokens, size=(a.batch, a.lq)))

    @jax.jit
    def gen_queries(P, tgt, take, k_):
        Qt = jnp.take(P, tgt, axis=0).astype(jnp.float32)
        Q = jnp.take_along_axis(Qt, take[:, :, None], axis=1)
        Q = Q + 1.0 / np.sqrt(a.d) * jax.random.normal(k_, Q.shape)
        return Q / (jnp.linalg.norm(Q, axis=-1, keepdims=True) + 1e-12)

    Qd = gen_queries(toks0, tgt, take, jax.random.fold_in(key, 999))
    qmd = jnp.asarray(rng.random((a.batch, a.lq)) > 0.15)
    del toks0

    pm_dev = jnp.ones((a.n_pages, a.tokens), bool)
    idx_bytes = a.n_pages * a.tokens * a.pq_m
    t_wall = time.perf_counter()

    # ---- PQ sections (codes + int8 summaries, built in one chunk sweep)
    pq_secs = ["exact_pq"] + [f"pruned_nc{n}" for n in a.n_cands]
    if any(not done(s) for s in pq_secs):
        summ = _summ_fn(a.kc)
        codes_c, s8_c, ssc_c, sm_c = [], [], [], []
        for i in range(n_chunks):
            toks = gen_chunk(jax.random.fold_in(key, i), CHUNK)
            codes_c.append(enc(toks))
            q8, sc, cm = summ(toks, seed=i)
            s8_c.append(q8)
            ssc_c.append(sc)
            sm_c.append(cm)
            del toks
            if i % 16 == 0:
                jax.block_until_ready(codes_c[-1])
                print(f"[gen] chunk {i + 1}/{n_chunks} "
                      f"({time.perf_counter() - t_wall:.0f}s)", flush=True)
        codes = jnp.concatenate(codes_c, axis=0)
        del codes_c
        S8 = jnp.concatenate(s8_c, axis=0)
        del s8_c
        Ssc = jnp.concatenate(ssc_c, axis=0)
        Sm = jnp.concatenate(sm_c, axis=0)
        del ssc_c, sm_c
        jax.block_until_ready(codes)
        print(f"[gen] corpus built in {time.perf_counter() - t_wall:.0f}s",
              flush=True)

        if a.impl == "pallas":
            from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_pq

            def f_exact(q, m, C_, pm_, B_):
                return jax.lax.top_k(maxsim_pallas_pq(q, C_, m, pm_, B_),
                                     a.k)
        else:
            from evdr_tpu.ops.pq import maxsim_pq_xla

            def f_exact(q, m, C_, pm_, B_):
                return jax.lax.top_k(
                    maxsim_pq_xla(q, C_, m, pm_, B_, chunk_p=2048), a.k)

        if not done("exact_pq"):
            qps = _timed(lambda q, m, *r: f_exact(q, m, *r),
                         (Qd, qmd, codes, pm_dev, Bd), a.batch)
            _, ex_idx = f_exact(Qd, qmd, codes, pm_dev, Bd)
            save("exact_pq", {
                "qps": qps, "index_bytes": int(idx_bytes),
                "top1_is_target": float(np.mean(
                    np.asarray(ex_idx)[:, 0] == np.asarray(tgt))),
                "topk_idx": np.asarray(ex_idx).tolist()})

        ex_idx = np.asarray(results["exact_pq"]["topk_idx"])
        from evdr_tpu.ops.pruned import pruned_recall, pruned_topk_fused

        sum_bytes = a.n_pages * a.kc * (a.d + 4)
        # decode A/B: stage-2 candidate reconstruction via row gathers
        # ("take") vs one-hot MXU dots ("onehot") — at n_cand 16384 the
        # take path issues ~270M scalar gathers per batch and TPUs have no
        # gather unit; parity is exact (tests/test_pq.py)
        cells = [(n, dec) for n in a.n_cands for dec in ("take", "onehot")]
        for n_cand, dec in cells:
            sec = f"pruned_nc{n_cand}" + ("" if dec == "take" else "_oh")
            if done(sec):
                continue

            def f_pr(q, m, C_, pm_, S_, sm_, ss_, B_, _nc=n_cand, _dec=dec):
                # summary scales ride as an argument — closure capture
                # would inline the (N, kc) f32 array as a program constant
                # (remote-compile rejects large constant bodies)
                return pruned_topk_fused(q, m, C_, pm_, S_, sm_, k=a.k,
                                         n_cand=_nc, impl=a.impl,
                                         sscales=ss_, books=B_,
                                         pq_decode=_dec)

            qps = _timed(lambda q, m, *r: f_pr(q, m, *r),
                         (Qd, qmd, codes, pm_dev, S8, Sm, Ssc, Bd), a.batch)
            _, pr_idx = f_pr(Qd, qmd, codes, pm_dev, S8, Sm, Ssc, Bd)
            save(sec, {
                "qps": qps, "pq_decode": dec,
                "recall_vs_pq_exact": round(
                    pruned_recall(ex_idx, np.asarray(pr_idx)), 4),
                "top1_is_target": float(np.mean(
                    np.asarray(pr_idx)[:, 0] == np.asarray(tgt))),
                "k_centroids": a.kc, "summary_dtype": "int8",
                "index_bytes": int(idx_bytes),
                "summary_bytes": int(sum_bytes)})
        del codes, S8, Ssc, Sm

    # ---- exact int4 tier at the same scale (the capacity rung PQ+pruned
    # must beat on BOTH axes to matter)
    if not done("exact_int4"):
        from evdr_tpu.parallel.topk import _single_device_topk

        # device int4 quantize+pack, token-pair layout (ops/int4.py
        # convention; same program as bench_suite config 5's quant4 —
        # per-generation-chunk, so no extra lax.map level needed)
        @jax.jit
        def q4(toks):
            x = toks.astype(jnp.float32)
            amax = jnp.max(jnp.abs(x), axis=-1)
            sc = jnp.where(amax > 0, amax / 7.0, 1.0)
            q = jnp.clip(jnp.round(x / sc[..., None]), -7, 7).astype(
                jnp.int32)
            lo = q[:, 0::2] & 15
            hi = q[:, 1::2] & 15
            return (lo | (hi << 4)).astype(jnp.uint8), sc.astype(jnp.float32)

        packed_c, sc_c = [], []
        for i in range(n_chunks):
            toks = gen_chunk(jax.random.fold_in(key, i), CHUNK)
            pk, sc = q4(toks)
            packed_c.append(pk)
            sc_c.append(sc)
            del toks
        packed = jnp.concatenate(packed_c, axis=0)
        del packed_c
        scales = jnp.concatenate(sc_c, axis=0)
        del sc_c
        jax.block_until_ready(packed)

        def f_i4(q, m, P_, pm_, sc_):
            return _single_device_topk(q, m, P_, pm_, a.k, 4096, a.impl,
                                       scales=sc_)

        qps = _timed(lambda q, m, *r: f_i4(q, m, *r),
                     (Qd, qmd, packed, pm_dev, scales), a.batch)
        save("exact_int4", {
            "qps": qps,
            "index_bytes": int(a.n_pages * a.tokens * (a.d // 2 + 4))})
        del packed, scales

    # ---- exact int8 tier (8.4 GB at 4M pages — skippable)
    if not a.skip_int8 and not done("exact_int8"):
        from evdr_tpu.parallel.topk import _single_device_topk

        @jax.jit
        def q8(toks):
            x = toks.astype(jnp.float32)
            amax = jnp.max(jnp.abs(x), axis=-1)
            sc = jnp.where(amax > 0, amax / 127.0, 1.0)
            c = jnp.clip(jnp.round(x / sc[..., None]), -127, 127)
            return c.astype(jnp.int8), sc.astype(jnp.float32)

        codes_c, sc_c = [], []
        for i in range(n_chunks):
            toks = gen_chunk(jax.random.fold_in(key, i), CHUNK)
            c, sc = q8(toks)
            codes_c.append(c)
            sc_c.append(sc)
            del toks
        codes8 = jnp.concatenate(codes_c, axis=0)
        del codes_c
        scales8 = jnp.concatenate(sc_c, axis=0)
        del sc_c
        jax.block_until_ready(codes8)

        def f_i8(q, m, P_, pm_, sc_):
            return _single_device_topk(q, m, P_, pm_, a.k, 4096, a.impl,
                                       scales=sc_)

        qps = _timed(lambda q, m, *r: f_i8(q, m, *r),
                     (Qd, qmd, codes8, pm_dev, scales8), a.batch)
        save("exact_int8", {
            "qps": qps,
            "index_bytes": int(a.n_pages * a.tokens * (a.d + 4))})
        del codes8, scales8

    out = {k_: {kk: vv for kk, vv in v.items() if kk != "topk_idx"}
           for k_, v in results.items()}
    print(json.dumps({"config": key_str, "results": out}), flush=True)


if __name__ == "__main__":
    main()
