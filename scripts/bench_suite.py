"""Benchmark suite covering BASELINE.md's five configs.

Prints one JSON line per config (the driver's headline metric stays in
bench.py; this suite is the full evidence set):

1. tabfquad-scale brute-force fp32 MaxSim + nDCG@5 sanity (CPU-semantics oracle)
2. ColQwen-scale batched fused bf16 Pallas MaxSim vs the fp32 oracle
3. token-pooled compressed index + InfoNCE distillation (quality recovery)
4. iterative liscore distillation (flagship loss) on the synthetic suite
5. 1M-page compressed corpus: doc-sharded index, device-side top-k +
   all-gather merge, queries/sec + exactness check on a subsample

Run on the TPU:  python scripts/bench_suite.py [--configs 1 2 5]
"""

from __future__ import annotations

import argparse
import functools
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _emit(**kw):
    print(json.dumps(kw))


def _fetch(x):
    """Force device->host (honest timing on the remote-TPU backend)."""
    return np.asarray(x)


def config1_bruteforce_fp32():
    import jax.numpy as jnp

    from evdr_tpu.data.packing import preprocess_docs, preprocess_queries
    from evdr_tpu.data.synthetic import make_synthetic_corpus
    from evdr_tpu.eval.evaluator import CustomRetrievalEvaluator, eval_retrieval

    c = make_synthetic_corpus(n_docs=70, n_queries=64, dim=128,
                              doc_len_range=(500, 900), seed=0)
    P, pmask, _ = preprocess_docs(c["documents"], c["doc_attnmask"], c["doc_imgmask"])
    Q, qmask = preprocess_queries(c["query"], c["query_attnmask"])
    ev = CustomRetrievalEvaluator()
    t0 = time.perf_counter()
    m = eval_retrieval(ev, jnp.asarray(Q), jnp.asarray(qmask), jnp.asarray(P),
                       jnp.asarray(pmask), c["relevant_docs"],
                       c["docidx_2_docid"], c["qsidx_2_query"], impl="xla")
    dt = time.perf_counter() - t0
    _emit(config=1, metric="tabfquad_bruteforce_ndcg5", value=m["NDCG"]["NDCG@5"],
          unit="ndcg@5", wall_s=round(dt, 2), latency_ms_per_q=round(m["latency"], 3))


def config2_fused_bf16_vs_oracle():
    import jax
    import jax.numpy as jnp

    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas

    rng = np.random.default_rng(0)

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    nq, lq, nd, lp, d = 256, 32, 1000, 768, 128
    Q = unit(rng.normal(size=(nq, lq, d))).astype(np.float32)
    P = unit(rng.normal(size=(nd, lp, d))).astype(np.float32)
    qm = rng.random((nq, lq)) > 0.15
    pm = rng.random((nd, lp)) > 0.1

    Qd, Pd, qmd, pmd = map(jnp.asarray, (Q, P, qm, pm))
    got = _fetch(maxsim_pallas(Qd, Pd, qmd, pmd))
    want = maxsim_numpy(Q[:32], P, qm[:32], pm)
    err = float(np.abs(got[:32] - want).max())

    # K chained applications in ONE program amortize the remote-dispatch RTT;
    # big arrays ride as jit arguments (closures would inline them)
    K = 4

    def chained(q, p, qmk, pmk):
        total = jnp.float32(0)
        for i in range(K):
            total = total + jnp.sum(maxsim_pallas(jnp.roll(q, i, axis=0), p, qmk, pmk))
        return total

    g = jax.jit(chained)
    float(g(Qd, Pd, qmd, pmd))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(Qd, Pd, qmd, pmd))
        best = min(best, time.perf_counter() - t0)
    dt = best / K
    flops = 2 * nq * lq * nd * lp * d
    _emit(config=2, metric="fused_bf16_maxsim", value=round(nq / dt, 1), unit="q/s",
          tflops=round(flops / dt / 1e12, 1), max_abs_err_vs_fp32=round(err, 5))


def config3_pooled_infonce():
    _train_config(loss="infonce_distill", temp=0.07, tag="pooled_infonce", config=3)


def config4_iter_liscore():
    _train_config(loss="liscore", temp=0.1, tag="iter_liscore", config=4)


def _train_config(loss, temp, tag, config):
    from evdr_tpu.data.synthetic import write_dataset_fixture
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import run_training

    root = pathlib.Path(tempfile.mkdtemp())
    # calibrated difficulty: teacher ~1.0, noisy pooled init ~0.39 nDCG@5,
    # liscore distillation recovers to ~0.89 within 1500 steps (CPU-verified)
    write_dataset_fixture(root, key="benchfx", n_docs=64, n_test_queries=48,
                          n_train_queries=512, dim=128, mfs=(4,), seed=0,
                          init_noise=2.5, noise=1.0, doc_len_range=(60, 120))
    steps = 1500
    cfg = TrainConfig(
        datasets=["benchfx"], query_root=str(root), teacher_root=str(root),
        init_root=str(root / "S3E_init"), mfs=[4], out_root=str(root / "res"),
        name=tag, loss=loss, temp=temp, k=10, max_steps=steps, eval_every=300,
        print_every=0, q_batch=32, lr=3e-3, chunk_p=64)
    t0 = time.perf_counter()
    r = run_training(cfg)
    dt = time.perf_counter() - t0
    best = r["benchfx/mf4"]["summary/best_ndcg5"]
    _emit(config=config, metric=f"{tag}_best_ndcg5", value=best["NDCG@5"],
          unit="ndcg@5", recall1=best["Recall@1"], wall_s=round(dt, 1),
          steps_per_s=round(steps / dt, 1))


def config5_million_pages(n_pages: int = 1_000_000, tokens: int = 16, d: int = 128):
    import jax
    import jax.numpy as jnp

    from evdr_tpu.parallel import (build_sharded_index, make_mesh, replicate,
                                   sharded_topk)


    mesh = make_mesh()  # all available devices (1 real chip here; N on a pod)
    rng = np.random.default_rng(0)

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    # compressed student-index scale: mf~50 -> ~16 tokens/page. Generated ON
    # DEVICE in bf16 (host generation + a 4GB tunnel transfer measured
    # pathologically slow)
    import functools

    from evdr_tpu.parallel import shard_docs
    from evdr_tpu.parallel.sharded_index import ShardedIndex

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen_chunk(key, m):
        toks = jax.random.normal(key, (m, tokens, d), jnp.float32)
        toks = toks / (jnp.linalg.norm(toks, axis=-1, keepdims=True) + 1e-12)
        return toks.astype(jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    chunk = 62500
    assert n_pages % chunk == 0
    Pdev = jnp.concatenate([gen_chunk(jax.random.fold_in(key, i), chunk)
                            for i in range(n_pages // chunk)], axis=0)
    pm_dev = jnp.ones((n_pages, tokens), dtype=bool)
    index = ShardedIndex(P=shard_docs(Pdev, mesh),
                         pmask=shard_docs(pm_dev, mesh),
                         n_docs=n_pages, mesh=mesh)

    nq, lq = 64, 32
    Q = unit(rng.normal(size=(nq, lq, d))).astype(np.float32)
    qm = rng.random((nq, lq)) > 0.15
    Qd = replicate(jnp.asarray(Q), mesh)
    qmd = replicate(jnp.asarray(qm), mesh)

    k = 10
    vals, idx = sharded_topk(Qd, qmd, index, k=k, chunk_p=4096, impl="pallas")
    vals_h, idx_h = _fetch(vals), _fetch(idx)

    # exactness on a subsample of queries vs a brute-force row scan
    from evdr_tpu.ops.maxsim import maxsim_xla

    sub = 4
    sc = _fetch(maxsim_xla(jnp.asarray(Q[:sub]), index.P, jnp.asarray(qm[:sub]),
                           index.pmask, chunk_p=8192))[:, :n_pages]
    ok = True
    for q in range(sub):
        want = set(np.argsort(-sc[q])[:k].tolist())
        ok = ok and set(idx_h[q].tolist()) == want

    def _timed_topk(idx_obj, nq_t, tag, impl, exact_field=None):
        """Sustained q/s via the honest remote protocol (same as bench.py's
        headline): device-resident queries, K score+top-k applications with
        DISTINCT inputs chained in ONE jit (a repeated identical
        (program, args) pair can be served from the remote client's
        memoization cache, and single dispatches pay ~60-100 ms of tunnel
        RTT that no real TPU host pays — CLAUDE.md timing traps), and a
        forced scalar fetch. The index is threaded as jit ARGUMENTS (closure
        capture would inline 4 GB as program constants).
        ``exact_field`` reports the brute-force subsample check, which was
        run against the bf16 index only — omit it for variants whose
        results can legitimately differ (int8 quantization)."""
        Qb = unit(rng.normal(size=(nq_t, lq, d))).astype(np.float32)
        qmb = rng.random((nq_t, lq)) > 0.15
        Qw = replicate(jnp.asarray(Qb), mesh)
        qmw = replicate(jnp.asarray(qmb), mesh)
        if mesh.devices.size == 1:
            from evdr_tpu.parallel.topk import _single_device_topk

            K = 3
            kk = min(k, idx_obj.n_pad)

            def chained(rep, Qr, qmr, P_, pm_, sc_, bk_):
                tot = jnp.float32(0)
                for i in range(K):
                    v, ix = _single_device_topk(
                        jnp.roll(Qr, rep * K + i, axis=0), qmr, P_, pm_,
                        kk, 4096, impl, False, sc_, books=bk_)
                    tot = tot + jnp.sum(v) + jnp.sum(ix.astype(jnp.float32))
                return tot

            j = jax.jit(chained)
            args = (Qw, qmw, idx_obj.P, idx_obj.pmask, idx_obj.scales,
                    getattr(idx_obj, "books", None))
            float(j(jnp.int32(99), *args))  # warm/compile at this batch
            dt = min_dt = float("inf")
            for rep in range(2):
                t0 = time.perf_counter()
                float(j(jnp.int32(rep), *args))
                min_dt = min(min_dt, time.perf_counter() - t0)
            dt = min_dt / K
        else:
            _fetch(sharded_topk(Qw, qmw, idx_obj, k=k, chunk_p=4096,
                                impl=impl)[0])  # warm/compile at this batch
            Q2 = replicate(jnp.asarray(np.roll(Qb, 1, axis=0)), mesh)
            qm2 = replicate(jnp.asarray(np.roll(qmb, 1, axis=0)), mesh)
            t0 = time.perf_counter()
            v2, _ = sharded_topk(Q2, qm2, idx_obj, k=k, chunk_p=4096,
                                 impl=impl)
            _fetch(v2)
            dt = time.perf_counter() - t0
        extra = {} if exact_field is None else {"exact_on_subsample": exact_field}
        _emit(config=5, metric="million_page_topk", value=round(nq_t / dt, 1),
              unit="q/s", n_pages=n_pages, tokens_per_page=tokens, k=k,
              devices=int(mesh.devices.size), variant=tag, batch=nq_t, **extra)
        return nq_t / dt

    _timed_topk(index, 64, "bf16", "pallas", exact_field=ok)
    # larger serving batches amortize the per-dispatch tunnel RTT and raise
    # arithmetic intensity
    _timed_topk(index, 256, "bf16", "pallas", exact_field=ok)

    # int8-index variant: half the HBM stream, 2x MXU peak; per-token
    # symmetric quantization computed ON DEVICE
    @jax.jit
    def quant(P):
        a = jnp.max(jnp.abs(P.astype(jnp.float32)), axis=-1)
        s = a / 127.0
        safe = jnp.where(s > 0, s, 1.0)
        codes = jnp.clip(jnp.round(P.astype(jnp.float32) / safe[..., None]),
                         -127, 127).astype(jnp.int8)
        return codes, s.astype(jnp.float32)

    codes, scales = quant(Pdev)
    index8 = ShardedIndex(P=shard_docs(codes, mesh),
                          pmask=shard_docs(pm_dev, mesh),
                          n_docs=n_pages, mesh=mesh,
                          scales=shard_docs(scales, mesh))

    # packed-int4 variant (ops/int4.py token-pair layout, quantized/packed
    # ON DEVICE): quarter of bf16's HBM stream — 1.1 GB index for 1M pages.
    # CHUNKED via lax.map: the unchunked form's int32 intermediates are 2x
    # the f32 corpus (8 GB at 1M pages) and HBM-OOM'd on the 16 GB chip
    # (bench_artifacts/tpuq/config5.out, 8/19).
    @functools.partial(jax.jit, static_argnames=("chunk",))
    def quant4(P, chunk: int = 31_250):
        n = P.shape[0]
        nc = -(-n // chunk)
        pad = nc * chunk - n
        Pp = jnp.pad(P, ((0, pad), (0, 0), (0, 0))) if pad else P
        Pc = Pp.reshape(nc, chunk, *P.shape[1:])

        def one(Pb):
            a = jnp.max(jnp.abs(Pb.astype(jnp.float32)), axis=-1)
            s = a / 7.0
            safe = jnp.where(s > 0, s, 1.0)
            q = jnp.clip(jnp.round(Pb.astype(jnp.float32) / safe[..., None]),
                         -7, 7).astype(jnp.int32)
            if q.shape[1] % 2:  # odd token count: zero pad token (inert)
                q = jnp.pad(q, ((0, 0), (0, 1), (0, 0)))
            lo = q[:, 0::2] & 15
            hi = q[:, 1::2] & 15
            return (lo | (hi << 4)).astype(jnp.uint8), s.astype(jnp.float32)

        codes, s = jax.lax.map(one, Pc)
        codes = codes.reshape(nc * chunk, *codes.shape[2:])[:n]
        return codes, s.reshape(nc * chunk, *s.shape[2:])[:n]

    codes4, scales4 = quant4(Pdev)
    index4 = ShardedIndex(P=shard_docs(codes4, mesh),
                          pmask=shard_docs(pm_dev, mesh),
                          n_docs=n_pages, mesh=mesh,
                          scales=shard_docs(scales4, mesh))

    # PQ variant (ops/pq.py): M=16 bytes/page-token = 1/8 of bf16's bytes —
    # 256 MB index for 1M pages. Books TRAIN on a 65k-token host sample
    # (train_pq's own sampling bound); ENCODING runs on device via lax.map
    # (the (tokens, M, K) f32 distance transient is 1.6 GB per 6250-page
    # chunk — a one-shot encode would need 256 GB). Serving goes through
    # the fused decode-in-VMEM kernel (maxsim_pallas_pq), same program
    # family the 250k-doc ladder measured at 1,166 q/s (bench_pq3.out).
    from evdr_tpu.ops.pq import train_pq

    pq_m = 16
    sample_pages = 4096  # 65,536 tokens: exactly train_pq's sample bound
    books = train_pq(np.asarray(Pdev[:sample_pages], np.float32),
                     np.ones((sample_pages, tokens), bool), m=pq_m)
    Bd = jnp.asarray(books)

    @functools.partial(jax.jit, static_argnames=("chunk",))
    def encpq(P, B, chunk: int = 6250):
        n = P.shape[0]
        nc = -(-n // chunk)
        pad = nc * chunk - n
        Pp = jnp.pad(P, ((0, pad), (0, 0), (0, 0))) if pad else P
        Pc = Pp.reshape(nc, chunk, *P.shape[1:])
        m, _, ds = B.shape
        c2 = jnp.sum(B.astype(jnp.float32) ** 2, axis=-1)  # (M, K)

        def one(Pb):
            x = Pb.astype(jnp.float32).reshape(
                Pb.shape[0] * Pb.shape[1], m, ds)
            dots = jnp.einsum("tmd,mkd->tmk", x, B.astype(jnp.float32))
            cd = jnp.argmin(c2[None] - 2.0 * dots, axis=-1)
            return cd.astype(jnp.uint8).reshape(Pb.shape[0], Pb.shape[1], m)

        cds = jax.lax.map(one, Pc)
        return cds.reshape(nc * chunk, *cds.shape[2:])[:n]

    codespq = encpq(Pdev, Bd)
    indexpq = ShardedIndex(P=shard_docs(codespq, mesh),
                           pmask=shard_docs(pm_dev, mesh),
                           n_docs=n_pages, mesh=mesh,
                           books=replicate(Bd, mesh))
    del Pdev, index
    # int8 index + float queries (maxsim_pallas_int8): halves the HBM stream
    # — the lever for this 16-token/page HBM-bound corpus (the full-int8
    # kernel's MFU-tuned tiles overflow VMEM at this shape)
    _timed_topk(index8, 256, "int8", "pallas")
    del index8, codes, scales
    _timed_topk(index4, 256, "int4", "pallas")
    del index4, codes4, scales4
    _timed_topk(indexpq, 256, "pq", "pallas")

def _gen_clustered_corpus_device(n_pages: int, tokens: int, d: int,
                                 n_centers: int, nq: int, lq: int, seed=0):
    """Clustered corpus + grounded queries generated ON DEVICE.

    Host-side generation of a 250k-page bf16 corpus measured pathologically
    slow (ml_dtypes conversions + GBs of f64 temporaries) and would then ship
    4GB through the tunnel; one jitted generator per chunk builds the index
    where it is used.
    """
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen_chunk(key, m):
        kc, ka, kn = jax.random.split(key, 3)
        centers = jax.random.normal(kc, (m, n_centers, d), jnp.float32)
        centers = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True)
                             + 1e-12)
        assign = jax.random.randint(ka, (m, tokens), 0, n_centers)
        toks = jnp.take_along_axis(centers, assign[:, :, None], axis=1)
        toks = toks + 0.3 / np.sqrt(d) * jax.random.normal(kn, toks.shape)
        toks = toks / (jnp.linalg.norm(toks, axis=-1, keepdims=True) + 1e-12)
        return toks.astype(jnp.bfloat16)

    key = jax.random.PRNGKey(seed)
    chunk = 31256
    assert n_pages % chunk == 0, "pick a chunk dividing n_pages"
    P = jnp.concatenate(
        [gen_chunk(jax.random.fold_in(key, i), chunk)
         for i in range(n_pages // chunk)], axis=0)

    # grounded queries: noisy copies of a target page's tokens
    rng = np.random.default_rng(seed)
    tgt = jnp.asarray(rng.integers(0, n_pages, size=nq))
    take = jnp.asarray(rng.integers(0, tokens, size=(nq, lq)))

    @jax.jit
    def gen_queries(P, tgt, take, key):
        Qt = jnp.take(P, tgt, axis=0).astype(jnp.float32)  # (nq, tokens, d)
        Q = jnp.take_along_axis(Qt, take[:, :, None], axis=1)
        Q = Q + 1.0 / np.sqrt(d) * jax.random.normal(key, Q.shape)
        return Q / (jnp.linalg.norm(Q, axis=-1, keepdims=True) + 1e-12)

    Q = np.asarray(gen_queries(P, tgt, take, jax.random.fold_in(key, 999)))
    qm = rng.random((nq, lq)) > 0.15
    return P, Q, qm


def config5b_pruned(n_pages: int = 250_048, tokens: int = 64, d: int = 128,
                    n_centers: int = 8):
    """PLAID-style pruned retrieval at teacher-ish token counts.

    Uses a CLUSTERED corpus (pages = noisy draws from per-page centers, like
    real patch embeddings) and GROUNDED queries (noisy copies of a target
    page's tokens) — pruning is meaningless on structureless random tokens.
    """
    import jax.numpy as jnp

    from evdr_tpu.parallel import (build_sharded_index, make_mesh, replicate,
                                   shard_docs)
    from evdr_tpu.parallel.sharded_index import ShardedIndex
    from evdr_tpu.ops.pruned import build_summary_tokens, pruned_recall

    mesh = make_mesh()
    if mesh.devices.size > 1:
        # the timing below drives the SINGLE-device fused programs
        # (_single_device_topk / pruned_topk_fused); on a multi-chip mesh
        # those are not the designed serving path (sharded_topk + candidate
        # merge) — flag it loudly rather than publish numbers for the wrong
        # program (config5's _timed_topk has the two-branch pattern)
        print("[5b] WARNING: multi-device mesh detected; config 5b times the "
              "single-device fused programs only", file=sys.stderr, flush=True)
    # batch 256: amortizes fixed per-batch work and (at qb=128-aligned
    # query blocks) enables the token-major kernel epilogue; 64 was the
    # round-2 setting and left ~20% on the table at config-5 scale
    nq, lq = 256, 32
    print(f"[5b] generating {n_pages} pages on device", file=sys.stderr, flush=True)
    Pdev, Q, qm = _gen_clustered_corpus_device(n_pages, tokens, d, n_centers,
                                               nq, lq)
    pm_dev = jnp.ones((n_pages, tokens), dtype=bool)
    index = ShardedIndex(P=shard_docs(Pdev, mesh), pmask=shard_docs(pm_dev, mesh),
                         n_docs=n_pages, mesh=mesh)
    del Pdev, pm_dev  # 4 GB: drop the pre-shard handles before timing

    print("[5b] building kmeans summaries", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    # summaries from the DEVICE-resident index: no second corpus transfer.
    # k_centroids=8 matches patch-embedding cluster structure; stage-1 cost
    # is still tokens/8 = 8x below exact
    S, smask = build_summary_tokens(index.P, index.pmask,
                                    k_centroids=8, iters=5)
    dt_build = time.perf_counter() - t0
    summary = build_sharded_index(S, smask, mesh, dtype="bfloat16",
                                  pad_docs_to=64)
    Qd = replicate(jnp.asarray(Q), mesh)
    qmd = replicate(jnp.asarray(qm), mesh)
    k = 10

    from evdr_tpu.ops.pruned import pruned_topk_fused
    import jax

    # honest remote timing (CLAUDE.md): K applications with distinct query
    # buffers chained in ONE jit + a forced fetch. Index-sized arrays ride as
    # jit ARGUMENTS (closure capture would inline 4GB program constants,
    # which remote-compile rejects). K=2 at batch 256: the 4-deep chain's
    # per-step score/top-k temporaries exceeded HBM at this batch
    K = 2

    def chain(fn):
        # rep-index argument: every timing rep dispatches distinct args (a
        # repeated identical (program, args) pair can be served from the
        # remote client's memoization cache — CLAUDE.md timing trap)
        def g(rep, Qd, qmd, *arrs):
            tot_v = jnp.float32(0)
            idx = None
            for i in range(K):
                v, idx = fn(jnp.roll(Qd, rep * K + i, axis=0), qmd, *arrs)
                tot_v = tot_v + jnp.sum(v)
            return tot_v, idx
        return jax.jit(g)

    from evdr_tpu.parallel.topk import _single_device_topk

    def exact1(Qr, qmr, Pa, pma, Sa, sma):
        return _single_device_topk(Qr, qmr, Pa, pma, k, 4096, "pallas")

    def pruned1(n_cand):
        def f(Qr, qmr, Pa, pma, Sa, sma):
            return pruned_topk_fused(Qr, qmr, Pa, pma, Sa, sma, k=k,
                                     n_cand=n_cand, impl="pallas")
        return f

    arrs = (index.P, index.pmask, summary.P, summary.pmask)

    def timed(fn1):
        g = chain(fn1)
        _, idx = g(jnp.int32(0), Qd, qmd, *arrs)   # compile + warm
        _fetch(idx)
        best = float("inf")
        for rep in range(1, 3):
            t0 = time.perf_counter()
            s, idx = g(jnp.int32(rep), Qd, qmd, *arrs)
            float(s)                  # forced fetch
            best = min(best, time.perf_counter() - t0)
        return best / K, _fetch(idx)

    print("[5b] exact top-k (compile + run)", file=sys.stderr, flush=True)
    dt_e, _ = timed(exact1)
    _, idx_e = exact1(Qd, qmd, *arrs)  # reference indices (roll(0) = Qd)
    idx_e = _fetch(idx_e)

    curve = []
    for n_cand in (512, 1024, 2048):
        print(f"[5b] pruned n_cand={n_cand}", file=sys.stderr, flush=True)
        dt_p, _ = timed(pruned1(n_cand))
        _, idx_p2 = pruned1(n_cand)(Qd, qmd, *arrs)
        idx_p2 = _fetch(idx_p2)
        curve.append({
            "n_candidates": n_cand,
            "qps": round(nq / dt_p, 1),
            "recall_at_10": round(pruned_recall(idx_e, idx_p2), 4),
            "recall_at_1": round(pruned_recall(idx_e[:, :1], idx_p2[:, :1]), 4),
            "speedup_vs_exact": round(dt_e / dt_p, 2),
        })
    # headline: smallest candidate set reaching recall@10 >= 0.95 (else best)
    good = [c for c in curve if c["recall_at_10"] >= 0.95]
    pick = good[0] if good else max(curve, key=lambda c: c["recall_at_10"])
    _emit(config=5, metric="pruned_topk_teacher_scale", value=pick["qps"],
          unit="q/s", n_pages=n_pages, tokens_per_page=tokens, batch=nq,
          exact_qps=round(nq / dt_e, 1), n_candidates=pick["n_candidates"],
          recall_at_10_vs_exact=pick["recall_at_10"],
          recall_at_1_vs_exact=pick["recall_at_1"],
          speedup_vs_exact=pick["speedup_vs_exact"],
          summary_build_sec=round(dt_build, 1), curve=curve)


def main():
    from evdr_tpu.utils.timing import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--configs", type=int, nargs="+", default=[1, 2, 3, 4, 5, 6])
    a = p.parse_args()
    fns = {1: config1_bruteforce_fp32, 2: config2_fused_bf16_vs_oracle,
           3: config3_pooled_infonce, 4: config4_iter_liscore,
           5: config5_million_pages, 6: config5b_pruned}
    for c in a.configs:
        fns[c]()


if __name__ == "__main__":
    main()
