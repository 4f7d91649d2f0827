"""Composite end-to-end verification on the REAL TPU chip (verify skill).

Rebuilds the known-good /tmp/verify_evdr.py composite from
.claude/skills/verify/SKILL.md as a persistent script: drives the retrieval
pipeline end-to-end through PUBLIC package imports only, on whatever backend
jax defaults to (the chip when the axon tunnel is up). Each numbered check
prints PASS/FAIL; exits non-zero if any fail.

Run: timeout 1200 python scripts/tpuq/verify_evdr.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile
import threading

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))

FAILS = []


def check(name, ok, detail=""):
    print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}", flush=True)
    if not ok:
        FAILS.append(name)


def main():
    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("VERIFY_PLATFORM"):  # jax preloads axon; env is too late
        jax.config.update("jax_platforms", os.environ["VERIFY_PLATFORM"])
    from evdr_tpu.utils.timing import enable_persistent_cache

    enable_persistent_cache()
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    # CPU smoke mode: pallas only runs interpreted on CPU, so the kernel
    # checks go through interpret=True and the eval impl through xla —
    # the real run (TPU) exercises the compiled kernels.
    on_cpu = jax.default_backend() == "cpu"
    eval_impl = "xla" if on_cpu else "pallas"
    pallas_kw = {"interpret": True} if on_cpu else {}

    from evdr_tpu.data import (make_synthetic_corpus, save_synthetic_npz,
                               load_payload, preprocess_docs,
                               preprocess_queries, l2_normalize)
    from evdr_tpu.eval import CustomRetrievalEvaluator, eval_retrieval
    from evdr_tpu.ops.maxsim import maxsim_numpy, maxsim
    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.tools.convert_packed import convert_payload_to_packed
    from evdr_tpu.tools import search as search_tool

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="verify_evdr_"))

    # --- 1. synthesize -> save npz -> load -> pack -> eval_retrieval(pallas)
    corpus = make_synthetic_corpus(n_docs=24, n_queries=16, dim=128, seed=0)
    npz_path = tmp / "corpus.npz"
    save_synthetic_npz(npz_path, corpus)
    payload = load_payload(npz_path)
    P, pmask, _ = preprocess_docs(payload["documents"],
                                  payload["doc_attnmask"],
                                  payload["doc_imgmask"])
    Q, qmask = preprocess_queries(payload["query"],
                                  payload["query_attnmask"])
    ev = CustomRetrievalEvaluator()
    d2d = {str(i): d for i, d in enumerate(payload["docid"].tolist())}
    rel = payload["relevant_docs"]
    q2q = payload["qsidx_2_query"]
    m_pallas = eval_retrieval(ev, Q, qmask, P, pmask, rel, d2d, q2q,
                              impl=eval_impl)
    r1 = m_pallas["Recall"]["Recall@1"]
    check("1 e2e pallas eval R@1~1.0", r1 >= 0.99, f"R@1={r1:.3f}")

    # --- 2. pallas vs xla metric agreement
    m_xla = eval_retrieval(ev, Q, qmask, P, pmask, rel, d2d, q2q, impl="xla")
    same = all(abs(m_pallas[a][k] - m_xla[a][k]) < 2e-3
               for a in ("NDCG", "Recall") for k in m_pallas[a])
    check("2 pallas==xla metrics", same,
          f"ndcg5 {m_pallas['NDCG']['NDCG@5']:.4f} vs "
          f"{m_xla['NDCG']['NDCG@5']:.4f}")

    # --- 3. high-noise corpus -> R@1 collapses (metrics not vacuous)
    noisy = make_synthetic_corpus(n_docs=24, n_queries=16, dim=128, seed=0,
                                  noise=5.0)
    Pn_, pm_, _ = preprocess_docs(noisy["documents"], noisy["doc_attnmask"],
                                  noisy["doc_imgmask"])
    Qn_, qm_ = preprocess_queries(noisy["query"], noisy["query_attnmask"])
    mn = eval_retrieval(ev, Qn_, qm_, Pn_, pm_, noisy["relevant_docs"],
                        {str(i): d for i, d in
                         enumerate(noisy["docid"].tolist())},
                        noisy["qsidx_2_query"], impl=eval_impl)
    rn = mn["Recall"]["Recall@1"]
    check("3 noise=5.0 R@1<0.9", rn < 0.9, f"R@1={rn:.3f}")

    # --- 4/5/6. kernel semantics vs numpy oracle
    Pn = np.asarray(l2_normalize(P * pmask[..., None].astype(np.float32)))
    pm2 = pmask.copy()
    pm2[3] = False  # fully-masked doc
    want = maxsim_numpy(Q, Pn, qmask, pm2)
    got32 = np.asarray(maxsim_pallas(jnp.asarray(Q), jnp.asarray(Pn),
                                     jnp.asarray(qmask), jnp.asarray(pm2),
                                     jnp.float32, **pallas_kw))
    check("4 fully-masked doc -> 0", bool((got32[:, 3] == 0).all()),
          f"max|s|={np.abs(got32[:, 3]).max():.2e}")
    check("5 fp32 pallas vs oracle<=1e-5",
          float(np.abs(got32 - want).max()) <= 1e-5,
          f"maxerr={np.abs(got32 - want).max():.2e}")
    gotbf = np.asarray(maxsim_pallas(jnp.asarray(Q), jnp.asarray(Pn),
                                     jnp.asarray(qmask), jnp.asarray(pm2),
                                     **pallas_kw))
    check("5b bf16 pallas vs oracle<=2e-2",
          float(np.abs(gotbf - want).max()) <= 2e-2,
          f"maxerr={np.abs(gotbf - want).max():.2e}")
    deg = np.asarray(maxsim(jnp.asarray(Q[:1, :1]), jnp.asarray(Pn[:1, :1]),
                            jnp.asarray(qmask[:1, :1]),
                            jnp.asarray(pm2[:1, :1])))
    dw = maxsim_numpy(Q[:1, :1], Pn[:1, :1], qmask[:1, :1], pm2[:1, :1])
    check("6 degenerate 1q x 1d", float(np.abs(deg - dw).max()) < 1e-4)

    # --- 7. packed bf16/int8 -> engine.from_npz -> top-1 vs fp32 oracle
    oracle = maxsim_numpy(Q, Pn, qmask, pmask)
    want_top1 = oracle.argmax(axis=1)
    for dt in ("bfloat16", "int8"):
        packed = convert_payload_to_packed(payload, dtype=dt, normalize=True)
        pth = tmp / f"packed_{dt}.npz"
        np.savez(pth, **packed)
        eng = RetrievalEngine.from_npz(pth, dtype=dt)
        _, idx = eng.search_dense(Q, qmask, k=3)
        agree = float((np.asarray(idx)[:, 0] == want_top1).mean())
        check(f"7 packed {dt} top-1 vs oracle", agree >= 0.95,
              f"agree={agree:.2f}")

    # --- 8. evdr-search CLI writes a TREC run with oracle rank-1 docids
    qnpz = tmp / "queries.npz"
    save_synthetic_npz(qnpz, {k: corpus[k] for k in
                              ("query", "qid", "query_attnmask",
                               "qsidx_2_query", "relevant_docs")})
    run_path = tmp / "run.trec"
    search_tool.main(["--index", str(npz_path), "--queries", str(qnpz),
                      "--k", "3", "--out", str(run_path), "--dtype",
                      "bfloat16"])
    top1 = {}
    for line in run_path.read_text().splitlines():
        qid_, _, did, rank, *_ = line.split()
        if rank == "1":
            top1[qid_] = did
    agree = np.mean([top1[search_tool.trec_qid(q2q[i])] ==
                     d2d[str(want_top1[i])] for i in range(Q.shape[0])])
    check("8 TREC run rank-1 vs oracle", agree >= 0.95, f"agree={agree:.2f}")

    # --- 9. int8 + pruning: fused pruned top-1 recall vs own exact search
    big = make_synthetic_corpus(n_docs=512, n_queries=64, dim=128, seed=3)
    Pb, pmb, _ = preprocess_docs(big["documents"], big["doc_attnmask"],
                                 big["doc_imgmask"])
    Qb, qmb = preprocess_queries(big["query"], big["query_attnmask"])
    engp = RetrievalEngine(dtype="int8", prune_centroids=4)
    engp.build(Pb, pmb, docids=[str(d) for d in big["docid"].tolist()])
    _, exact_idx = engp.search_dense(Qb, qmb, k=1)
    _, pruned_idx = engp.search_dense(Qb, qmb, k=1, n_candidates=64)
    pruned_idx = np.asarray(pruned_idx)
    rec = float((pruned_idx[:, 0] == np.asarray(exact_idx)[:, 0]).mean())
    check("9 pruned top-1 recall>=0.9", rec >= 0.9, f"recall={rec:.2f}")
    check("9b pruned indices < n_docs", bool((pruned_idx < engp.n_docs).all()))

    # --- 10. int8 + quantize_queries resolves to pallas_q8 and agrees
    engq = RetrievalEngine(dtype="int8", quantize_queries=True)
    engq.build(Pb, pmb)
    if jax.default_backend() in ("tpu", "axon"):
        check("10 impl resolves pallas_q8", engq.impl == "pallas_q8",
              engq.impl)
    _, qidx = engq.search_dense(Qb, qmb, k=1)
    ob = maxsim_numpy(Qb, np.asarray(
        l2_normalize(Pb * pmb[..., None].astype(np.float32))), qmb, pmb)
    agree = float((np.asarray(qidx)[:, 0] == ob.argmax(1)).mean())
    check("10b q8 top-1 vs fp32 oracle", agree >= 0.95, f"agree={agree:.2f}")

    # --- 11. HTTP server round trip
    from evdr_tpu.tools.serve_http import make_server

    eng = RetrievalEngine(dtype="bfloat16")
    eng.build(P, pmask, docids=[str(d) for d in payload["docid"].tolist()])
    srv = make_server(eng, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        import urllib.request

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            check("11 /healthz", r.status == 200)
        body = json.dumps({"queries": Q[:4].tolist(),
                           "qmask": qmask[:4].tolist(), "k": 3}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        got1 = [row[0] for row in out["docids"]]
        want1 = [d2d[str(want_top1[i])] for i in range(4)]
        check("11b /search top-1 vs oracle", got1 == want1,
              f"{got1} vs {want1}")
    finally:
        srv.shutdown()

    # --- 12. capacity tiers end-to-end: int4 and PQ engines vs fp32 oracle
    # (exercises maxsim_pq_xla's subspace-major chunk path and the packed
    # int4 route through the public engine API)
    ob1 = ob.argmax(1)
    for dt, kw, bar in (("int4", {}, 0.95), ("pq", {"pq_m": 16}, 0.85)):
        engt = RetrievalEngine(dtype=dt, **kw)
        engt.build(Pb, pmb)
        _, tidx = engt.search_dense(Qb, qmb, k=1)
        agree = float((np.asarray(tidx)[:, 0] == ob1).mean())
        check(f"12 {dt} engine top-1 vs oracle", agree >= bar,
              f"agree={agree:.2f}")

    # --- 13. fused PQ kernel (round 5): direct parity vs the reconstruction
    # oracle (bf16 dot + int8 books => loose rtol, top-1 must hold), the
    # OPQ expanded-books path, and the quantized-queries pqfull tier
    import jax.numpy as jnp

    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.ops.pallas_maxsim import (maxsim_pallas_pq,
                                            maxsim_pallas_pqfull)
    from evdr_tpu.ops.pq import decode_pq, encode_pq, train_pq

    books = train_pq(Pb, pmb, m=16, iters=6, seed=0)
    codes = encode_pq(Pb, books, pmb)
    rec_oracle = maxsim_numpy(Qb[:8], decode_pq(codes, books), qmb[:8], pmb)
    pqk = np.asarray(maxsim_pallas_pq(
        jnp.asarray(Qb[:8]), jnp.asarray(codes), jnp.asarray(qmb[:8]),
        jnp.asarray(pmb), jnp.asarray(books), **pallas_kw))
    rel = (np.abs(pqk - rec_oracle)
           / np.maximum(np.abs(rec_oracle), 1e-3)).max()
    check("13 pq kernel vs reconstruction oracle", rel <= 2e-2,
          f"max rel={rel:.4f}")
    check("13b pq kernel top-1 == oracle top-1",
          bool((pqk.argmax(1) == rec_oracle.argmax(1)).all()))
    pqf = np.asarray(maxsim_pallas_pqfull(
        jnp.asarray(Qb[:8]), jnp.asarray(codes), jnp.asarray(qmb[:8]),
        jnp.asarray(pmb), jnp.asarray(books), **pallas_kw))
    agree = float((pqf.argmax(1) == rec_oracle.argmax(1)).mean())
    check("13c pqfull (int8 queries) top-1 vs oracle", agree >= 0.95,
          f"agree={agree:.2f}")
    engo = RetrievalEngine(dtype="pq", pq_m=16, pq_opq=True)
    engo.build(Pb, pmb)
    _, oidx = engo.search_dense(Qb, qmb, k=1)
    agree = float((np.asarray(oidx)[:, 0] == ob1).mean())
    check("13d OPQ engine (expanded books) top-1 vs oracle", agree >= 0.85,
          f"agree={agree:.2f}")
    # --- 13e. PLAID combo at the PQ tier: bf16 summaries prune, fused
    # decode-rerank scores only the candidates (engine dtype='pq' +
    # prune_centroids — the wave-4 bench_pq 'pq_pruned' serving path)
    engp = RetrievalEngine(dtype="pq", pq_m=16, prune_centroids=4)
    engp.build(Pb, pmb)
    _, ex_i = engp.search_dense(Qb, qmb, k=1)
    _, pr_i = engp.search_dense(Qb, qmb, k=1,
                                n_candidates=max(8, Pb.shape[0] // 4))
    agree = float((np.asarray(pr_i)[:, 0] == np.asarray(ex_i)[:, 0]).mean())
    check("13e pq+pruned engine top-1 vs its own exact", agree >= 0.9,
          f"agree={agree:.2f}")

    # --- 13f. quantized stage-1 summaries (engine summary_dtype='int8'):
    # the capacity configuration — bf16 summaries otherwise dominate a
    # PQ+pruned build's bytes. Stage 2 is unchanged, so pruned top-1 must
    # still track the same engine's exact search.
    engq = RetrievalEngine(dtype="pq", pq_m=16, prune_centroids=4,
                           summary_dtype="int8")
    engq.build(Pb, pmb)
    _, ex_i = engq.search_dense(Qb, qmb, k=1)
    _, pr_i = engq.search_dense(Qb, qmb, k=1,
                                n_candidates=max(8, Pb.shape[0] // 4))
    agree = float((np.asarray(pr_i)[:, 0] == np.asarray(ex_i)[:, 0]).mean())
    check("13f pq+pruned int8 summaries top-1 vs its own exact",
          agree >= 0.9, f"agree={agree:.2f}")

    # --- 14. auto-rows tiling at the SERVING query batch (qbl = 8192):
    # a query batch big enough to hit the _auto_rows cap puts everything in
    # ONE q-block — the tiling the config-5/headline serving paths now run
    # by default (i8f/bf16/i8x/i4x_sweep_smalllp adoptions). The sweeps
    # only measured throughput; this is the numerics gate at those tiles.
    from evdr_tpu.ops.pallas_maxsim import (maxsim_pallas_int8,
                                            maxsim_pallas_int8full)
    from evdr_tpu.ops.quantize import quantize_tokens_int8

    reps = -(-8192 // (Qb.shape[0] * ((Qb.shape[1] + 7) // 8 * 8)))
    Q4 = np.concatenate([Qb] * reps, axis=0)
    qm4 = np.concatenate([qmb] * reps, axis=0)
    assert Q4.shape[0] * ((Q4.shape[1] + 7) // 8 * 8) >= 8192, Q4.shape
    Pn4 = np.asarray(l2_normalize(Pb * pmb[..., None].astype(np.float32)))
    want14 = maxsim_numpy(Q4, Pn4, qm4, pmb)
    c14, s14 = quantize_tokens_int8(Pn4, pmb)
    got = np.asarray(maxsim_pallas_int8full(
        jnp.asarray(Q4), jnp.asarray(c14), jnp.asarray(s14),
        jnp.asarray(qm4), jnp.asarray(pmb), **pallas_kw))
    agree = float((got.argmax(1) == want14.argmax(1)).mean())
    check("14 int8full top-1 at qbl=8192 auto tiles", agree >= 0.95,
          f"agree={agree:.2f}")
    got = np.asarray(maxsim_pallas_int8(
        jnp.asarray(Q4), jnp.asarray(c14), jnp.asarray(s14),
        jnp.asarray(qm4), jnp.asarray(pmb), **pallas_kw))
    agree = float((got.argmax(1) == want14.argmax(1)).mean())
    check("14b int8-index top-1 at qbl=8192 auto tiles", agree >= 0.95,
          f"agree={agree:.2f}")
    got = np.asarray(maxsim_pallas(jnp.asarray(Q4), jnp.asarray(Pn4),
                                   jnp.asarray(qm4), jnp.asarray(pmb),
                                   **pallas_kw))
    rel = (np.abs(got - want14) / np.maximum(np.abs(want14), 1e-3)).max()
    check("14c bf16 vs oracle<=2e-2 at qbl=8192 auto tiles", rel <= 2e-2,
          f"max rel={rel:.4f}")

    print(f"\n{len(FAILS)} failures" + (f": {FAILS}" if FAILS else ""),
          flush=True)
    return 1 if FAILS else 0


if __name__ == "__main__":
    sys.exit(main())
