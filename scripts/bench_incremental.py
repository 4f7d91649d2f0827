"""Incremental-serving benchmark: the cost of liveness.

Measures, on a corpus-scale index:
- baseline exact search q/s (no incremental state);
- search q/s with a small tail + tombstones (the fused merged program —
  main + tail + alive-mask filter in ONE dispatch);
- add() latency (tail rebuild + one merged-program compile);
- delete() -> next-search latency (MUST be compile-free: the alive mask
  is a dynamic argument).

Run: python scripts/bench_incremental.py [--n_docs 250000 --batch 64]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timed_search(eng, Q, qm, k, reps=3):
    best = float("inf")
    for r in range(reps):
        # distinct buffer CONTENT per rep (np.roll is the identity at
        # batch 1 — the memoizing remote client would serve the repeat
        # from cache and the timing would collapse to ~0)
        Qr = (Q + np.float32(1e-6) * (r + 1)).copy()
        t0 = time.perf_counter()
        v, _ = eng.search_dense(Qr, qm, k=k)
        float(np.asarray(v).sum())
        best = min(best, time.perf_counter() - t0)
    return Q.shape[0] / best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_docs", type=int, default=250_000)
    p.add_argument("--lp", type=int, default=16)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--tail", type=int, default=100,
                   help="docs added incrementally before the tail timing")
    a = p.parse_args()

    import jax

    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.utils.timing import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    P = unit(rng.normal(size=(a.n_docs, a.lp, a.d))).astype(np.float32)
    pm = np.ones((a.n_docs, a.lp), bool)
    eng = RetrievalEngine(dtype=a.dtype, normalize=False)
    eng.build(P, pm)
    Q = unit(rng.normal(size=(a.batch, 8, a.d))).astype(np.float32)
    qm = np.ones((a.batch, 8), bool)

    eng.search_dense(Q, qm, k=a.k)  # warm baseline program
    base_qps = timed_search(eng, Q, qm, a.k)

    Pt = unit(rng.normal(size=(a.tail, a.lp, a.d))).astype(np.float32)
    pmt = np.ones((a.tail, a.lp), bool)
    t0 = time.perf_counter()
    eng.add(Pt, pmt)           # tail build (no search compile yet)
    add_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng.search_dense(Q, qm, k=a.k)   # first merged search: pays compile
    first_merged_s = time.perf_counter() - t0
    merged_qps = timed_search(eng, Q, qm, a.k)

    # deletes must NOT recompile: time the search right after each
    victims = [str(int(i)) for i in rng.integers(0, a.n_docs, size=5)]
    post_delete_s = []
    for v in victims:
        eng.delete([v])
        t0 = time.perf_counter()
        vv, _ = eng.search_dense(Q, qm, k=a.k)
        float(np.asarray(vv).sum())
        post_delete_s.append(time.perf_counter() - t0)

    print(json.dumps({
        "backend": jax.default_backend(),
        "shape": [a.n_docs, a.lp, a.d], "batch": a.batch,
        "tail": a.tail,
        "baseline_qps": round(base_qps, 1),
        "merged_qps": round(merged_qps, 1),
        "merged_over_baseline": round(merged_qps / base_qps, 3),
        "add_s": round(add_s, 3),
        "first_merged_search_s": round(first_merged_s, 2),
        "max_post_delete_search_s": round(max(post_delete_s), 3),
    }))


if __name__ == "__main__":
    main()
