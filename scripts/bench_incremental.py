"""Incremental-serving benchmark: the cost of liveness.

Measures, on a corpus-scale index:
- baseline exact search q/s (no incremental state);
- search q/s with a small tail + tombstones (the fused merged program —
  main + tail + alive-mask filter in ONE dispatch);
- add() latency (an O(batch) host append — the tail build is LAZY) and,
  separately, the deferred tail quantize/device build (_ensure_tail) and
  the first merged-program compile;
- 1k SEQUENTIAL single-doc adds: per-add cost must stay flat (first vs
  last decile) — the consolidation is deferred, so a burst of adds pays
  ONE tail concatenation, not a quadratic re-copy per add;
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
    p.add_argument("--platform", default="auto",
                   help="'cpu' forces the CPU backend (jax.config.update — "
                        "env vars are too late, jax preloads via "
                        "sitecustomize); 'auto' uses the default (TPU)")
    a = p.parse_args()

    import jax

    if a.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

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
    eng.add(Pt, pmt)           # O(batch) host append (tail is LAZY now)
    add_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng._ensure_tail()         # deferred tail quantize + device build
    tail_build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng.search_dense(Q, qm, k=a.k)   # first merged search: pays compile
    first_merged_s = time.perf_counter() - t0
    merged_qps = timed_search(eng, Q, qm, a.k)

    # 1k sequential single-doc adds: flat per-add cost (lazy consolidation)
    one = unit(rng.normal(size=(1, a.lp, a.d))).astype(np.float32)
    onem = np.ones((1, a.lp), bool)
    per_add = []
    for i in range(1000):
        t0 = time.perf_counter()
        eng.add(one + np.float32(1e-6) * i, onem)
        per_add.append(time.perf_counter() - t0)
    first_decile = float(np.mean(per_add[:100]))
    last_decile = float(np.mean(per_add[-100:]))
    t0 = time.perf_counter()
    eng._ensure_tail()   # the ONE deferred consolidation for the burst
    burst_consolidate_s = time.perf_counter() - t0
    eng.search_dense(Q, qm, k=a.k)   # absorb the tail-shape recompile

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
        "add_s": round(add_s, 4),
        "tail_build_s": round(tail_build_s, 3),
        "first_merged_search_s": round(first_merged_s, 2),
        "seq_adds_first_decile_us": round(first_decile * 1e6, 1),
        "seq_adds_last_decile_us": round(last_decile * 1e6, 1),
        "seq_adds_flat": bool(last_decile < 10 * first_decile + 1e-4),
        "burst_consolidate_s": round(burst_consolidate_s, 3),
        "max_post_delete_search_s": round(max(post_delete_s), 3),
    }))


if __name__ == "__main__":
    main()
