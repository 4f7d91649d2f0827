"""evdr-serve concurrency benchmark: micro-batching vs serialized dispatch.

Spins the HTTP daemon in-process over a synthetic index, fires waves of
concurrent single-query clients (the worst case for lock-per-request
serving: every request pays a full device dispatch + ~30 ms tunnel RTT on
the remote backend), and reports aggregate queries/sec plus observed
dispatch-group sizes for:

- max_batch=1  — the pre-micro-batching behavior (each request its own
  dispatch, serialized);
- coalesced    — natural batching (+ a small linger) via MicroBatcher.

Run: python scripts/bench_serve.py [--n_docs 20000 --clients 32 --waves 4]
CPU runs exercise the machinery; the interesting numbers are on the TPU
where per-dispatch latency dominates (RESULTS.md online-serving section).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def run_wave(base: str, queries, k: int, n_clients: int):
    """Fire n_clients concurrent single-query requests; return
    (wall seconds, list of batched_with sizes, list of top-1 docids)."""
    results = [None] * n_clients
    errors = []

    def client(i):
        body = json.dumps({"queries": [queries[i % len(queries)]],
                           "k": k}).encode()
        req = urllib.request.Request(
            base + "/search", data=body,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=600) as r:
                results[i] = json.loads(r.read())
        except Exception as e:  # noqa: BLE001 — surface in the summary
            errors.append(f"{type(e).__name__}: {e}")

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise RuntimeError(f"{len(errors)} client errors: {errors[:3]}")
    return (wall, [r["batched_with"] for r in results],
            [r["docids"][0][0] for r in results])


def bench_config(engine, queries, k: int, clients: int, waves: int,
                 batch_wait_ms: float, max_batch: int):
    from evdr_tpu.tools.serve_http import make_server

    srv = make_server(engine, port=0, batch_wait_ms=batch_wait_ms,
                      max_batch=max_batch)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # warm EVERY power-of-two batch bucket a coalesced group can land
        # on (group sizes vary wave to wave; an unwarmed bucket would put
        # a compile inside the timed wave)
        b = 1
        while b <= min(max_batch, clients):
            body = json.dumps({"queries": queries[:b], "k": k}).encode()
            req = urllib.request.Request(
                base + "/search", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as r:
                r.read()
            b *= 2
        run_wave(base, queries, k, clients)  # warm the concurrent path
        best_qps, sizes, top1 = 0.0, [], None
        for _ in range(waves):
            wall, wave_sizes, wave_top1 = run_wave(base, queries, k, clients)
            best_qps = max(best_qps, clients / wall)
            sizes += wave_sizes
            top1 = wave_top1
        return {"qps": round(best_qps, 1),
                "mean_group": round(float(np.mean(sizes)), 2),
                "max_group": int(np.max(sizes))}, top1
    finally:
        srv.shutdown()
        srv.server_close()  # stops the MicroBatcher dispatcher too


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_docs", type=int, default=20_000)
    p.add_argument("--lp", type=int, default=16)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--waves", type=int, default=4)
    p.add_argument("--wait_ms", type=float, default=5.0,
                   help="linger for the coalesced config")
    p.add_argument("--dtype", default="bfloat16")
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
    # queries = noisy token copies so top-1 has a stable right answer
    qtok = unit(P[rng.integers(0, a.n_docs, size=64), :8]
                + 0.05 * rng.normal(size=(64, 8, a.d))).astype(np.float32)
    queries = [q.tolist() for q in qtok]

    serial, top1_a = bench_config(eng, queries, a.k, a.clients, a.waves,
                                  batch_wait_ms=0.0, max_batch=1)
    coalesced, top1_b = bench_config(eng, queries, a.k, a.clients, a.waves,
                                     batch_wait_ms=a.wait_ms, max_batch=64)
    if top1_a != top1_b:
        raise AssertionError("coalesced top-1 differs from serialized")
    print(json.dumps({
        "backend": jax.default_backend(),
        "shape": [a.n_docs, a.lp, a.d], "clients": a.clients,
        "serialized": serial, "coalesced": coalesced,
        "speedup": round(coalesced["qps"] / serial["qps"], 2)}))


if __name__ == "__main__":
    main()
