"""evdr-serve — minimal HTTP retrieval server over a saved index.

Online counterpart of the batch ``evdr-search`` CLI: load an index npz once
(interchange or packed, any storage dtype), warm the scoring program, then
answer search requests over HTTP. Stdlib-only (ThreadingHTTPServer); device
dispatch is serialized through a lock (one scoring program in flight per
chip).

    evdr-serve --index features/dump_all.npz --port 8080 \
        [--dtype int8] [--prune_centroids 8] [--quantize_queries]

API:
- ``GET /healthz`` -> ``{"status": "ok", "n_docs": N, ...}``
- ``POST /search`` with JSON body
  ``{"queries": [[[...dim floats...] per token] per query],
     "attnmask": [[bool per token] per query]   (optional),
     "k": 10                                    (optional),
     "n_candidates": 512                        (optional, pruned engines)}``
  -> ``{"docids": [[...] per query], "scores": [[...] per query],
        "latency_ms_per_query": ...}``

The reference repo has no serving path at all (scoring happens inline in
training scripts, evaluator/retrieval.py); this is a beyond-reference
deployment component built on the same engine the benches measure.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _batch_bucket(n: int) -> int:
    """Smallest power-of-two >= n: request batch sizes snap to a handful of
    shapes so the jit cache stays small (a fresh compile costs 40s-3min over
    a remote-TPU tunnel and would stall every in-flight request)."""
    b = 1
    while b < n:
        b *= 2
    return b


def bucket_queries(Q, qmask):
    """Pad (nq, Lq, D) queries up the batch axis to the power-of-two bucket.

    Padded rows are fully masked (qmask False) so they are inert in the
    scoring kernel; callers slice results back to the true nq."""
    nq = Q.shape[0]
    nb = _batch_bucket(nq)
    if nb > nq:
        Q = np.pad(Q, ((0, nb - nq), (0, 0), (0, 0)))
        qmask = np.pad(qmask, ((0, nb - nq), (0, 0)))
    return Q, qmask


def warm_query_dim(engine) -> int:
    """Token dim for the warm-up queries. PQ indexes store uint8 codes, so
    D must come from the codebooks — whose layout (compact (M, K, D/M) vs
    expanded OPQ (M, K, D)) is ambiguous from shape alone; the builder
    records it as ``index.books_expanded``. Float/int8 indexes read D off
    the stored tokens."""
    idx = engine.index
    if idx.books is not None:
        b = idx.books
        return (int(b.shape[-1]) if getattr(idx, "books_expanded", False)
                else int(b.shape[0] * b.shape[-1]))
    return int(idx.P.shape[-1])


def make_server(engine, host: str = "127.0.0.1", port: int = 8080,
                default_k: int = 10, default_candidates: int = 0,
                max_body_mb: int = 256, length_multiple: int = 8):
    """Build a ThreadingHTTPServer wired to a built RetrievalEngine."""
    from evdr_tpu.data.packing import preprocess_queries

    lock = threading.Lock()
    max_body = max_body_mb * (1 << 20)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": "unknown path"})
            self._reply(200, {
                "status": "ok", "n_docs": engine.n_docs,
                "dtype": engine.dtype, "impl": engine.impl,
                "pruned": engine.summary is not None,
            })

        def do_POST(self):
            if self.path != "/search":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > max_body:
                    return self._reply(413, {
                        "error": f"body {n} bytes exceeds {max_body} cap"})
                req = json.loads(self.rfile.read(n))
                queries = req["queries"]
                if not queries:
                    return self._reply(400, {"error": "empty queries"})
                qobj = np.empty(len(queries), dtype=object)
                for i, q in enumerate(queries):
                    qobj[i] = np.asarray(q, dtype=np.float32)
                am = req.get("attnmask")
                amobj = None
                if am is not None:
                    amobj = np.empty(len(am), dtype=object)
                    for i, m in enumerate(am):
                        amobj[i] = np.asarray(m, dtype=bool)
                # snap request shapes to buckets (batch -> power of two,
                # token axis -> multiple) so they hit the warm compile cache
                Q, qmask = preprocess_queries(
                    qobj, amobj, length_multiple=length_multiple)
                Q, qmask = bucket_queries(Q, qmask)
                # clamp to the real doc count: beyond it top-k would surface
                # index-padding rows (-inf scores, out-of-range docids)
                k = min(int(req.get("k", default_k)), engine.n_docs)
                n_cand = int(req.get("n_candidates", default_candidates)) or None
                t0 = time.perf_counter()
                with lock:  # one device dispatch in flight
                    vals, idx = engine.search_dense(Q, qmask, k=k,
                                                    n_candidates=n_cand)
                vals, idx = vals[: len(queries)], idx[: len(queries)]
                ms = (time.perf_counter() - t0) * 1000.0 / len(queries)
                self._reply(200, {"docids": engine.ids_for(idx),
                                  "scores": np.asarray(vals).tolist(),
                                  "latency_ms_per_query": round(ms, 3)})
            except (KeyError, ValueError, TypeError, IndexError,
                    json.JSONDecodeError) as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # XLA/runtime errors: JSON 500, keep the
                self._reply(500, {  # connection alive instead of dropping it
                    "error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--dtype", choices=("float32", "bfloat16", "int8", "pq"),
                   default="bfloat16")
    p.add_argument("--impl", default="auto")
    p.add_argument("--chunk_p", type=int, default=512)
    p.add_argument("--prune_centroids", type=int, default=0)
    p.add_argument("--n_candidates", type=int, default=0)
    p.add_argument("--quantize_queries", action="store_true")
    p.add_argument("--max_body_mb", type=int, default=256)
    p.add_argument("--length_multiple", type=int, default=8,
                   help="query token axis pads to a multiple of this")
    p.add_argument("--warm", default="1,8,32",
                   help="comma list of batch buckets to pre-compile; requests "
                        "snap to power-of-two batches, so warmed buckets "
                        "answer without paying a 40s-3min remote compile")
    p.add_argument("--multihost", action="store_true",
                   help="one-process-per-host serving over a global mesh "
                        "(parallel/multihost.py): every process loads its "
                        "own doc shards; process 0 serves HTTP and "
                        "broadcasts each search, the rest mirror it")
    p.add_argument("--coordinator", default=None,
                   help="multihost: process 0's host:port (TPU pods "
                        "auto-detect when omitted)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    a = p.parse_args(argv)

    mesh = None
    if a.multihost:
        import jax

        from evdr_tpu.parallel.multihost import (global_doc_mesh,
                                                 init_multihost)

        init_multihost(a.coordinator, a.num_processes, a.process_id)
        mesh = global_doc_mesh()
        print(f"[serve] multihost process {jax.process_index()}/"
              f"{jax.process_count()}: {len(jax.devices())} global devices",
              flush=True)

    from evdr_tpu.engine import RetrievalEngine

    print(f"[serve] loading index {a.index}", flush=True)
    eng = RetrievalEngine.from_npz(
        a.index, mesh=mesh, mmap=a.multihost, dtype=a.dtype, impl=a.impl,
        chunk_p=a.chunk_p, prune_centroids=a.prune_centroids,
        quantize_queries=a.quantize_queries)

    coord = None
    if a.multihost:
        import jax

        from evdr_tpu.parallel.multihost import MultihostSearchCoordinator

        coord = MultihostSearchCoordinator(eng)
        if jax.process_index() != 0:
            print(f"[serve] follower {jax.process_index()} entering the "
                  "SPMD mirror loop", flush=True)
            coord.follow()
            return
        eng = coord  # frontend: every search broadcasts before dispatching
    # warm the scoring program per batch bucket so a request at any warmed
    # shape never pays the compile while holding the dispatch lock
    d = warm_query_dim(eng)
    for b in sorted({int(x) for x in a.warm.split(",") if x.strip()}):
        warm = np.zeros((b, a.length_multiple, d), np.float32)
        wm = np.zeros((b, a.length_multiple), bool)
        wm[:, 0] = True  # one valid token: exercises the real masked path
        eng.search_dense(warm, wm, k=min(a.k, eng.n_docs),
                         n_candidates=a.n_candidates or None)
        print(f"[serve] warmed batch bucket {b}", flush=True)
    srv = make_server(eng, a.host, a.port, default_k=a.k,
                      default_candidates=a.n_candidates,
                      max_body_mb=a.max_body_mb,
                      length_multiple=a.length_multiple)
    print(f"[serve] {eng.n_docs} docs ready on http://{a.host}:{a.port}",
          flush=True)
    try:
        srv.serve_forever()
    finally:
        if coord is not None:
            # release the follower processes from their broadcast wait —
            # without OP_STOP a frontend exit (Ctrl-C, systemd stop) leaves
            # every pod host blocked in the collective forever
            coord.stop()


if __name__ == "__main__":
    main()
