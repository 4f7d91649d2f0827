"""evdr-search — batch top-k retrieval CLI over a saved index.

The serving counterpart of evdr-train for script users: load a page-embedding
index npz (the reference's pickled-object interchange format from
utils/preprocess_data.py:129-208, or the packed format from
tools/convert_packed.py in any storage dtype), load a query feature npz, and
write per-query top-k results as a TREC run file or JSON — the offline
equivalent of `RetrievalEngine.search`.

    python -m evdr_tpu.tools.search --index dump_all.npz --queries q.npz \
        --k 10 --out run.trec [--format trec|json] [--dtype bfloat16|int8] \
        [--prune_centroids 8 --n_candidates 512] [--impl auto|xla|pallas]

Prints one JSON summary line (n_queries, n_docs, per-query latency ms) on
completion; per-query latency follows the reference's convention of wall
time around the scoring call divided by query count
(mainv2_iter_listwise.py:308-310).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _load_queries(path):
    """Query npz (interchange or packed) -> (Q_norm, qmask, query keys)."""
    from evdr_tpu.data.npz_io import load_query_payload
    from evdr_tpu.data.packing import preprocess_queries
    from evdr_tpu.tools.convert_packed import is_packed, load_packed_payload

    if is_packed(path):
        payload = load_packed_payload(path)
        Q, qmask = np.asarray(payload["Q_norm"]), np.asarray(payload["qmask"])
    else:
        payload = load_query_payload(path)
        Q, qmask = preprocess_queries(payload["query"],
                                      payload.get("query_attnmask"))
    qkeys = payload.get("qid")
    if qkeys is None:
        qkeys = payload.get("qsidx_2_query")
    if qkeys is None:
        qkeys = [str(i) for i in range(Q.shape[0])]
    return Q, qmask, [str(k) for k in qkeys]


def trec_qid(key) -> str:
    """TREC fields are whitespace-delimited, but this corpus convention keys
    queries by the QUESTION STRING (ProxyQ / gt-docs, synthetic.py): collapse
    whitespace runs to '_' so run lines stay parseable. evdr-eval applies the
    same mapping to its --queries remap keys, so the round trip is lossless."""
    return "_".join(str(key).split()) or "_"


def write_trec_run(fh, qkeys, docids, scores, tag: str = "evdr_tpu") -> None:
    """Standard TREC run lines: ``qid Q0 docid rank score tag``."""
    for qk, ids, vals in zip(qkeys, docids, scores):
        for rank, (d, v) in enumerate(zip(ids, vals), start=1):
            fh.write(f"{trec_qid(qk)} Q0 {d} {rank} {float(v):.6f} {tag}\n")


def run_search(index_path, queries_path, k: int = 10, dtype: str = "bfloat16",
               impl: str = "auto", prune_centroids: int = 0,
               n_candidates: int = 0, chunk_p: int = 512,
               quantize_queries: bool = False, summary_dtype=None):
    """Returns (qkeys, per-query docid lists, scores (nq, k), summary dict)."""
    from evdr_tpu.engine import RetrievalEngine

    eng = RetrievalEngine.from_npz(
        index_path, dtype=dtype, impl=impl, chunk_p=chunk_p,
        prune_centroids=prune_centroids, quantize_queries=quantize_queries,
        summary_dtype=summary_dtype)
    Q, qmask, qkeys = _load_queries(queries_path)
    kk = min(k, eng.n_docs)
    nc = n_candidates or None
    # warm-up: first call pays jit compilation (40s-3min on the remote-TPU
    # backend) — timing it would report compile time as per-query latency.
    # Rolled inputs: same shapes (compile-cache hit) but different buffers,
    # so the remote client cannot serve the TIMED call from its dispatch
    # memo (CLAUDE.md honest-timing notes; serve_http.py warms the same way)
    eng.search_dense(np.roll(Q, 1, axis=0), qmask, k=kk, n_candidates=nc)
    t0 = time.time()
    vals, idx = eng.search_dense(Q, qmask, k=kk, n_candidates=nc)
    latency_ms = (time.time() - t0) * 1000.0 / max(1, Q.shape[0])
    ids = eng.ids_for(idx)
    summary = {"n_queries": int(Q.shape[0]), "n_docs": int(eng.n_docs),
               "k": int(vals.shape[1]), "latency_ms_per_query":
               round(latency_ms, 4), "dtype": dtype, "impl": eng.impl,
               "pruned": bool(n_candidates and prune_centroids)}
    return qkeys, ids, np.asarray(vals), summary


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True, help="doc feature npz")
    p.add_argument("--queries", required=True, help="query feature npz")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--out", default="-", help="output path ('-' = stdout)")
    p.add_argument("--format", choices=("trec", "json"), default="trec")
    p.add_argument("--dtype", choices=("float32", "bfloat16", "int8", "int4", "pq"),
                   default="bfloat16")
    p.add_argument("--impl", default="auto")
    p.add_argument("--chunk_p", type=int, default=512)
    p.add_argument("--prune_centroids", type=int, default=0)
    p.add_argument("--summary_dtype", default=None,
                   choices=("bfloat16", "int8", "int4"),
                   help="storage tier of the stage-1 pruning summaries "
                        "(default: engine dtype; bf16 for pq)")
    p.add_argument("--n_candidates", type=int, default=0)
    p.add_argument("--quantize_queries", action="store_true")
    p.add_argument("--tag", default="evdr_tpu")
    a = p.parse_args(argv)

    qkeys, ids, vals, summary = run_search(
        a.index, a.queries, k=a.k, dtype=a.dtype, impl=a.impl,
        prune_centroids=a.prune_centroids, n_candidates=a.n_candidates,
        summary_dtype=a.summary_dtype,
        chunk_p=a.chunk_p, quantize_queries=a.quantize_queries)

    fh = sys.stdout if a.out == "-" else open(a.out, "w")
    try:
        if a.format == "trec":
            write_trec_run(fh, qkeys, ids, vals, tag=a.tag)
        else:
            json.dump({qk: {d: float(v) for d, v in zip(row, vrow)}
                       for qk, row, vrow in zip(qkeys, ids, vals)}, fh)
            fh.write("\n")
    finally:
        if fh is not sys.stdout:
            fh.close()
    print(json.dumps(summary), file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
