"""Serving-index dtype quality sweep: fp32 vs bf16 vs int8 vs PQ (VERDICT r1 #10).

For each synthetic dataset, builds the serving index at each storage dtype,
scores the test queries through the standard engine path, and reports
nDCG@5 / Recall@1 deltas vs the fp32 reference semantics
(evaluator/retrieval.py:176-177). Run on CPU (xla) or TPU (pallas):

    python scripts/index_quality.py [--impl auto] [--datasets 5] [--dim 128]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def evaluate(corpus, dtype, impl, pq_m=16, pq_opq=False):
    import jax.numpy as jnp

    from evdr_tpu.data.packing import preprocess_queries
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.eval.evaluator import (CustomRetrievalEvaluator,
                                         scores_to_results)

    eng = RetrievalEngine(dtype=dtype, impl=impl, pq_m=pq_m, pq_opq=pq_opq)
    eng.build_from_ragged(corpus["documents"], corpus["doc_attnmask"],
                          corpus["doc_imgmask"], docids=corpus["docid"])
    Q, qm = preprocess_queries(corpus["query"], corpus["query_attnmask"])
    scores = eng.score_all(Q, qm)
    ev = CustomRetrievalEvaluator()
    results = scores_to_results(np.asarray(scores), corpus["qsidx_2_query"],
                                corpus["docidx_2_docid"])
    m = ev.compute_mteb_metrics(corpus["relevant_docs"], results)
    return {"NDCG@5": m["NDCG"]["NDCG@5"], "Recall@1": m["Recall"]["Recall@1"]}


def main():
    from evdr_tpu.data.synthetic import make_synthetic_corpus

    p = argparse.ArgumentParser()
    p.add_argument("--impl", default="auto")
    p.add_argument("--datasets", type=int, default=5)
    p.add_argument("--n_docs", type=int, default=512)
    p.add_argument("--n_queries", type=int, default=64)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--pq_m", type=int, default=16,
                   help="PQ subspaces (bytes/token) for the pq column")
    p.add_argument("--noise", type=float, default=3.0,
                   help="query noise: high enough that rankings have near-ties")
    a = p.parse_args()

    rows = []
    for ds in range(a.datasets):
        c = make_synthetic_corpus(n_docs=a.n_docs, n_queries=a.n_queries,
                                  dim=a.dim, seed=100 + ds, noise=a.noise)
        row = {"dataset": f"synth{ds}"}
        for label, dtype, opq in (("fp32", None, False),
                                  ("bf16", "bfloat16", False),
                                  ("int8", "int8", False),
                                  ("int4", "int4", False),
                                  ("pq", "pq", False),
                                  ("opq", "pq", True)):
            m = evaluate(c, dtype, a.impl, pq_m=a.pq_m, pq_opq=opq)
            row[f"{label}_N@5"] = round(m["NDCG@5"], 5)
            row[f"{label}_R@1"] = round(m["Recall@1"], 5)
        rows.append(row)
        print(json.dumps(row))

    def avg(key):
        return sum(r[key] for r in rows) / len(rows)

    summary = {
        "metric": "index_dtype_quality",
        "fp32_N@5": round(avg("fp32_N@5"), 5),
        "bf16_N@5_delta": round(avg("bf16_N@5") - avg("fp32_N@5"), 5),
        "int8_N@5_delta": round(avg("int8_N@5") - avg("fp32_N@5"), 5),
        "int4_N@5_delta": round(avg("int4_N@5") - avg("fp32_N@5"), 5),
        "pq_N@5_delta": round(avg("pq_N@5") - avg("fp32_N@5"), 5),
        "opq_N@5_delta": round(avg("opq_N@5") - avg("fp32_N@5"), 5),
        "fp32_R@1": round(avg("fp32_R@1"), 5),
        "bf16_R@1_delta": round(avg("bf16_R@1") - avg("fp32_R@1"), 5),
        "int8_R@1_delta": round(avg("int8_R@1") - avg("fp32_R@1"), 5),
        "int4_R@1_delta": round(avg("int4_R@1") - avg("fp32_R@1"), 5),
        "pq_R@1_delta": round(avg("pq_R@1") - avg("fp32_R@1"), 5),
        "opq_R@1_delta": round(avg("opq_R@1") - avg("fp32_R@1"), 5),
        "impl": a.impl,
        "pq_m": a.pq_m,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
