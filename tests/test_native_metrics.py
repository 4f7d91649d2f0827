"""Native (C++) metrics engine parity vs the dict-based Python reference."""

import numpy as np
import pytest

from evdr_tpu.eval.metrics import compute_retrieval_metrics
from evdr_tpu.native.fast_metrics import (
    _numpy_engine,
    build_fast_qrels,
    compute_metrics_from_scores,
    native_available,
    tie_rank_from_docids,
)


def _random_case(seed, nq=13, nd=37, n_rel_max=3, with_ties=False):
    rng = np.random.default_rng(seed)
    scores = rng.normal(size=(nq, nd)).astype(np.float32)
    if with_ties:
        scores = np.round(scores * 2) / 2  # force plenty of exact ties
    docids = [f"doc_{rng.integers(0, 10**6):06d}_{j}" for j in range(nd)]
    qkeys = [f"query {i}" for i in range(nq)]
    qrels = {}
    for i, qk in enumerate(qkeys):
        n_rel = int(rng.integers(1, n_rel_max + 1))
        picks = rng.choice(nd, size=n_rel, replace=False)
        qrels[qk] = {docids[j]: int(rng.integers(1, 3)) for j in picks}
    results = {
        qk: {docids[j]: float(scores[i, j]) for j in range(nd)}
        for i, qk in enumerate(qkeys)
    }
    return scores, docids, qkeys, qrels, results


def _fast(scores, docids, qkeys, qrels, ks):
    fq = build_fast_qrels(qrels, qkeys, {d: j for j, d in enumerate(docids)})
    return compute_metrics_from_scores(scores, fq, tie_rank_from_docids(docids), ks)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("with_ties", [False, True])
def test_fast_metrics_match_dict_path(seed, with_ties):
    scores, docids, qkeys, qrels, results = _random_case(seed, with_ties=with_ties)
    ks = [1, 3, 5, 10, 50]
    want = compute_retrieval_metrics(qrels, results, ks)
    got = _fast(scores, docids, qkeys, qrels, ks)
    for group in want:
        for key in want[group]:
            assert got[group][key] == pytest.approx(want[group][key], abs=2e-5), (
                group, key)


def test_judged_query_without_scores_counts_zero():
    # qrels has an extra query with no score row: dict path counts it as zeros
    scores, docids, qkeys, qrels, results = _random_case(3, nq=6)
    qrels["phantom query"] = {docids[0]: 1}
    ks = [1, 5]
    want = compute_retrieval_metrics(qrels, results, ks)
    got = _fast(scores, docids, qkeys, qrels, ks)
    assert got["Recall"]["Recall@5"] == pytest.approx(want["Recall"]["Recall@5"],
                                                      abs=2e-5)


def test_duplicate_query_keys_last_row_wins():
    # two rows share the same query key: dict path keeps the LAST row's scores
    scores = np.array([[0.9, 0.1], [0.1, 0.9]], dtype=np.float32)
    docids = ["a", "b"]
    qkeys = ["same", "same"]
    qrels = {"same": {"b": 1}}
    results = {}
    for i, qk in enumerate(qkeys):
        results[qk] = {d: float(scores[i, j]) for j, d in enumerate(docids)}
    want = compute_retrieval_metrics(qrels, results, [1])
    got = _fast(scores, docids, qkeys, qrels, [1])
    assert want["Recall"]["Recall@1"] == got["Recall"]["Recall@1"] == 1.0


def test_numpy_engine_matches_native():
    if not native_available():
        pytest.skip("no native toolchain")
    scores, docids, qkeys, qrels, _ = _random_case(7, nq=9, nd=23)
    ks_list = [1, 5, 10]
    ks = np.asarray(ks_list, dtype=np.int32)
    fq = build_fast_qrels(qrels, qkeys, {d: j for j, d in enumerate(docids)})
    tr = tie_rank_from_docids(docids)
    np_out = _numpy_engine(scores, tr, *fq, ks)
    got = compute_metrics_from_scores(scores, fq, tr, ks_list)
    for i, k in enumerate(ks_list):
        # `got` is rounded to 5 decimals; allow that quantum
        assert got["NDCG"][f"NDCG@{k}"] == pytest.approx(
            np_out[0, i] / len(qrels), abs=1e-5)


def test_native_builds():
    assert native_available(), "g++ toolchain present in image; native must build"


def test_unjudged_docid_keeps_denominator():
    # a judgment pointing at a doc missing from the index still counts in R
    scores = np.array([[0.9, 0.1]], dtype=np.float32)
    docids = ["a", "b"]
    qrels = {"q": {"a": 1, "missing_doc": 1}}
    got = _fast(scores, docids, ["q"], qrels, [1])
    assert got["Recall"]["Recall@1"] == 0.5


def test_eval_retrieval_fast_equals_dict(tmp_path):
    import jax.numpy as jnp

    from evdr_tpu.data.packing import l2_normalize, preprocess_docs, preprocess_queries
    from evdr_tpu.data.synthetic import make_synthetic_corpus
    from evdr_tpu.eval.evaluator import CustomRetrievalEvaluator, eval_retrieval

    c = make_synthetic_corpus(n_docs=15, n_queries=9, dim=16, seed=11)
    P, pmask, _ = preprocess_docs(c["documents"], c["doc_attnmask"], c["doc_imgmask"])
    Q, qmask = preprocess_queries(c["query"], c["query_attnmask"])
    ev = CustomRetrievalEvaluator()
    kwargs = dict(
        evaluator=ev, Q_test_norm=jnp.asarray(Q), qmask_test=jnp.asarray(qmask),
        student_param=jnp.asarray(P), pmask_student=jnp.asarray(pmask),
        relevant_docs_test=c["relevant_docs"],
        docidx_2_docid_test=c["docidx_2_docid"],
        qsidx_2_query_test=c["qsidx_2_query"], impl="xla",
    )
    m_fast = eval_retrieval(fast=True, **kwargs)
    m_dict = eval_retrieval(fast=False, **kwargs)
    for group in ("NDCG", "Recall", "mAP", "Precision", "mRR"):
        assert m_fast[group] == m_dict[group]


def test_fast_cache_no_stale_id_reuse():
    """Freed-and-reallocated qrels dicts must never hit a stale cache entry.

    The cache pins strong references to its keyed objects, so CPython cannot
    hand a cached id to a new object. Churn through many short-lived qrels
    dicts (the allocator aggressively reuses dict ids) and check each one
    evaluates with ITS OWN judgments.
    """
    from evdr_tpu.eval import evaluator as ev_mod
    from evdr_tpu.native.fast_metrics import compute_metrics_from_scores

    nd = 4
    docidx_2_docid = {str(j): f"d{j}" for j in range(nd)}
    scores = np.eye(1, nd, dtype=np.float32)  # query 0 ranks d0 first
    for trial in range(50):
        rel_doc = f"d{trial % nd}"
        qrels = {"q0": {rel_doc: 1}}
        qs = np.array(["q0"], dtype=object)
        fq, tie = ev_mod._fast_eval_inputs(qrels, docidx_2_docid, qs, 1, nd)
        got = compute_metrics_from_scores(scores, fq, tie, [1])
        want = 1.0 if rel_doc == "d0" else 0.0
        assert got["Recall"]["Recall@1"] == want, (trial, got)
        del qrels, qs
    # pinned objects: every cached id must still be alive inside the cache
    for (rid, did, qid, *_), (_, pinned) in ev_mod._FAST_CACHE.items():
        assert id(pinned[0]) == rid and id(pinned[1]) == did
    assert len(ev_mod._FAST_CACHE) <= ev_mod._FAST_CACHE_MAX
