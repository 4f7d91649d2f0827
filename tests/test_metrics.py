import numpy as np

from evdr_tpu.eval.metrics import (
    compute_retrieval_metrics,
    ndcg_at_k,
    recall_at_k,
    precision_at_k,
    average_precision_at_k,
    mrr_at_k,
)
from evdr_tpu.eval.evaluator import CustomRetrievalEvaluator, scores_to_results


def test_perfect_ranking():
    qrels = {"q1": {"d1": 1}}
    results = {"q1": {"d1": 0.9, "d2": 0.5, "d3": 0.1}}
    m = compute_retrieval_metrics(qrels, results, [1, 3])
    assert m["NDCG"]["NDCG@1"] == 1.0
    assert m["Recall"]["Recall@1"] == 1.0
    assert m["mRR"]["MRR@1"] == 1.0
    assert m["Precision"]["P@3"] == round(1 / 3, 5)
    assert m["mAP"]["MAP@3"] == 1.0


def test_rank2_hand_computed():
    # relevant doc at rank 2: ndcg@3 = (1/log2(3)) / 1, mrr = 1/2, ap = 1/2
    qrels = {"q": {"good": 1}}
    results = {"q": {"bad": 0.9, "good": 0.8, "junk": 0.1}}
    m = compute_retrieval_metrics(qrels, results, [1, 3])
    assert m["NDCG"]["NDCG@1"] == 0.0
    np.testing.assert_allclose(m["NDCG"]["NDCG@3"], 1 / np.log2(3), atol=1e-5)
    assert m["mRR"]["MRR@3"] == 0.5
    assert m["mAP"]["MAP@3"] == 0.5
    assert m["Recall"]["Recall@1"] == 0.0
    assert m["Recall"]["Recall@3"] == 1.0


def test_graded_ndcg_linear_gains():
    # trec_eval ndcg uses linear gains: rel / log2(rank+1)
    qrels = {"q": {"a": 2, "b": 1}}
    results = {"q": {"b": 0.9, "a": 0.8}}  # b first (rel 1), a second (rel 2)
    ranked = ["b", "a"]
    dcg = 1 / np.log2(2) + 2 / np.log2(3)
    idcg = 2 / np.log2(2) + 1 / np.log2(3)
    np.testing.assert_allclose(ndcg_at_k(ranked, qrels["q"], 5), dcg / idcg)


def test_map_divides_by_total_relevant():
    # 2 relevant, only 1 retrieved in top-2 at rank 1: AP@2 = (1/1) / 2
    qrels = {"q": {"a": 1, "b": 1}}
    ranked = ["a", "x"]
    np.testing.assert_allclose(average_precision_at_k(ranked, qrels["q"], 2), 0.5)


def test_tie_break_by_docid_desc():
    # equal scores: trec_eval ranks the lexicographically LATER docid first
    qrels = {"q": {"a": 1}}
    results = {"q": {"a": 0.5, "z": 0.5}}
    m = compute_retrieval_metrics(qrels, results, [1])
    assert m["Recall"]["Recall@1"] == 0.0  # 'z' outranks 'a' on tie


def test_averaging_and_rounding():
    qrels = {"q1": {"d1": 1}, "q2": {"d9": 1}}
    results = {
        "q1": {"d1": 1.0, "d2": 0.1},
        "q2": {"d1": 1.0, "d9": 0.9},
    }
    m = compute_retrieval_metrics(qrels, results, [1])
    assert m["Recall"]["Recall@1"] == 0.5
    assert m["mRR"]["MRR@1"] == 0.5


def test_query_missing_from_results_counts_zero():
    qrels = {"q1": {"d1": 1}, "q2": {"d2": 1}}
    results = {"q1": {"d1": 1.0}}
    m = compute_retrieval_metrics(qrels, results, [1])
    assert m["Recall"]["Recall@1"] == 0.5


def test_scores_to_results_keys():
    scores = np.array([[0.3, 0.7], [0.9, 0.1]])
    qs = np.array(["what is A", "what is B"], dtype=object)
    d2d = {"0": "pageA.jpg", "1": "pageB.jpg"}
    res = scores_to_results(scores, qs, d2d)
    assert res["what is A"]["pageB.jpg"] == 0.7
    assert res["what is B"]["pageA.jpg"] == 0.9


def test_evaluator_k_values_match_reference_defaults():
    ev = CustomRetrievalEvaluator()
    assert ev.k_values == [1, 3, 5, 10, 50, 70, 100]
    m = ev.compute_mteb_metrics({"q": {"d": 1}}, {"q": {"d": 1.0}})
    assert set(m) == {"NDCG", "mAP", "Recall", "Precision", "mRR"}
    assert "NDCG@70" in m["NDCG"]


def test_trace_ctx_writes_profile(tmp_path):
    """--trace hook (SURVEY §5): trace_ctx captures a loadable profile."""
    import jax
    import jax.numpy as jnp

    from evdr_tpu.utils.timing import trace_ctx

    with trace_ctx(str(tmp_path / "tr")):
        jax.block_until_ready(jnp.sum(jnp.arange(1000.0) ** 2))
    files = [p for p in (tmp_path / "tr").rglob("*") if p.is_file()]
    assert files, "profiler trace produced no files"
    # no-op form
    with trace_ctx(None):
        pass


def test_fast_metrics_duplicate_docids_fall_back_to_dict_path():
    """Corpora with duplicate docids (un-deduped dumps) make the column-wise
    fast engine diverge from the dict path (which collapses duplicates);
    eval_retrieval must detect this and produce dict-path numbers."""
    import jax.numpy as jnp

    from evdr_tpu.eval.evaluator import CustomRetrievalEvaluator, eval_retrieval

    rng = np.random.default_rng(0)
    nq, lq, nd, lp, d = 4, 3, 5, 4, 8

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    Q = unit(rng.normal(size=(nq, lq, d))).astype(np.float32)
    qm = np.ones((nq, lq), bool)
    P = unit(rng.normal(size=(nd, lp, d))).astype(np.float32)
    P[3] = P[1]  # duplicate page content
    pm = np.ones((nd, lp), bool)
    docidx_2_docid = {str(j): f"page_{j}" for j in range(nd)}
    docidx_2_docid["3"] = docidx_2_docid["1"]  # duplicate docid
    qrels = {str(i): {f"page_{(i % nd)}": 1} for i in range(nq)}
    qs = np.array([str(i) for i in range(nq)])

    ev = CustomRetrievalEvaluator()
    m_fast = eval_retrieval(ev, jnp.asarray(Q), jnp.asarray(qm),
                            jnp.asarray(P), jnp.asarray(pm), qrels,
                            docidx_2_docid, qs, impl="xla", fast=True)
    m_dict = eval_retrieval(ev, jnp.asarray(Q), jnp.asarray(qm),
                            jnp.asarray(P), jnp.asarray(pm), qrels,
                            docidx_2_docid, qs, impl="xla", fast=False)
    for group in ("NDCG", "Recall", "Precision"):
        for k, v in m_dict[group].items():
            assert abs(m_fast[group][k] - v) < 1e-9, (group, k)
