from evdr_tpu.eval.metrics import (
    compute_retrieval_metrics,
    ndcg_at_k,
    recall_at_k,
    precision_at_k,
    average_precision_at_k,
    mrr_at_k,
)
from evdr_tpu.eval.evaluator import CustomRetrievalEvaluator, eval_retrieval
