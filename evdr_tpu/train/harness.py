"""Unified training harness: index-compression distillation on TPU.

Replaces the reference's 24 ``main*.py`` scripts (families A-D, SURVEY.md §2.2)
with one loop driven by ``TrainConfig``. Semantics parity with the shared
skeleton (``mainv2_iter_liscore.py:56-311``, ``mainv1.py:160-260``):

  per dataset: load queries + teacher -> per mf: init student (align by docid,
  mask, param) -> step-0 eval -> train loop { student renorm -> MaxSim scores ->
  distillation loss -> AdamW } -> periodic eval + best tracking + best-npz save
  -> final ``summary/best_ndcg5`` JSON line (reporter-compatible).

TPU-first design choices (not in the reference):
- the whole dataset lives on device; batches are device-side gathers driven by
  a host index stream (no DataLoader, no per-step host->device tensor copies);
- teacher scores over the frozen teacher index are precomputed ONCE per
  dataset (the reference recomputes the expensive teacher MaxSim every step —
  teacher Lp is ~10-50x student Lp, so this removes most of the train-step
  FLOPs with bitwise-identical loss inputs);
- the train step is a single donated-buffer jit; optimizer is optax.adamw
  (same update rule as torch AdamW);
- full checkpoint/resume of (param, opt state, step, best trackers) — the
  reference can only export best-npz artifacts.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from evdr_tpu.data.align import align_by_docid
from evdr_tpu.data.npz_io import (
    load_init_payload,
    load_payload,
    load_query_payload,
    save_compressed_npz,
    tokens_to_object,
)
from evdr_tpu.data.packing import (
    _as_object_array,
    l2_normalize,
    preprocess_docs,
    preprocess_queries,
)
from evdr_tpu.data.registry import DATASETMAP
from evdr_tpu.eval.evaluator import CustomRetrievalEvaluator, eval_retrieval
from evdr_tpu.losses.distill import (
    COMBINED_RECIPES,
    LOSS_REGISTRY,
    _component_kwargs,
    combined_loss,
)
from evdr_tpu.ops.maxsim import maxsim, maxsim_xla
from evdr_tpu.train.config import TrainConfig
from evdr_tpu.utils.logging_utils import get_logger, log_json
from evdr_tpu.utils.prng import PRNGSequence, set_seed

# loss components whose eval computation materializes (Q, N, N) pairwise
# tensors — these get the reference's >600-query chunking
# (mainv2_ranknet.py:149-161). Combined recipes are checked by MEMBERSHIP so
# a new recipe containing a pairwise term can never silently lose the
# chunking guard (a hand-listed set once missed lipairscore_std).
_PAIRWISE_COMPONENTS = frozenset({"ranknet", "lambda", "ranknce"})

# losses with batch-SUM semantics: lambda_loss divides by the PAIR count
# only (criterion.py:148-189), so its value scales linearly with the number
# of queries and chunks combine by SUM — a chunk-size-weighted mean would
# understate it by ~n_chunks (measured 2.6x at 700 queries). Every other
# registry loss and recipe component is a per-query/per-element mean, for
# which the weighted mean is exact. 'lambda' appears in no combined recipe,
# so a chunk never mixes the two semantics.
_BATCH_SUM_LOSSES = frozenset({"lambda"})


def _needs_query_chunking(loss: str) -> bool:
    if loss in _PAIRWISE_COMPONENTS:
        return True
    return any(comp in _PAIRWISE_COMPONENTS
               for comp, _ in COMBINED_RECIPES.get(loss, ()))


def _query_chunked_loss(nq: int, loss: str, run) -> Tuple[float, Dict[str, float]]:
    """Eval-loss over test queries, chunked by 300 when the loss materializes
    (Q, N, N) pairwise tensors and the test set is large (the reference's
    tatdqa OOM guard, mainv2_ranknet.py:149-161). ``run(st, ed)`` returns
    (total, parts) for queries [st:ed); the chunk combination (chunk-size-
    weighted mean, or plain sum for batch-sum losses) equals the unchunked
    value. Shared by the host and mesh eval paths."""
    if not (nq > 600 and _needs_query_chunking(loss)):
        total, parts = run(0, nq)
        return float(total), {k: float(v) for k, v in parts.items()}
    batch_sum = loss in _BATCH_SUM_LOSSES
    total_acc, denom = 0.0, 0
    parts_acc: Dict[str, float] = {}
    for st in range(0, nq, 300):
        ed = min(st + 300, nq)
        t_c, parts_c = run(st, ed)
        w = 1 if batch_sum else ed - st
        total_acc += float(t_c) * w
        for k2, v in parts_c.items():
            parts_acc[k2] = parts_acc.get(k2, 0.0) + float(v) * w
        denom += w if not batch_sum else 0
    denom = max(denom, 1)
    if batch_sum:
        return total_acc, parts_acc
    return (total_acc / denom,
            {k2: v / denom for k2, v in parts_acc.items()})


# =============================================================================
# data bundles
# =============================================================================

@dataclass
class DatasetBundle:
    dataset: str
    Q_train: jnp.ndarray          # (Mq, Lq, D) normalized
    qmask_train: jnp.ndarray      # (Mq, Lq) bool
    pos_idx: Optional[np.ndarray]  # (Mq,) int gt-doc indices (supervised InfoNCE)
    Q_test: jnp.ndarray
    qmask_test: jnp.ndarray
    P_teacher_norm: jnp.ndarray   # (N, Lp, D) masked + normalized
    pmask_teacher: jnp.ndarray    # (N, Lp) bool
    docid_teacher: np.ndarray
    relevant_docs_test: Dict[str, Dict[str, int]]
    docidx_2_docid_test: Dict[str, str]
    qsidx_2_query_test: Optional[np.ndarray]
    sc_t_train: Optional[jnp.ndarray] = None  # (Mq, N) precomputed teacher scores
    sc_t_test: Optional[jnp.ndarray] = None   # (Qtest, N)

    @property
    def n_docs(self) -> int:
        return int(self.P_teacher_norm.shape[0])


def _derive_pos_idx(qid, relevant_docs, docidx_2_docid) -> Tuple[np.ndarray, np.ndarray]:
    """qid -> index of the rel-max gt doc; mask of resolvable queries.

    Parity with QueryTensorDataset_gtdocs (Qdatasets/query_tensor_dataset.py:19-67).
    """
    docid2idx = {str(docid): int(di) for di, docid in docidx_2_docid.items()}
    pos = np.full(len(qid), -1, dtype=np.int64)
    for i, q in enumerate(qid):
        gt = (relevant_docs or {}).get(str(q))
        if not gt:
            continue
        gt_docid = max(gt.items(), key=lambda kv: kv[1])[0]
        pos[i] = docid2idx.get(str(gt_docid), -1)
    return pos, pos >= 0


def _precompute_teacher_scores(Q, qmask, P, pmask, chunk_q: int, chunk_p: int,
                               impl: str) -> jnp.ndarray:
    """Score every query against the frozen teacher index, chunking queries."""
    outs = []
    mq = Q.shape[0]
    for qs in range(0, mq, chunk_q):
        sc = maxsim(Q[qs:qs + chunk_q], P, qmask[qs:qs + chunk_q], pmask,
                    chunk_p=chunk_p, impl=impl, compute_dtype=jnp.float32)
        outs.append(sc)
    return jnp.concatenate(outs, axis=0)


def _load_any(path):
    """Load an interchange (pickled-object) OR packed (dense) feature npz."""
    from evdr_tpu.tools.convert_packed import is_packed, load_packed_payload

    if is_packed(path):
        return load_packed_payload(path)
    return load_payload(path)


def _queries_from(payload):
    if "Q_norm" in payload:  # packed: already normalized + masked
        return np.asarray(payload["Q_norm"]), np.asarray(payload["qmask"])
    return preprocess_queries(payload["query"], payload.get("query_attnmask"))


def _docs_from(payload):
    if "P_pad" in payload:  # packed: raw padded + composed mask
        return np.asarray(payload["P_pad"]), np.asarray(payload["pmask"])
    P_raw, pmask, _ = preprocess_docs(
        payload["documents"], payload.get("doc_attnmask"),
        payload.get("doc_imgmask"))
    return P_raw, pmask


def load_dataset_bundle(cfg: TrainConfig, dataset: str,
                        need_pos_idx: bool = False) -> DatasetBundle:
    """Load + pack one dataset (ProxyQ mode or labeled-split mode).

    Feature files may be the reference's pickled-object interchange npz or the
    TPU-friendly packed format (tools/convert_packed.py) — detected per file.
    """
    paths = DATASETMAP[dataset]

    if cfg.use_labeled_split:
        # mainv1 family: teacher + train queries from the train npz, test
        # queries + eval maps from the test npz (mainv1.py:172-196)
        train_payload = _load_any(f"{cfg.teacher_root}/{paths['train']}")
        test_payload = _load_any(f"{cfg.teacher_root}/{paths['test']}")
        q_src = train_payload
        teacher_payload = train_payload
        eval_payload = test_payload
        qid = train_payload.get("qid")
    else:
        # mainv2/v3 families: ProxyQ pseudo-queries + full-dump teacher
        q_payload = _load_any(f"{cfg.query_root}/{paths['pseudoQ']}")
        teacher_payload = _load_any(f"{cfg.teacher_root}/{paths['split_before']}")
        q_src = q_payload
        eval_payload = teacher_payload
        qid = q_payload.get("qid")

    Q_train, qmask_train = _queries_from(q_src)
    Q_test, qmask_test = _queries_from(eval_payload)
    P_raw, pmask_teacher = _docs_from(teacher_payload)
    P_teacher_norm = np.asarray(
        l2_normalize(P_raw * pmask_teacher[..., None].astype(np.float32)),
        dtype=np.float32,
    )

    pos_idx = None
    if need_pos_idx:
        rel = q_src.get("relevant_docs") or teacher_payload.get("relevant_docs")
        d2d = teacher_payload.get("docidx_2_docid") or {}
        if qid is None or rel is None:
            raise ValueError(f"{dataset}: supervised loss needs qid + relevant_docs")
        pos, ok = _derive_pos_idx(qid, rel, d2d)
        if not ok.all():
            print(f"[dataset] missing gt mapping {int((~ok).sum())}/{len(ok)} -> filtered")
        Q_train, qmask_train, pos_idx = Q_train[ok], qmask_train[ok], pos[ok]
        if Q_train.shape[0] == 0:
            # the reference crashes in DataLoader (num_samples=0) here; fail
            # with a diagnosis instead of training silently on nothing
            raise ValueError(
                f"{dataset}: no training query has a resolvable gt doc — "
                "relevant_docs must be keyed by str(qid) "
                "(Qdatasets/query_tensor_dataset.py:48 convention)")

    return DatasetBundle(
        dataset=dataset,
        Q_train=jnp.asarray(Q_train),
        qmask_train=jnp.asarray(qmask_train),
        pos_idx=pos_idx,
        Q_test=jnp.asarray(Q_test),
        qmask_test=jnp.asarray(qmask_test),
        P_teacher_norm=jnp.asarray(P_teacher_norm),
        pmask_teacher=jnp.asarray(pmask_teacher),
        docid_teacher=teacher_payload["docid"],
        # .get(): packed payloads may omit the qrels keys (convert_packed.py
        # writes them only when present); the interchange loader returns None
        # for missing keys and DatasetBundle declares them Optional
        relevant_docs_test=eval_payload.get("relevant_docs"),
        docidx_2_docid_test=eval_payload.get("docidx_2_docid"),
        qsidx_2_query_test=eval_payload.get("qsidx_2_query"),
    )


def init_student(cfg: TrainConfig, dataset: str, bundle: DatasetBundle, mf: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, tuple]:
    """Load the pooled init index, align to teacher docid order, pack, mask.

    Returns (param (N, Ls, D) masked, pmask_student (N, Ls) bool,
    (doc_attn_in, doc_img_in) object arrays for export parity).
    """
    paths = DATASETMAP[dataset]
    key = f"mf{mf}"
    if key not in paths:
        raise ValueError(f"Missing mapping for {dataset}:{key}")
    init_payload = load_init_payload(f"{cfg.init_root}/{paths[key]}")

    Pbar_obj = init_payload["documents"]
    doc_attn_in = init_payload["doc_attnmask"]
    doc_img_in = init_payload["doc_imgmask"]
    docid_in = init_payload.get("docid")
    if docid_in is not None:
        (Pbar_obj, doc_attn_in, doc_img_in), ok = align_by_docid(
            _as_object_array(bundle.docid_teacher), _as_object_array(docid_in),
            Pbar_obj, doc_attn_in, doc_img_in,
        )
        if ok:
            print(f"[align] {dataset} mf{mf}: init matched by docid")

    Pbar_raw, pmask_student, _ = preprocess_docs(Pbar_obj, doc_attn_in, doc_img_in)
    if Pbar_raw.shape[0] != bundle.n_docs:
        raise ValueError(
            f"init doc count mismatch: got {Pbar_raw.shape[0]} vs teacher {bundle.n_docs}")

    param = jnp.asarray(Pbar_raw) * jnp.asarray(pmask_student)[..., None]
    return param, jnp.asarray(pmask_student), (doc_attn_in, doc_img_in)


# =============================================================================
# loss dispatch
# =============================================================================

def make_loss_fn(cfg: TrainConfig):
    """Returns loss(sc_s, sc_t, labels) -> (total, parts dict of floats)."""
    hp = cfg.loss_hp()
    name = cfg.loss
    if name in COMBINED_RECIPES:
        def fn(sc_s, sc_t, labels=None):
            return combined_loss(name, sc_s, sc_t, hp)
        return fn
    base, needs_labels = LOSS_REGISTRY[name]
    # ONE source of truth for per-loss hyperparameter names (_HP_KEYS):
    # a hand-coded map here once had to be kept in sync in three places
    kwargs = _component_kwargs(name, name, hp)

    if needs_labels:
        def fn(sc_s, sc_t, labels=None):
            val = base(sc_s, labels, **kwargs)
            return val, {name: val}
    else:
        def fn(sc_s, sc_t, labels=None):
            val = base(sc_s, sc_t, **kwargs)
            return val, {name: val}
    return fn


# =============================================================================
# jitted train step
# =============================================================================

def build_train_step(cfg: TrainConfig, bundle: DatasetBundle,
                     pmask_student: jnp.ndarray, optimizer, qat_books=None):
    """One donated-buffer jitted step: gather batch -> score -> loss -> AdamW.

    Batch selection happens on device via integer index gathers, teacher scores
    are precomputed rows (or computed inline when streaming).

    All dataset-sized arrays are threaded through as explicit jit ARGUMENTS
    (bound with functools.partial-like closure at call sites would inline them
    as program constants — remote-TPU backends ship those with every compile
    request and reject large programs).
    """
    loss_fn = make_loss_fn(cfg)
    needs_labels = cfg.loss == "infonce_sup"
    chunk_p = cfg.chunk_p
    aug = cfg.aug
    n_docs = bundle.n_docs

    # dataset-sized device arrays, passed positionally into the jitted step
    data = dict(
        pmask_s=pmask_student,
        Q_all=bundle.Q_train,
        qm_all=bundle.qmask_train,
        sct_all=bundle.sc_t_train,
        pos_all=(jnp.asarray(bundle.pos_idx, dtype=jnp.int32)
                 if bundle.pos_idx is not None else None),
        P_t=bundle.P_teacher_norm,
        pm_t=bundle.pmask_teacher,
        qat_books=qat_books,
    )

    def step(param, opt_state, idx, rng, d):
        pmask_s = d["pmask_s"]
        pmask_f = pmask_s[..., None].astype(jnp.float32)
        Q_all, qm_all = d["Q_all"], d["qm_all"]
        sct_all, pos_all = d["sct_all"], d["pos_all"]
        P_t, pm_t = d["P_t"], d["pm_t"]

        def score_student(Ps, Qb, qmb):
            return maxsim_xla(Qb, Ps, qmb, pmask_s, chunk_p=chunk_p)

        Qb = jnp.take(Q_all, idx, axis=0)
        qmb = jnp.take(qm_all, idx, axis=0)
        labels = jnp.take(pos_all, idx, axis=0) if needs_labels else None

        if aug == "qnoise":
            # train-only Gaussian noise on valid query tokens, then mask-
            # multiply + re-L2-normalize (mainv3_iter_liscore_noisev1.py:296-299)
            noise = jax.random.normal(rng, Qb.shape, Qb.dtype) * cfg.q_noise_std
            qmf = qmb[..., None].astype(Qb.dtype)
            Qb = Qb + noise * qmf
            Qb = l2_normalize(Qb * qmf)

        if needs_labels:
            sc_t = None
        elif sct_all is not None and aug != "qnoise":
            # precomputed rows are clean-query scores; qnoise must score the
            # teacher with the NOISY queries (noisev1:305), so it always takes
            # the inline branch below
            sc_t = jnp.take(sct_all, idx, axis=0)
        else:
            sc_t = maxsim_xla(Qb, P_t, qmb, pm_t, chunk_p=chunk_p)
        sc_t = jax.lax.stop_gradient(sc_t) if sc_t is not None else None

        def objective(p):
            P_masked = p * pmask_f
            Ps = l2_normalize(P_masked)
            if cfg.qat != "none":
                # quantization-aware distillation: score the exact serving
                # reconstruction (STE gradients) so the student learns to
                # survive its storage dtype (ops/qat.py). Downstream
                # consumers of Ps (hardtoken mining) see the same form.
                from evdr_tpu.ops.qat import qat_apply

                Ps = qat_apply(Ps, cfg.qat, d["qat_books"], pmask=pmask_s)
            sc_s = score_student(Ps, Qb, qmb)
            total, parts = loss_fn(sc_s, sc_t, labels)

            if aug == "mixup" and bundle.n_docs > 1:
                # document mixup (mainv3_iter_liscore_mixup.py:313-331)
                rng_lam, rng_perm = jax.random.split(rng)
                lam = jax.random.beta(rng_lam, cfg.mixup_alpha, cfg.mixup_alpha)
                perm = jax.random.permutation(rng_perm, bundle.n_docs)
                pmask_mix = pmask_s & jnp.take(pmask_s, perm, axis=0)
                P_mix = lam * P_masked + (1.0 - lam) * jnp.take(P_masked, perm, axis=0)
                Ps_mix = l2_normalize(P_mix * pmask_mix[..., None].astype(P_mix.dtype))
                sc_s_mix = maxsim_xla(Qb, Ps_mix, qmb, pmask_mix, chunk_p=chunk_p)
                sc_t_mix = lam * sc_t + (1.0 - lam) * jnp.take(sc_t, perm, axis=1)
                loss_score_mix = jnp.mean(
                    (sc_s_mix - jax.lax.stop_gradient(sc_t_mix)) ** 2)
                loss_mix = cfg.lambda_score * loss_score_mix
                total = total + cfg.lambda_mix * loss_mix
                parts = dict(parts, mix=loss_mix, score_mix=loss_score_mix)

            if aug == "hardtoken":
                total, parts = _hardtoken_aux(
                    cfg, total, parts, p, Ps, sc_s, sc_t, Qb, qmb,
                    P_t, pm_t, pmask_s, chunk_p, rng, loss_fn)

            return total, parts

        (total, parts), grads = jax.value_and_grad(objective, has_aux=True)(param)
        if cfg.debug_invariants:
            # masked-GRADIENT invariant (mainv1.py:74-87): gradients at
            # masked-out token positions must stay exactly 0
            g_abs = jnp.max(jnp.abs(grads), axis=-1)  # (N, L)
            inval = (~pmask_s).astype(g_abs.dtype)
            parts = dict(
                parts,
                _grad_valid_absmax=jnp.max(g_abs * pmask_s.astype(g_abs.dtype)),
                _grad_invalid_absmax=jnp.max(g_abs * inval),
            )
        updates, opt_state = optimizer.update(grads, opt_state, param)
        param = optax.apply_updates(param, updates)
        parts = dict(parts, total_loss=total)
        return param, opt_state, parts

    jstep = jax.jit(step, donate_argnums=(0, 1))

    def run_step(param, opt_state, idx, rng):
        return jstep(param, opt_state, idx, rng, data)

    # expose the per-call data dict: every entry is a jit ARGUMENT, so the
    # caller may swap same-shape values between dispatches without a
    # recompile (the QAT-pq codebook refit at eval cadence uses this)
    run_step.data = data
    if cfg.steps_per_dispatch <= 1:
        return run_step

    # K steps per dispatched program: scan the step body so one host->device
    # round trip drives K optimizer updates
    def multi(param, opt_state, idx_block, rng, d):
        keys = jax.random.split(rng, idx_block.shape[0])

        def body(carry, inp):
            p, s = carry
            idx, key = inp
            p, s, parts = step(p, s, idx, key, d)
            return (p, s), parts

        (param, opt_state), parts_seq = jax.lax.scan(
            body, (param, opt_state), (idx_block, keys))
        # DIAGNOSTIC SAMPLING SEMANTICS: per-component loss parts (and the
        # gap-log / invariant diagnostics derived from them) report the LAST
        # step of each K-block, not every step as the reference's per-step
        # logs do; only total_loss_sum aggregates all K. Cadences are
        # K-snapped (see _snap_cadence) so logged steps are exact.
        parts = jax.tree_util.tree_map(lambda x: x[-1], parts_seq)
        parts["total_loss_sum"] = jnp.sum(parts_seq["total_loss"])
        return param, opt_state, parts

    jmulti = jax.jit(multi, donate_argnums=(0, 1))

    def run_multi(param, opt_state, idx_block, rng):
        return jmulti(param, opt_state, idx_block, rng, data)

    run_multi.data = data
    return run_multi


def _hardtoken_aux(cfg, total, parts, param, Ps, sc_s, sc_t, Qb, qmb,
                   P_t, pm_t, pmask_s, chunk_p, rng, loss_fn):
    """Hard-token virtual-query auxiliary loss
    (mainv3_iter_liscore_QA_hardtoken.py:368-440), fully vectorized:

    1. rank-gap G between teacher/student orderings via double argsort;
    2. per query pick `aux_docs` top-gap docs within the teacher top-k;
    3. for each picked doc, the doc token most similar to any valid query
       token (+noise, L2-normalized) becomes a 1-token virtual query;
    4. aux loss = same distillation loss on virtual-query scores.
    """
    b, n = sc_s.shape
    k = min(int(cfg.k), n)
    a = min(int(cfg.aux_docs), k)
    if a <= 0:
        return total, parts

    sc_t_ng = jax.lax.stop_gradient(sc_t)
    sc_s_ng = jax.lax.stop_gradient(sc_s)
    rank_t = jnp.argsort(jnp.argsort(-sc_t_ng, axis=-1), axis=-1)
    rank_s = jnp.argsort(jnp.argsort(-sc_s_ng, axis=-1), axis=-1)
    gap = (rank_t - rank_s).astype(jnp.int32)  # exact integer rank gaps

    # diagnostic: per-doc summed |rank gap|, top docs logged periodically
    # (mainv3_iter_liscore_QA_hardtoken.py gap-log block). Integer gaps tie
    # often and torch.topk's tie order is backend-unspecified; jnp.argsort is
    # STABLE, so sorting the negated integer keys pins the deterministic
    # lowest-index-first order exactly (no fp penalty to be absorbed by
    # rounding at large G)
    G = jnp.sum(jnp.abs(gap), axis=0)                          # (N,) int32
    g_top = min(int(cfg.gap_topk), n)
    gap_top_idx = jnp.argsort(-G)[:g_top]
    gap_top_val = G[gap_top_idx].astype(jnp.float32)
    diag = {"_gap_top_val": gap_top_val, "_gap_top_idx": gap_top_idx}

    _, topk_idx = jax.lax.top_k(sc_t_ng, k)                    # (B, k)
    gap_topk = jnp.abs(jnp.take_along_axis(gap, topk_idx, axis=1))
    aux_pos = jnp.argsort(-gap_topk, axis=1)[:, :a]            # (B, a) stable
    aux_doc_idx = jnp.take_along_axis(topk_idx, aux_pos, axis=1)  # (B, a)

    # hard token per (query, aux doc): argmax over doc tokens of the max
    # similarity to any valid query token
    doc_tok = jnp.take(P_t, aux_doc_idx.reshape(-1), axis=0)   # (B*a, Lp, D)
    doc_msk = jnp.take(pm_t, aux_doc_idx.reshape(-1), axis=0)  # (B*a, Lp)
    q_rep = jnp.repeat(Qb, a, axis=0)                          # (B*a, Lq, D)
    qm_rep = jnp.repeat(qmb, a, axis=0)
    sim = jnp.einsum("bld,bmd->blm", q_rep, doc_tok)           # (B*a, Lq, Lp)
    sim = jnp.where(qm_rep[:, :, None], sim, -jnp.inf)
    max_over_q = jnp.max(sim, axis=1)                          # (B*a, Lp)
    max_over_q = jnp.where(doc_msk, max_over_q, -jnp.inf)
    best_tok = jnp.argmax(max_over_q, axis=1)                  # (B*a,)
    hard = jnp.take_along_axis(doc_tok, best_tok[:, None, None], axis=1)  # (B*a,1,D)

    if cfg.virt_noise_std > 0:
        hard = hard + jax.random.normal(rng, hard.shape, hard.dtype) * cfg.virt_noise_std
    qv = l2_normalize(hard)
    qv = jax.lax.stop_gradient(qv)
    qmask_v = jnp.ones(qv.shape[:2], dtype=bool)

    sc_t_v = jax.lax.stop_gradient(
        maxsim_xla(qv, P_t, qmask_v, pm_t, chunk_p=chunk_p))
    sc_s_v = maxsim_xla(qv, Ps, qmask_v, pmask_s, chunk_p=chunk_p)
    aux_total, aux_parts = loss_fn(sc_s_v, sc_t_v, None)
    total = total + cfg.lambda_aux * aux_total
    parts = dict(parts, aux=aux_total,
                 **{f"aux_{k2}": v for k2, v in aux_parts.items()}, **diag)
    return total, parts


# =============================================================================
# eval primitives
# =============================================================================

def _test_pos_idx(bundle: DatasetBundle) -> Optional[np.ndarray]:
    """gt-doc indices for TEST queries (qrels keyed by query string);
    unresolvable queries get -1 — callers must DROP them from the loss
    (substituting doc 0 computed cross-entropy toward an arbitrary page)."""
    if bundle.relevant_docs_test is None or bundle.qsidx_2_query_test is None:
        return None
    pos, ok = _derive_pos_idx(
        bundle.qsidx_2_query_test, bundle.relevant_docs_test,
        bundle.docidx_2_docid_test or {})
    return pos if ok.all() else np.where(ok, pos, -1)


def evaluation_loss(cfg: TrainConfig, bundle: DatasetBundle, param, pmask_student,
                    qat_books=None) -> Dict[str, float]:
    """Distillation loss on test queries (mainv2_iter_liscore.py:343-370);
    for supervised InfoNCE, the gt-docs eval loss of mainv2_iter_super_infonce.

    Under ``cfg.qat`` the train objective scores the serving reconstruction,
    so this does too — otherwise train and eval loss diverge systematically
    by the quantization error."""
    loss_fn = make_loss_fn(cfg)
    Ps = l2_normalize(param * pmask_student[..., None].astype(jnp.float32))
    if cfg.qat != "none":
        from evdr_tpu.ops.qat import qat_apply

        Ps = qat_apply(Ps, cfg.qat, qat_books, pmask=pmask_student)
    sc_s = maxsim_xla(bundle.Q_test, Ps, bundle.qmask_test, pmask_student,
                      chunk_p=cfg.chunk_p)
    if cfg.loss == "infonce_sup":
        pos = _test_pos_idx(bundle)
        if pos is None:
            return {"total_loss": 0.0}
        sel = np.flatnonzero(pos >= 0)  # drop queries with no resolvable gt
        if sel.size == 0:
            return {"total_loss": 0.0}
        if sel.size < len(pos):
            sc_s = jnp.take(sc_s, jnp.asarray(sel), axis=0)
            pos = pos[sel]
        total, parts = loss_fn(sc_s, None, jnp.asarray(pos, dtype=jnp.int32))
    else:
        if bundle.sc_t_test is not None:
            sc_t = bundle.sc_t_test
        else:
            sc_t = maxsim_xla(bundle.Q_test, bundle.P_teacher_norm,
                              bundle.qmask_test, bundle.pmask_teacher,
                              chunk_p=cfg.chunk_p)
        total, parts = _query_chunked_loss(
            int(sc_s.shape[0]), cfg.loss,
            lambda st, ed: loss_fn(sc_s[st:ed], sc_t[st:ed], None))
    out = {"total_loss": float(total)}
    out.update({f"loss_{k}": float(v) for k, v in parts.items()})
    return out


def _fit_qat_books(cfg: TrainConfig, Ps_np: np.ndarray, pm_np: np.ndarray):
    """Codebooks for the PQ-family QAT tiers, in their SERVING form: compact
    (M, K, D/M) for qat='pq', expanded rotated (M, K, D) for qat='opq' (the
    shipped PQ — ops/pq.expand_books). Both qat_apply's STE assignment and
    the exported qat_books then match the serving encoder exactly."""
    from evdr_tpu.ops.pq import expand_books, train_opq, train_pq

    if cfg.qat == "opq":
        obooks, rot = train_opq(Ps_np, pm_np, m=cfg.qat_pq_m, seed=cfg.seed)
        return jnp.asarray(expand_books(obooks, rot))
    return jnp.asarray(train_pq(Ps_np, pm_np, m=cfg.qat_pq_m, seed=cfg.seed))


def update_best(best: Optional[Dict[str, Any]], metrics: Dict[str, Any],
                step: int, kind: str) -> Tuple[Dict[str, Any], bool]:
    """Best tracking with tie-breaks (mainv2_iter_liscore.py:407-426)."""
    cur_r1 = float(metrics["Recall"]["Recall@1"])
    cur_nd5 = float(metrics["NDCG"]["NDCG@5"])
    if best is None:
        return {"step": step, "Recall@1": cur_r1, "NDCG@5": cur_nd5}, True
    if kind == "r1":
        updated = (cur_r1 > best["Recall@1"]) or (
            cur_r1 == best["Recall@1"] and cur_nd5 > best["NDCG@5"])
    else:
        updated = (cur_nd5 > best["NDCG@5"]) or (
            cur_nd5 == best["NDCG@5"] and cur_r1 > best["Recall@1"])
    if not updated:
        return best, False
    return {"step": step, "Recall@1": cur_r1, "NDCG@5": cur_nd5}, True


def save_best_npz(out_dir: Path, fname: str, *, cfg: TrainConfig, dataset: str,
                  mf: int, step: int, best: Dict, metrics: Dict,
                  param, pmask_student, docid, doc_attn_in, doc_img_in,
                  qat_books=None) -> None:
    """Export the student as a compressed index npz.

    Convention parity: iter-family scripts save the UNNORMALIZED masked param
    (mainv2_iter_liscore.py:428-463); epoch-family scripts save the NORMALIZED
    student (mainv2_distill_infonce.py:364,439). Selected by cfg.trainer.
    """
    P_masked = param * pmask_student[..., None].astype(jnp.float32)
    if cfg.trainer == "epoch":
        P_masked = l2_normalize(P_masked)
    P_np = np.asarray(P_masked, dtype=np.float32)
    pm_np = np.asarray(pmask_student, dtype=bool)
    docs_obj = tokens_to_object(P_np, pm_np)
    save_compressed_npz(
        Path(out_dir) / fname,
        docid=_as_object_array(docid),
        documents_obj=docs_obj,
        doc_attnmask_obj=doc_attn_in,
        doc_imgmask_obj=doc_img_in,
        meta={
            "dataset": dataset,
            "mf": mf,
            "step": int(step),
            "best_type": "Recall@1" if fname == "best_recall.npz" else "NDCG@5",
            "best": best,
            "eval": {
                "Recall@1": float(metrics["Recall"]["Recall@1"]),
                "NDCG@5": float(metrics["NDCG"]["NDCG@5"]),
            },
            "latency": float(metrics.get("latency", 0.0)),
            "loss": cfg.loss,
            "aug": cfg.aug,
            "k": cfg.k,
            "temp": cfg.temp,
            "lambda list": cfg.lambda_list,
            "lambda score": cfg.lambda_score,
            "lr": cfg.lr,
        },
        # QAT-pq: the codebooks this checkpoint was trained (and its best
        # metrics measured) against — serve with THESE, not a refit
        extra=({"qat_books": np.asarray(qat_books, np.float32)}
               if qat_books is not None else None),
    )


# =============================================================================
# checkpoint / resume (full train state — beyond the reference's artifacts)
# =============================================================================

def save_checkpoint(path: Path, param, opt_state, step: int, best_r1, best_nd5,
                    backend: str = "npz") -> None:
    if backend == "orbax":
        import orbax.checkpoint as ocp

        path = Path(path).resolve()
        path.parent.mkdir(parents=True, exist_ok=True)
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, {"param": param, "opt_state": opt_state},
                       force=True)
        # best trackers are small nested dicts of floats — a JSON sidecar
        # avoids pinning their exact pytree structure in the orbax metadata.
        # tmp + atomic rename: a crash between the orbax save and the meta
        # write must not pair new weights with stale (or missing) meta
        meta_path = Path(str(path) + ".meta.json")
        tmp = meta_path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(
            {"step": step, "best_r1": best_r1, "best_nd5": best_nd5}))
        os.replace(tmp, meta_path)
        return
    leaves, treedef = jax.tree_util.tree_flatten((param, opt_state))
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = {"step": step, "best_r1": best_r1, "best_nd5": best_nd5,
            "n_leaves": len(leaves)}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # crash-atomic: a kill mid-savez must never leave a corrupt ckpt.npz that
    # --resume then fails on; write a sibling tmp and rename into place
    tmp = path.with_name(path.name + ".tmp.npz")
    try:
        np.savez(tmp, meta=np.array(meta, dtype=object), **arrays)
        os.replace(tmp, path)
    finally:
        if tmp.exists():
            tmp.unlink()


def load_checkpoint(path: Path, param, opt_state, backend: str = "npz"):
    if backend == "orbax":
        import orbax.checkpoint as ocp

        template = {"param": param, "opt_state": opt_state}
        with ocp.PyTreeCheckpointer() as ckptr:
            state = ckptr.restore(Path(path).resolve(), item=template)
        meta = json.loads(Path(str(Path(path).resolve()) + ".meta.json")
                          .read_text())
        return (state["param"], state["opt_state"], int(meta["step"]),
                meta["best_r1"], meta["best_nd5"])
    z = np.load(path, allow_pickle=True)
    meta = z["meta"].item()
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(meta["n_leaves"])]
    treedef = jax.tree_util.tree_structure((param, opt_state))
    param, opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return param, opt_state, meta["step"], meta["best_r1"], meta["best_nd5"]


# =============================================================================
# index stream (replaces DataLoader: cycling shuffled index batches)
# =============================================================================

def index_stream(n: int, batch: int, seed: int) -> Iterator[np.ndarray]:
    """Infinite stream of shuffled index batches of EXACTLY `batch` elements
    (the reference cycles a shuffled DataLoader; fixed batch keeps shapes
    static for jit — leftover tail rolls into the next epoch's permutation)."""
    rng = np.random.default_rng(seed)
    buf = np.empty(0, dtype=np.int64)
    while True:
        while len(buf) < batch:
            buf = np.concatenate([buf, rng.permutation(n)])
        yield buf[:batch].astype(np.int32)
        buf = buf[batch:]


# =============================================================================
# main loops
# =============================================================================

def train_dataset_mf(cfg: TrainConfig, bundle: DatasetBundle, dataset: str,
                     mf: int, batch_stream: Optional[Iterator] = None
                     ) -> Dict[str, Any]:
    """Train one (dataset, mf) cell; returns the final summary dict.

    ``batch_stream`` (testing/parity hook) replaces the shuffled index
    stream with an externally supplied iterator of index batches — e.g. a
    REPLAY of the exact batch sequence a reference torch run consumed
    (scripts/golden_parity.py)."""
    rngs = PRNGSequence(cfg.seed)
    param, pmask_student, (doc_attn_in, doc_img_in) = init_student(
        cfg, dataset, bundle, mf)

    # --- optional doc-sharded multi-device training (--mesh_docs N) ---------
    # student/teacher doc axes shard over the mesh; queries replicate; the
    # global-softmax losses run via XLA collectives (parallel/train_sharded).
    # Scaled version of the single-device step, mainv2_iter_liscore.py:283-311.
    mesh = None
    n_docs = int(param.shape[0])
    # multi-host training: one process per host (parallel/multihost.py wires
    # the runtime; train/cli.py --coordinator). Index/param shards assemble
    # from per-process local rows; artifacts are written by process 0 only,
    # after collective gathers every process participates in.
    multiproc = jax.process_count() > 1
    is_main_proc = (not multiproc) or jax.process_index() == 0
    if cfg.mesh_docs > 1 and multiproc:
        from evdr_tpu.parallel.multihost import (
            build_multihost_index, global_doc_mesh, replicate_global,
            shard_docs_global)

        ndev = len(jax.devices())
        if cfg.mesh_docs != ndev:
            raise ValueError(
                f"multi-host training shards over ALL global devices: pass "
                f"--mesh_docs {ndev} (got {cfg.mesh_docs})")
        if cfg.checkpoint_backend == "orbax":
            raise ValueError("multi-host training supports the npz "
                             "checkpoint backend only")
        mesh = global_doc_mesh()
        teacher_sh = build_multihost_index(
            np.asarray(bundle.P_teacher_norm),
            np.asarray(bundle.pmask_teacher), mesh)
        param = shard_docs_global(np.asarray(param), mesh,
                                  n_pad=teacher_sh.n_pad)
        pmask_student = shard_docs_global(np.asarray(pmask_student), mesh,
                                          n_pad=teacher_sh.n_pad)
        Q_train_r = replicate_global(np.asarray(bundle.Q_train), mesh)
        qm_train_r = replicate_global(np.asarray(bundle.qmask_train), mesh)
    elif cfg.mesh_docs > 1:
        from evdr_tpu.parallel import (build_sharded_index, make_mesh,
                                       replicate, shard_docs)

        mesh = make_mesh(cfg.mesh_docs)
        teacher_sh = build_sharded_index(
            np.asarray(bundle.P_teacher_norm), np.asarray(bundle.pmask_teacher),
            mesh)
        pad = teacher_sh.n_pad - n_docs
        param = shard_docs(jnp.asarray(np.pad(
            np.asarray(param), ((0, pad), (0, 0), (0, 0)))), mesh)
        pmask_student = shard_docs(jnp.asarray(np.pad(
            np.asarray(pmask_student), ((0, pad), (0, 0)))), mesh)
        Q_train_r = replicate(jnp.asarray(bundle.Q_train), mesh)
        qm_train_r = replicate(jnp.asarray(bundle.qmask_train), mesh)

    def _to_replicated(x):
        """Multi-host host gather (collective: every process calls it, only
        process 0 consumes the copy). Chunked reshard with bounded device
        memory — full-array replication would OOM at exactly the
        beyond-one-host index scale the mesh exists for."""
        if multiproc:
            from evdr_tpu.parallel.multihost import gather_to_host

            return gather_to_host(x, mesh)
        return x

    def unpad(x):
        """Valid-doc view for export/eval paths (mesh pads the doc axis)."""
        return x[:n_docs] if mesh is not None else x

    optimizer = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = optimizer.init(param)

    out_dir = Path(cfg.out_root) / cfg.name / f"mf{mf}" / dataset
    if is_main_proc:
        out_dir.mkdir(parents=True, exist_ok=True)
        logger, writer = get_logger(out_dir)

        cfg_path = out_dir / "config.json"
        if not cfg_path.exists():
            cfg_path.write_text(
                json.dumps({"dataset": dataset, "mf": mf,
                            **dataclasses.asdict(cfg)}, ensure_ascii=False,
                           indent=2),
                encoding="utf-8")
    else:
        # follower processes compute everything (SPMD) but write nothing —
        # out_dir may be shared storage owned by process 0
        import logging as _logging

        logger = _logging.getLogger(f"evdr_follower_{os.getpid()}")
        logger.addHandler(_logging.NullHandler())
        logger.propagate = False
        writer = None

    evaluator = CustomRetrievalEvaluator()

    if mesh is not None:
        from evdr_tpu.parallel import replicate as _replicate
        from evdr_tpu.parallel import sharded_maxsim
        from evdr_tpu.parallel.sharded_index import ShardedIndex
        from evdr_tpu.parallel.train_sharded import (
            build_sharded_eval_loss, precompute_teacher_scores_sharded)

        if multiproc:
            from evdr_tpu.parallel.multihost import replicate_global

            Q_test_r = replicate_global(np.asarray(bundle.Q_test), mesh)
            qm_test_r = replicate_global(np.asarray(bundle.qmask_test), mesh)
        else:
            Q_test_r = _replicate(jnp.asarray(bundle.Q_test), mesh)
            qm_test_r = _replicate(jnp.asarray(bundle.qmask_test), mesh)

        # teacher-score precompute PER SHARD: each device computes and keeps
        # its doc columns (no host gather, no replicated full table). Teacher
        # rescoring then disappears from the sharded train step exactly as in
        # the single-device path (VERDICT r2 item 2).
        sct_test_sh = None
        sct_train_sh = None
        if cfg.loss != "infonce_sup":
            # the replicated query arrays double as the precompute inputs
            # (multi-host: they are GLOBAL arrays, which the shard_map
            # program requires; single-host: same values, same devices)
            sct_test_sh = precompute_teacher_scores_sharded(
                Q_test_r, qm_test_r,
                teacher_sh.P, teacher_sh.pmask, mesh, chunk_q=256,
                chunk_p=cfg.chunk_p)
            if cfg.precompute_teacher and cfg.aug != "qnoise":
                sct_train_sh = precompute_teacher_scores_sharded(
                    Q_train_r, qm_train_r,
                    teacher_sh.P, teacher_sh.pmask, mesh, chunk_q=256,
                    chunk_p=cfg.chunk_p)

        mesh_eval_loss_fn = build_sharded_eval_loss(cfg, mesh, n_docs)
        pos_test = (_test_pos_idx(bundle) if cfg.loss == "infonce_sup"
                    else None)
        eval_qsel = None  # supervised eval: drop queries with no gt (-1)
        if pos_test is not None and (pos_test < 0).any():
            keep = np.flatnonzero(pos_test >= 0)
            eval_qsel = jnp.asarray(keep, dtype=jnp.int32)
            pos_test = pos_test[keep] if keep.size else None

        def _mesh_score_fn():
            Ps = l2_normalize(param * pmask_student[..., None].astype(jnp.float32))
            if cfg.qat in ("int8", "int4"):
                # serving-form eval under the mesh too: per-token qdq is
                # doc-independent, so it preserves the doc sharding
                from evdr_tpu.ops.qat import qat_apply

                Ps = qat_apply(Ps, cfg.qat, pmask=pmask_student)
            sidx = ShardedIndex(P=Ps, pmask=pmask_student, n_docs=n_docs,
                                mesh=mesh)
            # multi-host: metric computation is host-side on every process
            # (identical inputs -> identical best-tracking decisions), so the
            # doc-sharded score matrix reshards to replicated first
            return _to_replicated(
                sharded_maxsim(Q_test_r, qm_test_r, sidx, chunk_p=cfg.chunk_p))

        def _mesh_eval_loss() -> Dict[str, float]:
            """Sharded eval loss: collective loss forms over the doc axis —
            zero index-sized device->host transfers (VERDICT r2 item 1)."""
            if cfg.loss == "infonce_sup" and pos_test is None:
                return {"total_loss": 0.0}
            pos_d = (jnp.asarray(pos_test, dtype=jnp.int32)
                     if pos_test is not None else None)
            if eval_qsel is not None:  # supervised subset with resolvable gt
                Q_e = jnp.take(Q_test_r, eval_qsel, axis=0)
                qm_e = jnp.take(qm_test_r, eval_qsel, axis=0)
            else:
                Q_e, qm_e = Q_test_r, qm_test_r
            nq = int(Q_e.shape[0])

            def run(st, ed):
                sct_c = sct_test_sh[st:ed] if sct_test_sh is not None else None
                return mesh_eval_loss_fn(
                    param, pmask_student, teacher_sh.P, teacher_sh.pmask,
                    Q_e[st:ed], qm_e[st:ed], sct_rows=sct_c,
                    pos=(pos_d[st:ed] if pos_d is not None else None))

            total, parts = _query_chunked_loss(nq, cfg.loss, run)
            out = {"total_loss": total}
            out.update({f"loss_{k2}": v for k2, v in parts.items()})
            return out

    def eval_now(step):
        nonlocal qat_books
        if mesh is not None:
            metrics = eval_retrieval(
                evaluator, bundle.Q_test, bundle.qmask_test, None, None,
                bundle.relevant_docs_test, bundle.docidx_2_docid_test,
                bundle.qsidx_2_query_test, score_fn=_mesh_score_fn)
            ev_loss = _mesh_eval_loss()
        elif cfg.qat != "none":
            # QAT: evaluate (and select best checkpoints by) the SERVING
            # reconstruction, not the raw fp32 student — selecting on raw
            # metrics exports a checkpoint never validated under its own
            # storage dtype (the first qat_quality run did exactly that
            # and measured QAT worse than post-hoc).
            from evdr_tpu.ops.qat import qat_apply

            if cfg.qat in ("pq", "opq"):
                # refit the codebooks on the CURRENT student (see the
                # qat_books init comment); swapping the value through
                # train_step.data is recompile-free (same shape jit arg)
                Ps_np = np.asarray(l2_normalize(
                    param * pmask_student[..., None].astype(jnp.float32)))
                qat_books = _fit_qat_books(cfg, Ps_np,
                                           np.asarray(pmask_student))
                try:
                    train_step.data["qat_books"] = qat_books
                except NameError:
                    pass  # step-0 eval runs before the step is built; the
                    # builder receives these freshly-fit books directly
            P_now = l2_normalize(
                param * pmask_student[..., None].astype(jnp.float32))
            Pq = jax.block_until_ready(qat_apply(
                P_now, cfg.qat, qat_books, pmask=pmask_student))

            def _qat_score_fn():
                # reconstruction precomputed above (serving quantizes at
                # build time; eval latency times scoring only)
                return maxsim(bundle.Q_test, Pq, bundle.qmask_test,
                              pmask_student, chunk_p=cfg.chunk_p,
                              impl=cfg.eval_impl,
                              compute_dtype=jnp.float32)

            metrics = eval_retrieval(
                evaluator, bundle.Q_test, bundle.qmask_test, None, None,
                bundle.relevant_docs_test, bundle.docidx_2_docid_test,
                bundle.qsidx_2_query_test, score_fn=_qat_score_fn)
            ev_loss = evaluation_loss(cfg, bundle, param, pmask_student,
                                      qat_books=qat_books)
        else:
            metrics = eval_retrieval(
                evaluator, bundle.Q_test, bundle.qmask_test, param, pmask_student,
                bundle.relevant_docs_test, bundle.docidx_2_docid_test,
                bundle.qsidx_2_query_test, chunk_p=cfg.chunk_p, impl=cfg.eval_impl)
            ev_loss = evaluation_loss(cfg, bundle, param, pmask_student)
        scalars = {
            "dataset": dataset, "mf": mf, "step": int(step),
            "eval/eval loss": ev_loss["total_loss"],
            "eval/Recall@1": float(metrics["Recall"]["Recall@1"]),
            "eval/NDCG@5": float(metrics["NDCG"]["NDCG@5"]),
            "eval/latency": float(metrics["latency"]),
        }
        scalars.update({f"eval/{k}": v for k, v in ev_loss.items() if k != "total_loss"})
        log_json(logger, scalars)
        if writer is not None:
            writer.add_scalar("eval/Recall@1", scalars["eval/Recall@1"], step)
            writer.add_scalar("eval/NDCG@5", scalars["eval/NDCG@5"], step)
            writer.add_scalar("eval/loss", ev_loss["total_loss"], step)
        return metrics

    # QAT-pq codebooks: fit on the init student BEFORE the step-0 eval (the
    # eval scores the serving reconstruction, which needs them), then REFIT
    # at every eval so the STE grid tracks the drifting student — a grid
    # frozen on the init measured WORSE than post-hoc quantization at
    # reference compression (the student drifts far from the init at mf25,
    # and serving refits on the final student; RESULTS.md QAT section). The
    # final books are exported with the best npz so serving uses the exact
    # training grid.
    qat_books = None
    if cfg.qat in ("pq", "opq"):
        Ps0 = np.asarray(l2_normalize(
            jnp.asarray(param) * pmask_student[..., None].astype(jnp.float32)))
        qat_books = _fit_qat_books(cfg, Ps0, np.asarray(pmask_student))

    step0 = 0
    ckpt_path = out_dir / ("ckpt.orbax" if cfg.checkpoint_backend == "orbax"
                           else "ckpt.npz")
    resuming = cfg.resume and ckpt_path.exists()
    if multiproc and cfg.resume:
        # the resume decision must be process-uniform (an SPMD fork would
        # desynchronize the collectives): process 0 decides; checkpoints
        # live on shared storage, so followers read the same file
        from jax.experimental import multihost_utils

        resuming = bool(int(np.asarray(multihost_utils.broadcast_one_to_all(
            np.asarray(int(resuming), dtype=np.int32)))))
    # QAT fine-tune selection window (cfg.qat_select_post): best-checkpoint
    # updates are restricted to steps >= the STE switch, so a "QAT" artifact
    # is never a pre-switch checkpoint on which the mechanism never ran
    # (the final eval always falls inside the window — start_frac < 1)
    select_post = (cfg.qat != "none" and cfg.qat_start_frac > 0
                   and cfg.qat_select_post)
    if not resuming:
        # step-0 eval (regression baseline: init metrics must match the
        # pooled index). Skipped on resume — the checkpoint carries the best
        # trackers, and evaluating the about-to-be-overwritten init index
        # would cost two remote dispatches for discarded numbers.
        metrics0 = eval_now(0)
        log_json(logger, {"dataset": dataset, "mf": mf, "step": 0,
                          "note": "init Pbar before training"})
        if select_post:
            best_r1 = best_nd5 = None   # seeded by the first in-window eval
            log_json(logger, {"note": "qat_select_post: best-checkpoint "
                              "window starts at the STE switch",
                              "qat_start_frac": cfg.qat_start_frac})
        else:
            best_r1, _ = update_best(None, metrics0, 0, "r1")
            best_nd5, _ = update_best(None, metrics0, 0, "nd5")
        last_metrics = metrics0
    if resuming:
        if mesh is not None:
            # re-shard by placing each loaded leaf onto the sharding of its
            # freshly-initialized counterpart — optimizer-agnostic (the old
            # leading-dim==n_pad heuristic silently mis-sharded any state
            # whose shape coincided; VERDICT r2 weak item 5). A checkpoint
            # written by a SINGLE-device run (n_docs rows) is zero-padded up
            # to the mesh's padded doc axis.
            from jax.sharding import NamedSharding, PartitionSpec

            def _fit_leaf(x, like):
                x = np.asarray(x)
                if x.shape != like.shape:
                    if (x.ndim == like.ndim and x.ndim >= 1
                            and x.shape[0] < like.shape[0]
                            and x.shape[1:] == like.shape[1:]):
                        x = np.pad(x, ((0, like.shape[0] - x.shape[0]),)
                                   + ((0, 0),) * (x.ndim - 1))
                    else:
                        raise ValueError(
                            f"checkpoint leaf shape {x.shape} incompatible "
                            f"with mesh state {like.shape}")
                sh = like.sharding
                if getattr(sh, "mesh", None) is not mesh:
                    # leaves optimizer.init left on a single device (e.g.
                    # the adam step counter) replicate over the mesh
                    sh = NamedSharding(mesh, PartitionSpec())
                if multiproc:
                    # device_put cannot target non-addressable devices:
                    # assemble from per-process local rows instead
                    from evdr_tpu.parallel.multihost import (
                        replicate_global, shard_docs_global)

                    spec = getattr(sh, "spec", None)
                    if spec is not None and len(spec) and spec[0] == "docs":
                        return shard_docs_global(x.astype(like.dtype), mesh,
                                                 n_pad=like.shape[0])
                    return replicate_global(x.astype(like.dtype), mesh)
                return jax.device_put(jnp.asarray(x, like.dtype), sh)

            param_l, opt_l, step0, best_r1, best_nd5 = load_checkpoint(
                ckpt_path, param, opt_state, backend=cfg.checkpoint_backend)
            param = _fit_leaf(param_l, param)
            opt_state = jax.tree_util.tree_map(_fit_leaf, opt_l, opt_state)
        else:
            param, opt_state, step0, best_r1, best_nd5 = load_checkpoint(
                ckpt_path, param, opt_state, backend=cfg.checkpoint_backend)
        log_json(logger, {"note": "resumed", "step": step0})
        # one eval of the RESTORED state: seeds last_metrics (periodic
        # exports / summary latency) with numbers that reflect the resumed
        # index, not the discarded init
        last_metrics = eval_now(step0)

    step_phase1 = None  # QAT fine-tune phase-1 (no-STE) step, if any
    if mesh is not None:
        from evdr_tpu.parallel import build_sharded_train_step

        pos_train_r = (jnp.asarray(bundle.pos_idx, dtype=jnp.int32)
                       if bundle.pos_idx is not None else None)
        train_step, _ = build_sharded_train_step(
            cfg, mesh, pmask_student=pmask_student, P_teacher=teacher_sh.P,
            pmask_teacher=teacher_sh.pmask, n_docs=n_docs,
            Q_all=Q_train_r, qm_all=qm_train_r, sct_all=sct_train_sh,
            pos_all=pos_train_r, optimizer=optimizer)
        if cfg.qat != "none" and cfg.qat_start_frac > 0:
            import dataclasses as _dc

            step_phase1, _ = build_sharded_train_step(
                _dc.replace(cfg, qat="none"), mesh,
                pmask_student=pmask_student, P_teacher=teacher_sh.P,
                pmask_teacher=teacher_sh.pmask, n_docs=n_docs,
                Q_all=Q_train_r, qm_all=qm_train_r, sct_all=sct_train_sh,
                pos_all=pos_train_r, optimizer=optimizer)
    else:
        # qat_books (pq) were fit before the step-0 eval; they refresh at
        # every eval via train_step.data (a jit argument — no recompile)
        train_step = build_train_step(cfg, bundle, pmask_student, optimizer,
                                      qat_books=qat_books)
        if cfg.qat != "none" and cfg.qat_start_frac > 0:
            # QAT fine-tune phase 1: the plain (no-STE) step — identical
            # trajectory to a qat='none' run under the same seed
            import dataclasses as _dc

            step_phase1 = build_train_step(
                _dc.replace(cfg, qat="none"), bundle, pmask_student,
                optimizer)

    n_train = int(bundle.Q_train.shape[0])
    if cfg.trainer == "iter":
        max_steps = cfg.max_steps
    else:
        steps_per_epoch = max(1, -(-n_train // cfg.q_batch)) if not cfg.full_batch else 1
        max_steps = cfg.epochs * steps_per_epoch

    if cfg.eval_every > 0:
        eval_every = cfg.eval_every
    elif cfg.trainer == "epoch":
        eval_every = steps_per_epoch  # evaluate every epoch (reference default)
    else:
        eval_every = 200  # iter-family default (mainv2_iter_liscore.py:41)

    batch = n_train if cfg.full_batch else min(cfg.q_batch, n_train)
    stream = (batch_stream if batch_stream is not None
              else index_stream(n_train, batch, cfg.seed))

    t0 = time.time()
    # loss accumulates ON DEVICE; host fetches happen only at logging/eval
    # cadence (each fetch costs a full round trip on remote-TPU backends —
    # a per-step sync would serialize the whole training pipeline)
    loss_cum = jnp.zeros((), jnp.float32)
    loss_cnt = 0
    log_every = max(1, cfg.print_every or 20)
    K = max(1, cfg.steps_per_dispatch)
    # periodic-export modulus: per-iter steps or per-epoch boundaries
    # (steps_per_epoch is CEIL division — a floor here drifted exports off
    # epoch boundaries whenever q_batch did not divide n_train)
    save_every = (cfg.save_period * (
        1 if cfg.trainer == "iter" else steps_per_epoch)
        if cfg.save_period else 0)
    checkpoint_every = cfg.checkpoint_every
    gap_log_every = cfg.gap_log_every
    if K > 1:
        # ALL cadences snap to dispatch boundaries: the loop only visits
        # multiples of K, so an un-snapped modulus would fire at lcm cadence
        # or never (e.g. K=16 with checkpoint_every=250)
        def _snap(x):
            return -(-x // K) * K if x else x

        eval_every = _snap(eval_every)
        log_every = _snap(log_every)
        max_steps = _snap(max_steps)
        save_every = _snap(save_every)
        checkpoint_every = _snap(checkpoint_every)
        gap_log_every = _snap(gap_log_every)
    # QAT fine-tune phase boundary: dispatches whose last step is
    # <= qat_switch run the plain step; the tail runs the STE step. Snapped
    # to dispatch boundaries so no dispatch straddles the switch.
    qat_switch = 0
    if step_phase1 is not None:
        qat_switch = int(cfg.qat_start_frac * max_steps)
        if K > 1:
            qat_switch = -(-qat_switch // K) * K
    if step0:
        if step0 % K:
            # the loop visits step0 + K, step0 + 2K, ...: a misaligned step0
            # would skip every snapped cadence INCLUDING the final eval and
            # max_steps itself — refuse instead of silently under-training
            raise ValueError(
                f"resume step {step0} is not a multiple of "
                f"steps_per_dispatch={K}; resume with a value that divides "
                "the checkpoint step (e.g. the original run's)")
        # fast-forward to the resume point: a resumed run must consume the
        # SAME batch/noise sequence an uninterrupted run would — replaying
        # from draw 0 re-trains on the earliest batches and reuses early
        # noise keys. rng draws are per-DISPATCH, so exact resume parity
        # additionally assumes the original run's steps_per_dispatch;
        # externally-supplied batch_streams are the caller's to position.
        if batch_stream is None:
            for _ in range(step0):
                next(stream)
        rngs.advance(step0 // K)
    for step in range(step0 + K, max_steps + 1, K):
        if K == 1:
            idx = jnp.asarray(next(stream))
        else:
            idx = jnp.asarray(np.stack([next(stream) for _ in range(K)]))
        fn = (step_phase1 if step_phase1 is not None and step <= qat_switch
              else train_step)
        param, opt_state, parts = fn(param, opt_state, idx, rngs.next())
        loss_cum = loss_cum + parts.get("total_loss_sum", parts["total_loss"])
        loss_cnt += K

        if (step % log_every == 0) or (step % eval_every == 0) or (step == max_steps):
            scalar_parts = {k2: v for k2, v in parts.items()
                            if not k2.startswith("_") and k2 != "total_loss_sum"}
            loss_val = float(scalar_parts["total_loss"])
            avg = float(loss_cum) / max(loss_cnt, 1)
            if writer is not None:
                writer.add_scalar("train/loss", loss_val, step)
                for k2, v in scalar_parts.items():
                    if k2 != "total_loss":
                        writer.add_scalar(f"train/loss_{k2}", float(v), step)
            if cfg.print_every:
                log_json(logger, {
                    "dataset": dataset, "mf": mf, "step": step,
                    "train/total loss": loss_val,
                    "train/avg_total_loss": avg,
                    "time_sec": float(time.time() - t0),
                    **{f"train/loss_{k2}": float(v)
                       for k2, v in scalar_parts.items() if k2 != "total_loss"},
                })

        if ("_gap_top_val" in parts and gap_log_every
                and step % gap_log_every == 0):
            # hard-token rank-gap diagnostic (reference gap-log block)
            log_json(logger, {
                "dataset": dataset, "mf": mf, "step": step,
                "gaplog/top_docidx": np.asarray(parts["_gap_top_idx"]).tolist(),
                "gaplog/top_gap": np.asarray(parts["_gap_top_val"]).tolist(),
            })

        if cfg.debug_invariants and step % log_every == 0:
            # masked-token invariants (mainv1.py:74-87): gradients AND
            # parameters at masked-out positions must stay exactly 0
            masked_abs = float(jnp.max(jnp.abs(
                param * (~pmask_student)[..., None].astype(param.dtype))))
            rec = {
                "dataset": dataset, "mf": mf, "step": step,
                "debug/masked_param_absmax": masked_abs,
            }
            if "_grad_invalid_absmax" in parts:
                rec["debug/grad_valid_absmax"] = float(parts["_grad_valid_absmax"])
                rec["debug/grad_invalid_absmax"] = float(parts["_grad_invalid_absmax"])
            log_json(logger, rec)

        if save_every and step % save_every == 0:
            # periodic compressed export (mainv1.py:375-395); the gathers are
            # collectives — every process runs them, process 0 writes
            p_exp = unpad(_to_replicated(param))
            pm_exp = unpad(_to_replicated(pmask_student))
            if is_main_proc:
                save_best_npz(out_dir, f"compressed_ep{step}.npz", cfg=cfg,
                              dataset=dataset, mf=mf, step=step,
                              best={"step": step}, metrics=last_metrics,
                              param=p_exp, pmask_student=pm_exp,
                              docid=bundle.docid_teacher,
                              doc_attn_in=doc_attn_in, doc_img_in=doc_img_in)

        if (step % eval_every == 0) or (step == max_steps):
            metrics = eval_now(step)
            last_metrics = metrics
            # <= : the dispatch AT qat_switch still ran the plain phase-1
            # step (see the fn pick above), so that checkpoint trained zero
            # STE steps and must stay outside the window
            if select_post and step <= qat_switch:
                # pre-switch eval: logged for the trajectory, but outside
                # the best-checkpoint window (see select_post above)
                upd_r1 = upd_nd5 = False
            else:
                best_r1, upd_r1 = update_best(best_r1, metrics, step, "r1")
                best_nd5, upd_nd5 = update_best(best_nd5, metrics, step,
                                                "nd5")
            if upd_r1 or upd_nd5:
                # best-tracking decisions are identical on every process
                # (same score matrices), so the collective gathers below run
                # everywhere; only process 0 writes the artifacts
                p_exp = unpad(_to_replicated(param))
                pm_exp = unpad(_to_replicated(pmask_student))
            if upd_r1:
                logger.info(
                    f"best recall step| {step} | nDCG@5={best_r1['NDCG@5']:.5f} | "
                    f"Recall@1={best_r1['Recall@1']:.5f} | Latency {metrics['latency']:.5f}")
                if is_main_proc:
                    save_best_npz(out_dir, "best_recall.npz", cfg=cfg, dataset=dataset,
                                  mf=mf, step=step, best=best_r1, metrics=metrics,
                                  param=p_exp, pmask_student=pm_exp,
                                  docid=bundle.docid_teacher,
                                  doc_attn_in=doc_attn_in, doc_img_in=doc_img_in,
                                  qat_books=qat_books)
            if upd_nd5:
                logger.info(
                    f"best nDCG@5 step| {step} | nDCG@5={best_nd5['NDCG@5']:.5f} | "
                    f"Recall@1={best_nd5['Recall@1']:.5f} | Latency {metrics['latency']:.5f}")
                if is_main_proc:
                    save_best_npz(out_dir, "best_ndcg5.npz", cfg=cfg, dataset=dataset,
                                  mf=mf, step=step, best=best_nd5, metrics=metrics,
                                  param=p_exp, pmask_student=pm_exp,
                                  docid=bundle.docid_teacher,
                                  doc_attn_in=doc_attn_in, doc_img_in=doc_img_in,
                                  qat_books=qat_books)

        if checkpoint_every and step % checkpoint_every == 0:
            if multiproc:
                p_ck = _to_replicated(param)
                opt_ck = jax.tree_util.tree_map(_to_replicated, opt_state)
            else:
                p_ck, opt_ck = param, opt_state
            if is_main_proc:
                save_checkpoint(ckpt_path, p_ck, opt_ck, step, best_r1,
                                best_nd5, backend=cfg.checkpoint_backend)

    if cfg.export_packed != "none" and is_main_proc:
        # train -> serve in one run: convert the best artifact into the
        # packed serving format (tools/convert_packed.py) so it drops
        # straight into RetrievalEngine.from_npz / evdr-serve with no
        # manual conversion step
        src = Path(out_dir) / "best_ndcg5.npz"
        if src.exists():
            from evdr_tpu.data.npz_io import load_payload as _lp
            from evdr_tpu.tools.convert_packed import (
                convert_payload_to_packed)

            dt = "pq" if cfg.export_packed == "opq" else cfg.export_packed
            packed = convert_payload_to_packed(
                _lp(src), length_multiple=16, dtype=dt, normalize=True,
                pq_opq=(cfg.export_packed == "opq"))
            dst = Path(out_dir) / "best_ndcg5.packed.npz"
            tmpp = str(dst) + ".tmp.npz"
            np.savez(tmpp, **packed)
            os.replace(tmpp, dst)
            logger.info(json.dumps({
                "export_packed": str(dst), "dtype": cfg.export_packed}))
        else:
            logger.warning("export_packed: no best_ndcg5.npz artifact "
                           "(no eval improved on the init?)")

    summary = {
        "summary/latency": float(last_metrics.get("latency", 0.0)),
        "summary/best_recall": best_r1,
        "summary/best_ndcg5": best_nd5,
        "note": "training finished",
    }
    log_json(logger, summary)
    if writer is not None:
        writer.close()
    return summary


def run_training(cfg: TrainConfig) -> Dict[str, Dict[str, Any]]:
    """Outer loop: datasets x mfs (reference main() skeleton)."""
    from evdr_tpu.utils.timing import enable_persistent_cache

    enable_persistent_cache()
    cfg.validate()
    set_seed(cfg.seed)
    results = {}
    for dataset in cfg.datasets:
        bundle = load_dataset_bundle(cfg, dataset,
                                     need_pos_idx=(cfg.loss == "infonce_sup"))
        # qnoise scores the teacher with the noisy queries inline each step
        # (noisev1:305), so clean-query precomputed rows would be dead weight.
        # Under mesh_docs > 1 the precompute happens PER SHARD inside
        # train_dataset_mf (precompute_teacher_scores_sharded) instead of here
        # (a single-device table would defeat the sharding).
        if (cfg.precompute_teacher and cfg.loss != "infonce_sup"
                and cfg.aug != "qnoise" and cfg.mesh_docs <= 1):
            bundle.sc_t_train = _precompute_teacher_scores(
                bundle.Q_train, bundle.qmask_train, bundle.P_teacher_norm,
                bundle.pmask_teacher, chunk_q=256, chunk_p=cfg.chunk_p,
                impl=cfg.score_impl)
        if cfg.mesh_docs <= 1 and cfg.loss != "infonce_sup":
            # the supervised eval loss uses gt labels, never teacher scores —
            # the full teacher test-score table would be computed and dropped
            # (the mesh path already guards this)
            bundle.sc_t_test = _precompute_teacher_scores(
                bundle.Q_test, bundle.qmask_test, bundle.P_teacher_norm,
                bundle.pmask_teacher, chunk_q=256, chunk_p=cfg.chunk_p,
                impl=cfg.score_impl)
        for mf in cfg.mfs:
            results[f"{dataset}/mf{mf}"] = train_dataset_mf(cfg, bundle, dataset, mf)
            print(f"[done] {dataset} mf{mf}")
    return results
