"""Doc-sharded distillation training + evaluation (first-class mesh path).

Shards the student parameter, the teacher index, and their masks across the
mesh's doc axis; queries replicate. Gradients flow through a shard_map whose
collectives implement the GLOBAL loss semantics without materializing (B, N)
on one device:

- softmax/CE terms (listwise, InfoNCE flavors): global logsumexp via psum;
- teacher top-k: per-shard top-k -> all_gather of (world x k) candidates ->
  merge (exact: the global top-k is inside the union of local top-ks);
- MSE terms: local sums + psum, padded docs excluded;
- label/candidate lookups (supervised InfoNCE positives, hard-token aux
  docs): the owning shard contributes, others zero, psum replicates.

Losses without a hand-written collective form fall back to all-gathering the
(B, N) score rows — tiny relative to the index — and reusing the standard
loss functions; combined recipes take the collective path whenever ALL of
their components have collective forms (liscore, liscore_std, linfo, ...).

Feature parity with the single-device step (train/harness.py:build_train_step,
itself matching mainv2_iter_liscore.py:283-311 and the mainv3 aug scripts):

- per-shard teacher-score precompute: rows of a (Mq, N_pad) doc-sharded score
  table thread into the step instead of rescoring the teacher every step;
- K fused optimizer steps per dispatch (``steps_per_dispatch``) via lax.scan;
- augmentations (mainv3 Family D): qnoise is shard-consistent by construction
  (same PRNG key on replicated queries); mixup permutes SHARD-LOCALLY (the
  reference permutes globally — identical at world=1, per-pair semantics
  identical at world>1, pairs whose partner is an index-padding doc are
  excluded from the mix MSE); hardtoken computes EXACT global candidate ranks
  (count-of-greater via psum) over the global teacher top-k and psum-gathers
  the owning shard's hard token — equal to the reference's double-argsort
  ranks except on exact score ties. The (N,)-sized gap-log diagnostic is
  single-device only (a global rank matrix is O(N^2) under counting).

Everything is differentiable; optimizer updates inherit the parameter
sharding, so the full train step is one pjit program with XLA collectives
over ICI.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evdr_tpu.data.packing import l2_normalize
from evdr_tpu.losses.distill import COMBINED_RECIPES, _component_kwargs
from evdr_tpu.ops.maxsim import maxsim_xla
from evdr_tpu.parallel.mesh import DOC_AXIS
from evdr_tpu.train.config import TrainConfig

NEG = -jnp.inf

# components with a hand-written collective form (cf. losses/distill.py)
_COLLECTIVE_COMPONENTS = ("listwise", "infonce_distill", "score", "score_std",
                          "spl", "infonce_sup")


def has_collective_form(loss_name: str) -> bool:
    """True when the loss avoids the (B, N) gather fallback entirely."""
    if loss_name in _COLLECTIVE_COMPONENTS:
        return True
    recipe = COMBINED_RECIPES.get(loss_name)
    return recipe is not None and all(
        comp in _COLLECTIVE_COMPONENTS for comp, _ in recipe)


def _global_lse(x_loc, axis_name):
    """logsumexp over a sharded last axis: (B, n_loc) -> (B,).

    The max shift is a mathematically gradient-free stabilizer (lse is
    invariant in it), so it is stop_gradient'ed; the global max rides an
    all_gather because pmax has no differentiation rule at all."""
    m_loc = jax.lax.stop_gradient(jnp.max(x_loc, axis=-1, keepdims=True))
    m = jnp.max(jax.lax.all_gather(m_loc, axis_name, axis=1, tiled=True), axis=-1)
    m = jax.lax.stop_gradient(m)
    z = jax.lax.psum(jnp.sum(jnp.exp(x_loc - m[:, None]), axis=-1), axis_name)
    return jnp.log(z) + m


def _global_topk_pairs(t_loc, s_loc, k: int, axis_name):
    """Global teacher top-k with the student's scores at the same docs.

    Returns (t_topk, s_at_topk): both (B, k)."""
    k_l = min(k, t_loc.shape[-1])
    tv, ti = jax.lax.top_k(t_loc, k_l)
    sv = jnp.take_along_axis(s_loc, ti, axis=-1)
    tv_all = jax.lax.all_gather(tv, axis_name, axis=1, tiled=True)
    sv_all = jax.lax.all_gather(sv, axis_name, axis=1, tiled=True)
    tk, pos = jax.lax.top_k(tv_all, min(k, tv_all.shape[-1]))
    sk = jnp.take_along_axis(sv_all, pos, axis=-1)
    return tk, sk


def _listwise_global(s_loc, t_loc, k, temp, axis_name):
    """listwise_distillation_loss over a sharded doc axis (criterion.py:114-142)."""
    lse_t = _global_lse(t_loc / temp, axis_name)
    lse_s = _global_lse(s_loc / temp, axis_name)
    tk, sk = _global_topk_pairs(t_loc, s_loc, k, axis_name)
    prob_t = jnp.exp(tk / temp - lse_t[:, None])
    logp_s = sk / temp - lse_s[:, None]
    loss = -jnp.sum(prob_t * logp_s, axis=-1).mean()
    return loss * (temp ** 2)


def _infonce_distill_global(s_loc, t_loc, temp, axis_name):
    """infonce_distillation_loss over a sharded doc axis (criterion.py:56-68)."""
    _, sk = _global_topk_pairs(t_loc, s_loc, 1, axis_name)  # student at teacher argmax
    lse_s = _global_lse(s_loc / temp, axis_name)
    return jnp.mean(lse_s - sk[:, 0] / temp)


def _infonce_sup_global(s_m, pos, temp, axis_name, shard_size):
    """infonce_supervised_loss with GLOBAL label indices (criterion.py:43-53):
    mean(lse(s/temp) - s[label]/temp); the owning shard contributes the
    label's score, psum replicates it."""
    lse = _global_lse(s_m / temp, axis_name)
    my = jax.lax.axis_index(axis_name)
    pos = pos.astype(jnp.int32)
    owned = (pos // shard_size) == my
    lpos = jnp.clip(pos - my * shard_size, 0, shard_size - 1)
    s_at_loc = jnp.take_along_axis(s_m, lpos[:, None], axis=1)[:, 0]
    s_at = jax.lax.psum(jnp.where(owned, s_at_loc, 0.0), axis_name)
    return jnp.mean(lse - s_at / temp)


def _mse_global(s_loc, t_loc, valid_loc, axis_name, halved=False):
    """(0.5x) mean squared error over valid docs only."""
    d2 = jnp.where(valid_loc[None, :], (s_loc - t_loc) ** 2, 0.0)
    total = jax.lax.psum(jnp.sum(d2), axis_name)
    count = jax.lax.psum(jnp.sum(valid_loc.astype(jnp.float32)), axis_name)
    loss = total / (count * s_loc.shape[0])
    return 0.5 * loss if halved else loss


def _mse_std_global(s_loc, t_loc, valid_loc, axis_name, eps=1e-6):
    """score_preserving_std_loss over a sharded doc axis: per-query global
    mean/std via psum (valid docs only), then MSE of the standardized rows
    (losses/distill.py: score_preserving_std_loss)."""
    v = valid_loc[None, :].astype(jnp.float32)
    count = jax.lax.psum(jnp.sum(v, axis=-1), axis_name)          # (B,)

    def std_rows(x):
        mu = jax.lax.psum(jnp.sum(x * v, axis=-1), axis_name) / count
        var = jax.lax.psum(
            jnp.sum(((x - mu[:, None]) ** 2) * v, axis=-1), axis_name) / count
        # eps inside the sqrt: matches the unsharded loss and keeps the
        # gradient finite at var==0 (fully-masked query rows)
        return (x - mu[:, None]) / jnp.sqrt(var + eps * eps)[:, None]

    d2 = jnp.where(valid_loc[None, :],
                   (std_rows(s_loc) - std_rows(t_loc)) ** 2, 0.0)
    total = jax.lax.psum(jnp.sum(d2), axis_name)
    return total / (count[0] * s_loc.shape[0])


def _collective_component(comp: str, s_loc, t_loc, s_m, t_m, valid_loc, pos,
                          kwargs: dict, shard_size: int):
    """One loss component over the sharded doc axis; collective-form dispatch.

    ``s_loc/t_loc`` are raw local scores (MSE terms use them — padded docs
    masked by ``valid_loc``); ``s_m/t_m`` have padded docs at -inf (softmax
    terms use them)."""
    if comp == "listwise":
        return _listwise_global(s_m, t_m, kwargs.get("k", 10),
                                kwargs.get("temperature", 1.0), DOC_AXIS)
    if comp == "infonce_distill":
        return _infonce_distill_global(s_m, t_m,
                                       kwargs.get("temperature", 0.07), DOC_AXIS)
    if comp == "infonce_sup":
        return _infonce_sup_global(s_m, pos, kwargs.get("temperature", 0.07),
                                   DOC_AXIS, shard_size)
    if comp == "score":
        return _mse_global(s_loc, t_loc, valid_loc, DOC_AXIS)
    if comp == "score_std":
        return _mse_std_global(s_loc, t_loc, valid_loc, DOC_AXIS)
    if comp == "spl":
        return _mse_global(s_loc, t_loc, valid_loc, DOC_AXIS, halved=True)
    raise ValueError(f"no collective form for component {comp!r}")


def _make_loss_core(cfg: TrainConfig, n_docs: int) -> Callable:
    """Builds loss_core(s_loc, t_loc, valid_loc, pos) -> (total, parts),
    runnable INSIDE a shard_map over the doc axis. Chooses collective forms
    when available, else the (B, N)-row gather fallback."""
    from evdr_tpu.train.harness import make_loss_fn  # deferred: cycle-free

    hp = cfg.loss_hp()
    name = cfg.loss
    collective = has_collective_form(name)
    fallback_loss = None if collective else make_loss_fn(cfg)

    if name in COMBINED_RECIPES:
        comps = [(comp, wk, _component_kwargs(name, comp, hp))
                 for comp, wk in COMBINED_RECIPES[name]]
    else:
        comps = [(name, None, _component_kwargs(name, name, hp))]

    def loss_core(s_loc, t_loc, valid_loc, pos):
        shard_size = s_loc.shape[-1]
        s_m = jnp.where(valid_loc[None, :], s_loc, NEG)
        t_m = (jnp.where(valid_loc[None, :], t_loc, NEG)
               if t_loc is not None else None)
        if collective:
            parts: Dict[str, jnp.ndarray] = {}
            total = 0.0
            for comp, weight_key, kwargs in comps:
                kk = dict(kwargs)
                if "k" in kk:
                    kk["k"] = min(int(kk["k"]), n_docs)
                val = _collective_component(comp, s_loc, t_loc, s_m, t_m,
                                            valid_loc, pos, kk, shard_size)
                parts[comp] = val
                w = float(hp.get(weight_key, 1.0)) if weight_key else 1.0
                total = total + w * val
            return total, parts
        # generic fallback: gather this batch's full score rows (tiny
        # relative to the index) and reuse the standard loss functions
        s_full = jax.lax.all_gather(s_loc, DOC_AXIS, axis=1,
                                    tiled=True)[:, :n_docs]
        t_full = (jax.lax.all_gather(t_loc, DOC_AXIS, axis=1,
                                     tiled=True)[:, :n_docs]
                  if t_loc is not None else None)
        return fallback_loss(s_full, t_full, pos)

    return loss_core


# ---------------------------------------------------------------------------
# augmentations inside the shard (mainv3 Family D at mesh scale)
# ---------------------------------------------------------------------------

def _mixup_sharded(cfg, P_masked_loc, pms_loc, valid_loc, Qb, qmb, sc_t_loc,
                   rng, chunk_p):
    """Document mixup (mainv3_iter_liscore_mixup.py:313-331), shard-local
    permutation. Pairs whose partner is an index-padding doc are excluded
    from the mix MSE (the reference has no padding; world=1 is identical)."""
    rng_lam, rng_perm = jax.random.split(rng)
    n_loc = P_masked_loc.shape[0]
    lam = jax.random.beta(rng_lam, cfg.mixup_alpha, cfg.mixup_alpha)
    perm = jax.random.permutation(rng_perm, n_loc)
    pmask_mix = pms_loc & jnp.take(pms_loc, perm, axis=0)
    P_mix = (lam * P_masked_loc
             + (1.0 - lam) * jnp.take(P_masked_loc, perm, axis=0))
    Ps_mix = l2_normalize(P_mix * pmask_mix[..., None].astype(P_mix.dtype))
    sc_s_mix = maxsim_xla(Qb, Ps_mix, qmb, pmask_mix, chunk_p=chunk_p)
    sc_t_mix = lam * sc_t_loc + (1.0 - lam) * jnp.take(sc_t_loc, perm, axis=1)
    valid_mix = valid_loc & jnp.take(valid_loc, perm, axis=0)
    loss_score_mix = _mse_global(sc_s_mix,
                                 jax.lax.stop_gradient(sc_t_mix),
                                 valid_mix, DOC_AXIS)
    return cfg.lambda_score * loss_score_mix, loss_score_mix


def _hardtoken_sharded(cfg, Ps, pms_loc, s_loc, t_loc, valid_loc,
                       Qb, qmb, Pt_loc, pmt_loc, rng, loss_core, chunk_p,
                       n_docs):
    """Hard-token virtual queries over the sharded doc axis
    (mainv3_iter_liscore_QA_hardtoken.py:368-440).

    Global candidate set = global teacher top-k (exact, candidate merge);
    global ranks via count-of-greater + psum (equals the reference's stable
    double-argsort ranks except on exact score ties); the shard owning each
    picked doc computes its hard token, psum replicates it.
    Returns (aux_total, aux_parts) or (None, None) when disabled."""
    b, shard_size = s_loc.shape
    k = min(int(cfg.k), n_docs)
    a = min(int(cfg.aux_docs), k)
    if a <= 0:
        return None, None

    my = jax.lax.axis_index(DOC_AXIS)
    t_ng = jax.lax.stop_gradient(jnp.where(valid_loc[None, :], t_loc, NEG))
    s_ng = jax.lax.stop_gradient(s_loc)

    # global teacher top-k candidates with global indices
    k_l = min(k, shard_size)
    tv, ti = jax.lax.top_k(t_ng, k_l)
    gti = ti + my * shard_size
    tv_all = jax.lax.all_gather(tv, DOC_AXIS, axis=1, tiled=True)
    gti_all = jax.lax.all_gather(gti, DOC_AXIS, axis=1, tiled=True)
    tk, pos = jax.lax.top_k(tv_all, k)
    gidx = jnp.take_along_axis(gti_all, pos, axis=1)          # (B, k) global

    # teacher rank of the r-th global top doc is r; student global rank =
    # count of VALID docs scoring strictly higher (psum over shards)
    owned = (gidx // shard_size) == my
    lidx = jnp.clip(gidx - my * shard_size, 0, shard_size - 1)
    s_at = jax.lax.psum(
        jnp.where(owned, jnp.take_along_axis(s_ng, lidx, axis=1), 0.0),
        DOC_AXIS)                                             # (B, k)
    s_valid = jnp.where(valid_loc[None, :], s_ng, NEG)
    rank_s = jax.lax.psum(
        jnp.sum(s_valid[:, None, :] > s_at[:, :, None], axis=-1), DOC_AXIS)
    rank_t = jnp.arange(k, dtype=jnp.int32)[None, :]
    gap_topk = jnp.abs(rank_t - rank_s.astype(jnp.int32))     # (B, k) int

    aux_pos = jnp.argsort(-gap_topk, axis=1)[:, :a]           # stable
    aux_doc_idx = jnp.take_along_axis(gidx, aux_pos, axis=1)  # (B, a) global

    # hard token per (query, aux doc): owning shard computes, psum replicates
    flat = aux_doc_idx.reshape(-1)                            # (B*a,)
    owned_f = (flat // shard_size) == my
    lflat = jnp.clip(flat - my * shard_size, 0, shard_size - 1)
    doc_tok = jnp.take(Pt_loc, lflat, axis=0)                 # (B*a, Lp, D)
    doc_msk = jnp.take(pmt_loc, lflat, axis=0)
    q_rep = jnp.repeat(Qb, a, axis=0)
    qm_rep = jnp.repeat(qmb, a, axis=0)
    sim = jnp.einsum("bld,bmd->blm", q_rep, doc_tok)
    sim = jnp.where(qm_rep[:, :, None], sim, NEG)
    max_over_q = jnp.max(sim, axis=1)
    max_over_q = jnp.where(doc_msk, max_over_q, NEG)
    best_tok = jnp.argmax(max_over_q, axis=1)
    hard_loc = jnp.take_along_axis(doc_tok, best_tok[:, None, None],
                                   axis=1)[:, 0, :]           # (B*a, D)
    hard = jax.lax.psum(
        jnp.where(owned_f[:, None], hard_loc, 0.0), DOC_AXIS)

    hard = hard[:, None, :]                                   # (B*a, 1, D)
    if cfg.virt_noise_std > 0:
        hard = hard + jax.random.normal(
            rng, hard.shape, hard.dtype) * cfg.virt_noise_std
    qv = jax.lax.stop_gradient(l2_normalize(hard))
    qmask_v = jnp.ones(qv.shape[:2], dtype=bool)

    t_v = jax.lax.stop_gradient(
        maxsim_xla(qv, Pt_loc, qmask_v, pmt_loc, chunk_p=chunk_p))
    s_v = maxsim_xla(qv, Ps, qmask_v, pms_loc, chunk_p=chunk_p)
    aux_total, aux_parts = loss_core(s_v, t_v, valid_loc, None)
    return aux_total, aux_parts


# ---------------------------------------------------------------------------
# the shard-mapped objective shared by train + eval
# ---------------------------------------------------------------------------

def _build_objective(cfg: TrainConfig, mesh: Mesh, n_docs: int, *,
                     with_aug: bool, needs_labels: bool, use_sct: bool):
    """Returns objective(param, Qb, qmb, rng, pms, Pt, pmt, sct_rows, pos_b)
    -> (total, parts) — a shard_map over the doc axis implementing global
    loss semantics. ``sct_rows`` is (B, N_pad) doc-sharded precomputed
    teacher rows (None -> inline teacher rescore)."""
    loss_core = _make_loss_core(cfg, n_docs)
    chunk_p = cfg.chunk_p
    aug = cfg.aug if with_aug else "none"

    sharded = [P(DOC_AXIS), P(DOC_AXIS), P(DOC_AXIS), P(DOC_AXIS)]
    rep = [P(), P(), P()]
    in_specs = sharded + rep + ([P(None, DOC_AXIS)] if use_sct else []) + \
        ([P()] if needs_labels else [])

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=P(), check_vma=False)
    def f(param_loc, pms_loc, Pt_loc, pmt_loc, Q, qm, rng, *rest):
        rest = list(rest)
        sct_loc = rest.pop(0) if use_sct else None
        pos = rest.pop(0) if needs_labels else None

        if aug == "qnoise":
            # train-only Gaussian noise on valid query tokens, mask-multiply
            # + re-L2-normalize (mainv3_iter_liscore_noisev1.py:296-299);
            # same key on every shard -> shard-consistent noisy queries
            noise = jax.random.normal(rng, Q.shape, Q.dtype) * cfg.q_noise_std
            qmf = qm[..., None].astype(Q.dtype)
            Q = l2_normalize((Q + noise * qmf) * qmf)

        pmask_f = pms_loc[..., None].astype(param_loc.dtype)
        P_masked = param_loc * pmask_f
        Ps = l2_normalize(P_masked)
        if cfg.qat in ("int8", "int4"):
            # per-token quantize->dequantize is doc-independent, so the
            # shard-local STE pass equals the global one bit-for-bit
            # (qat='pq' needs replicated codebooks — single-device only,
            # enforced by TrainConfig.validate)
            from evdr_tpu.ops.qat import qat_apply

            Ps = qat_apply(Ps, cfg.qat)
        s_loc = maxsim_xla(Q, Ps, qm, pms_loc, chunk_p=chunk_p)
        if needs_labels:
            t_loc = None
        elif sct_loc is not None and aug != "qnoise":
            # precomputed rows are clean-query scores; qnoise must score the
            # teacher with the NOISY queries (noisev1:305)
            t_loc = jax.lax.stop_gradient(sct_loc)
        else:
            t_loc = jax.lax.stop_gradient(
                maxsim_xla(Q, Pt_loc, qm, pmt_loc, chunk_p=chunk_p))
        # "valid" = REAL doc (global index < n_docs), i.e. not even-sharding
        # padding. A real doc whose teacher tokens are all masked must still
        # participate (score 0) exactly as it does on the single-device path
        # — an any(pmt) proxy would drop it from softmax denominators, MSE
        # counts, and hardtoken rank counting, silently breaking
        # mesh/single-device parity.
        shard_size = pmt_loc.shape[0]
        gpos = (jax.lax.axis_index(DOC_AXIS) * shard_size
                + jnp.arange(shard_size))
        valid_loc = gpos < n_docs

        total, parts = loss_core(s_loc, t_loc, valid_loc, pos)

        if aug == "mixup" and n_docs > 1:
            mix_term, score_mix = _mixup_sharded(
                cfg, P_masked, pms_loc, valid_loc, Q, qm, t_loc, rng, chunk_p)
            total = total + cfg.lambda_mix * mix_term
            parts = dict(parts, mix=mix_term, score_mix=score_mix)

        if aug == "hardtoken":
            aux_total, aux_parts = _hardtoken_sharded(
                cfg, Ps, pms_loc, s_loc, t_loc, valid_loc, Q, qm,
                Pt_loc, pmt_loc, rng, loss_core, chunk_p, n_docs)
            if aux_total is not None:
                total = total + cfg.lambda_aux * aux_total
                parts = dict(parts, aux=aux_total,
                             **{f"aux_{k2}": v for k2, v in aux_parts.items()})

        return total, parts

    def objective(param, Qb, qmb, rng, pms, Pt, pmt, sct_rows=None, pos_b=None):
        args = [param, pms, Pt, pmt, Qb, qmb, rng]
        if use_sct:
            args.append(sct_rows)
        if needs_labels:
            args.append(pos_b)
        return f(*args)

    return objective


# ---------------------------------------------------------------------------
# teacher-score precompute over the sharded index
# ---------------------------------------------------------------------------

def precompute_teacher_scores_sharded(Q, qmask, P_sh, pm_sh, mesh: Mesh,
                                      chunk_q: int = 256, chunk_p: int = 128
                                      ) -> jnp.ndarray:
    """(Mq, N_pad) teacher MaxSim table, doc-sharded over the mesh.

    One jitted GSPMD program (the einsum partitions along the index's doc
    sharding; each device computes and KEEPS its columns — no host gather,
    no full-table device copy). Queries chunk via lax.map to bound the
    working set."""
    mq = int(Q.shape[0])
    chunk_q = max(1, min(chunk_q, mq))
    n_chunks = -(-mq // chunk_q)
    mq_pad = n_chunks * chunk_q
    if mq_pad != mq:
        Q = jnp.pad(Q, ((0, mq_pad - mq), (0, 0), (0, 0)))
        qmask = jnp.pad(qmask, ((0, mq_pad - mq), (0, 0)))

    out_sh = NamedSharding(mesh, P(None, DOC_AXIS))

    @functools.partial(jax.jit, static_argnames=("cq",), out_shardings=out_sh)
    def run(Qp, qmp, Psh, pmsh, cq):
        Q3 = Qp.reshape(n_chunks, cq, *Qp.shape[1:])
        qm3 = qmp.reshape(n_chunks, cq, qmp.shape[1])

        def f(c):
            Qc, qmc = c
            return maxsim_xla(Qc, Psh, qmc, pmsh, chunk_p=chunk_p)

        out = jax.lax.map(f, (Q3, qm3))
        return out.reshape(mq_pad, -1)

    return run(Q, qmask, P_sh, pm_sh, chunk_q)[:mq]


# ---------------------------------------------------------------------------
# train step + eval loss builders
# ---------------------------------------------------------------------------

def build_sharded_train_step(cfg: TrainConfig, mesh: Mesh, *, pmask_student,
                             P_teacher, pmask_teacher, n_docs: int,
                             Q_all, qm_all, sct_all=None, pos_all=None,
                             optimizer: optax.GradientTransformation = None
                             ) -> Tuple[Callable, optax.GradientTransformation]:
    """Returns (step, optimizer).

    ``step(param, opt_state, idx, rng)`` — same call contract as the
    single-device ``build_train_step``: ``idx`` is a (B,) int32 batch of
    query-pool indices ((K, B) when ``cfg.steps_per_dispatch > 1``; the K
    steps fuse into one dispatched lax.scan program). All index-shaped
    inputs must be doc-sharded already and padded to a multiple of the mesh
    size (see build_sharded_index); ``sct_all`` is the (Mq, N_pad)
    doc-sharded teacher-score table from
    ``precompute_teacher_scores_sharded`` (None -> inline rescore each step).
    Pass the SAME ``optimizer`` whose .init produced opt_state (the harness
    does) — a separately-constructed default here could silently diverge
    from the caller's update rule.
    """
    if optimizer is None:
        optimizer = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    needs_labels = cfg.loss == "infonce_sup"
    use_sct = sct_all is not None and cfg.aug != "qnoise" and not needs_labels
    objective = _build_objective(cfg, mesh, n_docs, with_aug=True,
                                 needs_labels=needs_labels, use_sct=use_sct)

    # index-sized arrays are jit ARGUMENTS, not closure constants (closure
    # capture inlines them into the program, which remote-compile rejects
    # for large indexes)
    data = dict(pms=pmask_student, Pt=P_teacher, pmt=pmask_teacher,
                Q_all=Q_all, qm_all=qm_all)
    if use_sct:
        data["sct"] = sct_all
    if needs_labels:
        data["pos"] = pos_all

    def one_step(param, opt_state, idx, rng, d):
        Qb = jnp.take(d["Q_all"], idx, axis=0)
        qmb = jnp.take(d["qm_all"], idx, axis=0)
        sct_rows = jnp.take(d["sct"], idx, axis=0) if use_sct else None
        pos_b = jnp.take(d["pos"], idx, axis=0) if needs_labels else None
        (total, parts), grads = jax.value_and_grad(
            lambda p: objective(p, Qb, qmb, rng, d["pms"], d["Pt"], d["pmt"],
                                sct_rows, pos_b), has_aux=True)(param)
        updates, opt_state = optimizer.update(grads, opt_state, param)
        param = optax.apply_updates(param, updates)
        return param, opt_state, dict(parts, total_loss=total)

    jstep = jax.jit(one_step, donate_argnums=(0, 1))

    if cfg.steps_per_dispatch <= 1:
        def step(param, opt_state, idx, rng):
            return jstep(param, opt_state, jnp.asarray(idx), rng, data)
        return step, optimizer

    def multi(param, opt_state, idx_block, rng, d):
        keys = jax.random.split(rng, idx_block.shape[0])

        def body(carry, inp):
            p, s = carry
            idx, key = inp
            p, s, parts = one_step(p, s, idx, key, d)
            return (p, s), parts

        (param, opt_state), parts_seq = jax.lax.scan(
            body, (param, opt_state), (idx_block, keys))
        parts = jax.tree_util.tree_map(lambda x: x[-1], parts_seq)
        parts["total_loss_sum"] = jnp.sum(parts_seq["total_loss"])
        return param, opt_state, parts

    jmulti = jax.jit(multi, donate_argnums=(0, 1))

    def step(param, opt_state, idx_block, rng):
        return jmulti(param, opt_state, jnp.asarray(idx_block), rng, data)

    return step, optimizer


def build_sharded_eval_loss(cfg: TrainConfig, mesh: Mesh, n_docs: int
                            ) -> Callable:
    """Returns eval_loss(param, pms, Pt, pmt, Q, qm, sct_rows=None,
    pos=None) -> (total, parts) as DEVICE scalars — the distillation loss on
    test queries with zero index-sized host transfers (the collective loss
    forms run over the sharded doc axis; VERDICT r2 item 1)."""
    needs_labels = cfg.loss == "infonce_sup"
    # two variants (with/without precomputed teacher rows); augs never apply
    # to eval loss (matches single-device evaluation_loss)
    obj_inline = _build_objective(cfg, mesh, n_docs, with_aug=False,
                                  needs_labels=needs_labels, use_sct=False)
    obj_sct = _build_objective(cfg, mesh, n_docs, with_aug=False,
                               needs_labels=needs_labels, use_sct=True)

    @jax.jit
    def ev_inline(param, pms, Pt, pmt, Q, qm, pos):
        return obj_inline(param, Q, qm, jax.random.PRNGKey(0), pms, Pt, pmt,
                          None, pos)

    @jax.jit
    def ev_sct(param, pms, Pt, pmt, Q, qm, sct_rows, pos):
        return obj_sct(param, Q, qm, jax.random.PRNGKey(0), pms, Pt, pmt,
                       sct_rows, pos)

    def eval_loss(param, pms, Pt, pmt, Q, qm, sct_rows=None, pos=None):
        if sct_rows is not None and not needs_labels:
            return ev_sct(param, pms, Pt, pmt, Q, qm, sct_rows, pos)
        return ev_inline(param, pms, Pt, pmt, Q, qm, pos)

    return eval_loss
