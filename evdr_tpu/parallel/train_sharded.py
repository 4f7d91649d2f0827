"""Doc-sharded distillation training step.

Shards the student parameter, the teacher index, and their masks across the
mesh's doc axis; queries replicate. Gradients flow through a shard_map whose
collectives implement the GLOBAL loss semantics without materializing (B, N)
on one device:

- softmax/CE terms (listwise, InfoNCE): global logsumexp via pmax + psum;
- teacher top-k: per-shard top-k -> all_gather of (world x k) candidates ->
  merge (exact: the global top-k is inside the union of local top-ks);
- MSE terms: local sums + psum, padded docs excluded.

Losses without a hand-written collective form fall back to all-gathering the
(B, N) score rows — tiny relative to the index — and reusing the standard
loss functions. Everything is differentiable; optimizer updates inherit the
parameter sharding, so the full train step is one pjit program with XLA
collectives over ICI.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evdr_tpu.data.packing import l2_normalize
from evdr_tpu.losses.distill import COMBINED_RECIPES
from evdr_tpu.ops.maxsim import maxsim_xla
from evdr_tpu.parallel.mesh import DOC_AXIS
from evdr_tpu.train.config import TrainConfig
from evdr_tpu.train.harness import make_loss_fn

NEG = -jnp.inf


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


def build_sharded_train_step(cfg: TrainConfig, mesh: Mesh, *, pmask_student,
                             P_teacher, pmask_teacher, n_docs: int
                             ) -> Tuple[Callable, optax.GradientTransformation]:
    """Returns (jitted step(param, opt_state, Qb, qmb) -> (param, opt_state,
    parts), optimizer). All index-shaped inputs must be doc-sharded already
    and padded to a multiple of the mesh size (see build_sharded_index)."""
    optimizer = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    chunk_p = cfg.chunk_p
    temp, k = cfg.temp, cfg.k
    loss_name = cfg.loss
    fallback_loss = make_loss_fn(cfg)

    def loss_shardmap(param, Qb, qmb, pmask_student, P_teacher, pmask_teacher):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(DOC_AXIS), P(DOC_AXIS), P(DOC_AXIS), P(DOC_AXIS), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        def f(param_loc, pms_loc, Pt_loc, pmt_loc, Q, qm):
            Ps = l2_normalize(param_loc * pms_loc[..., None].astype(param_loc.dtype))
            s_loc = maxsim_xla(Q, Ps, qm, pms_loc, chunk_p=chunk_p)
            t_loc = jax.lax.stop_gradient(
                maxsim_xla(Q, Pt_loc, qm, pmt_loc, chunk_p=chunk_p))
            valid_loc = jnp.any(pmt_loc, axis=-1)
            # padded docs must not contribute to softmax terms
            s_m = jnp.where(valid_loc[None, :], s_loc, NEG)
            t_m = jnp.where(valid_loc[None, :], t_loc, NEG)

            kk = min(k, n_docs)
            if loss_name == "liscore":
                l_list = _listwise_global(s_m, t_m, kk, temp, DOC_AXIS)
                l_score = _mse_global(s_loc, t_loc, valid_loc, DOC_AXIS)
                total = cfg.lambda_list * l_list + cfg.lambda_score * l_score
                parts = {"listwise": l_list, "score": l_score}
            elif loss_name == "liscore_std":
                l_list = _listwise_global(s_m, t_m, kk, temp, DOC_AXIS)
                l_score = _mse_std_global(s_loc, t_loc, valid_loc, DOC_AXIS)
                total = cfg.lambda_list * l_list + cfg.lambda_score * l_score
                parts = {"listwise": l_list, "score_std": l_score}
            elif loss_name == "listwise":
                l_list = _listwise_global(s_m, t_m, kk, temp, DOC_AXIS)
                total, parts = l_list, {"listwise": l_list}
            elif loss_name == "infonce_distill":
                l_nce = _infonce_distill_global(s_m, t_m, temp, DOC_AXIS)
                total, parts = l_nce, {"infonce_distill": l_nce}
            elif loss_name == "score":
                l_sc = _mse_global(s_loc, t_loc, valid_loc, DOC_AXIS)
                total, parts = l_sc, {"score": l_sc}
            elif loss_name == "spl":
                l_sp = _mse_global(s_loc, t_loc, valid_loc, DOC_AXIS, halved=True)
                total, parts = l_sp, {"spl": l_sp}
            else:
                # generic fallback: gather this batch's full score rows
                s_full = jax.lax.all_gather(s_loc, DOC_AXIS, axis=1,
                                            tiled=True)[:, :n_docs]
                t_full = jax.lax.all_gather(t_loc, DOC_AXIS, axis=1,
                                            tiled=True)[:, :n_docs]
                total, parts = fallback_loss(s_full, t_full, None)
            return total, parts

        return f(param, pmask_student, P_teacher, pmask_teacher, Qb, qmb)

    # index-sized arrays are jit ARGUMENTS, not closure constants (closure
    # capture inlines them into the program, which remote-compile rejects
    # for large indexes)
    @jax.jit
    def step_impl(param, opt_state, Qb, qmb, pms, Pt, pmt):
        (total, parts), grads = jax.value_and_grad(
            lambda p: loss_shardmap(p, Qb, qmb, pms, Pt, pmt), has_aux=True)(param)
        updates, opt_state = optimizer.update(grads, opt_state, param)
        param = optax.apply_updates(param, updates)
        return param, opt_state, dict(parts, total_loss=total)

    def step(param, opt_state, Qb, qmb):
        return step_impl(param, opt_state, Qb, qmb, pmask_student, P_teacher,
                         pmask_teacher)

    return step, optimizer
