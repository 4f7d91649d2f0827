"""GSPMD-partitioned (shard_map-free) doc-sharded scoring + top-k.

Alternative formulation of ``parallel/topk.py`` investigated for VERDICT r1
item 7: the remote-TPU backend showed ~200x per-dispatch overhead for
shard_map programs vs plain jit on a 1-device mesh (CLAUDE.md). Here the SAME
two-stage top-k (local per-shard selection -> tiny global merge) is written as
one plain jit over GLOBAL arrays with sharding constraints; XLA's SPMD
partitioner inserts the collectives:

- scores: the (B, N) MaxSim matrix computed tile-by-tile over Lp with a
  running max — the doc axis stays sharded end-to-end (no reshape of the
  sharded dim, which would force a gather);
- top-k: scores reshape to (B, world, shard) with the WORLD axis sharded
  (shard-local reshape), per-group ``lax.top_k``, then the (B, world*k)
  candidate merge replicates (O(world*k) traffic, same as the shard_map
  form's all_gather).

Select the serving implementation with ``EVDR_TOPK_IMPL=gspmd|shard_map``
(default shard_map) — see ``sharded_topk``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from evdr_tpu.parallel.mesh import DOC_AXIS
from evdr_tpu.parallel.sharded_index import ShardedIndex


def _scores_lp_tiled_block(Q, qmask, Pd, pmd, lp_tile: int):
    """(b, N) masked MaxSim for ONE query block, doc axis N left sharded."""
    nq, lq, d = Q.shape
    nd, lp, _ = Pd.shape
    qm = qmask.astype(jnp.float32)
    acc = jnp.full((nq, nd, lq), -1e30, jnp.float32)
    for s in range(0, lp, lp_tile):
        e = min(s + lp_tile, lp)
        sim = jnp.einsum("qnd,cmd->qcnm", Q, Pd[:, s:e],
                         preferred_element_type=jnp.float32)
        sim = jnp.where(pmd[None, :, None, s:e], sim, -1e30)
        acc = jnp.maximum(acc, jnp.max(sim, axis=-1))
    mx = jnp.where(acc > -1e29, acc, 0.0)           # all-invalid doc -> 0
    return jnp.sum(mx * qm[:, None, :], axis=-1)    # (b, N)


def _scores_lp_tiled(Q, qmask, Pd, pmd, lp_tile: int, q_chunk: int = 8):
    """(B, N) masked MaxSim with the doc axis N left sharded.

    Loops over Lp tiles (static Python loop -> unrolled in the jit) keeping a
    running max; the QUERY axis runs in lax.map blocks of ``q_chunk`` so the
    transient (b, N_loc, Lq) accumulator stays bounded — unchunked it was
    B x N x Lq x 4 bytes, ~33 GB at config-5 scale (1M pages, batch 256),
    which OOM'd the exact path this module is advertised as an alternative
    for.
    """
    nq = Q.shape[0]
    if nq <= q_chunk:
        return _scores_lp_tiled_block(Q, qmask, Pd, pmd, lp_tile)
    n_blk = -(-nq // q_chunk)
    nq_pad = n_blk * q_chunk
    if nq_pad != nq:
        Q = jnp.pad(Q, ((0, nq_pad - nq), (0, 0), (0, 0)))
        qmask = jnp.pad(qmask, ((0, nq_pad - nq), (0, 0)))
    Qb = Q.reshape(n_blk, q_chunk, *Q.shape[1:])
    qmb = qmask.reshape(n_blk, q_chunk, qmask.shape[1])
    sc = jax.lax.map(
        lambda args: _scores_lp_tiled_block(args[0], args[1], Pd, pmd,
                                            lp_tile), (Qb, qmb))
    return sc.reshape(nq_pad, -1)[:nq]


@functools.partial(jax.jit,
                   static_argnames=("k", "world", "shard", "lp_tile",
                                    "grp_sh", "approx", "n_docs"))
def _gspmd_topk_impl(Q, qmask, Pd, pmd, k: int, world: int, shard: int,
                     lp_tile: int, grp_sh, approx: bool = False,
                     n_docs: int = None):
    sc = _scores_lp_tiled(Q, qmask, Pd, pmd, lp_tile)
    # exclude only PADDING columns: real all-masked docs keep their exact 0
    # score (MaxSim semantics, agreeing with sharded_maxsim/sharded_topk)
    limit = Pd.shape[0] if n_docs is None else n_docs
    if limit < Pd.shape[0]:
        sc = jnp.where(jnp.arange(Pd.shape[0])[None, :] < limit, sc, -jnp.inf)
    nq = sc.shape[0]
    # (B, world, shard): splitting the sharded axis N -> (world, shard) keeps
    # each group on its own device; constrain to make the intent explicit
    sc3 = sc.reshape(nq, world, shard)
    if grp_sh is not None:
        sc3 = jax.lax.with_sharding_constraint(sc3, grp_sh)
    k_local = min(k, shard)
    if approx and k_local > 128:
        # hardware approximate k-selection: exact top_k's sorting network
        # build time explodes at candidate-generation k (topk.py _select_topk)
        v, i = jax.lax.approx_max_k(sc3, k_local, recall_target=0.95)
    else:
        v, i = jax.lax.top_k(sc3, k_local)          # (B, world, k_local)
    gi = i + (jnp.arange(world, dtype=i.dtype) * shard)[None, :, None]
    v2 = v.reshape(nq, world * k_local)
    gi2 = gi.reshape(nq, world * k_local)
    mv, mp = jax.lax.top_k(v2, min(k, world * k_local))  # tiny merge
    return mv, jnp.take_along_axis(gi2, mp, axis=1)


def gspmd_topk(Q, qmask, index: ShardedIndex, k: int, lp_tile: int = 128,
               approx: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Doc-sharded top-k as one GSPMD-partitioned jit program (exact unless
    ``approx`` requests hardware k-selection for candidate generation)."""
    mesh = index.mesh
    world = dict(mesh.shape).get(DOC_AXIS, mesh.devices.size)
    shard = index.n_pad // world
    grp_sh = (NamedSharding(mesh, P(None, DOC_AXIS, None))
              if world > 1 else None)
    return _gspmd_topk_impl(Q, qmask, index.P, index.pmask, k=min(k, index.n_pad),
                            world=world, shard=shard, lp_tile=lp_tile,
                            grp_sh=grp_sh, approx=approx,
                            n_docs=index.n_docs)


@functools.partial(jax.jit, static_argnames=("lp_tile",))
def _gspmd_scores_impl(Q, qmask, Pd, pmd, lp_tile):
    return _scores_lp_tiled(Q, qmask, Pd, pmd, lp_tile)


def gspmd_maxsim(Q, qmask, index: ShardedIndex, lp_tile: int = 128):
    """Full (B, n_docs) scores as one GSPMD-partitioned jit program."""
    sc = _gspmd_scores_impl(Q, qmask, index.P, index.pmask, lp_tile)
    return sc[:, : index.n_docs]
