"""Fused Pallas backward for masked MaxSim.

The gradient of score[q, c] = sum_n qmask * max_m sim[(q,n),(c,m)] routes each
query token's gradient to its argmax doc token:

    dQ[q,n]  = sum_c  W[(q,n),c] * P[c, m*(q,n,c)]
    dP[c,m]  = sum_qn W[(q,n),c] * [m == m*(q,n,c)] * Q[q,n]
    W        = g[q,c] * qmask[q,n] * doc_has_token[c]

Instead of storing argmax indices, the forward (training variant) saves the
per-(query-token, doc) max values M; the backward recomputes each similarity
tile bit-identically and materializes the indicator as E = (sim == M) * W,
turning both gradients into plain MXU matmuls per tile:

    dQ_tile += E_T^T @ P_tile        (accumulated over doc/patch tiles)
    dP_tile += E_T   @ Q_tile        (accumulated over query blocks)

Exact-tie behaviour: gradient is SUMMED over tied argmax positions (torch
routes to the first tie; jax reduce_max splits evenly) — ties are measure-zero
for real embeddings.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evdr_tpu.ops.pallas_maxsim import NEG_INIT, NEG_THRESH, _pick_tiles, _round_up


def _prep(Q, P, qmask, pmask, compute_dtype, target_rows, target_cols):
    nq, lq, d = Q.shape
    nd, lp, _ = P.shape
    qb, lq_pad, db, tlp = _pick_tiles(lq, lp, target_rows, target_cols, nq=nq)
    nq_pad = _round_up(max(nq, qb), qb)
    nd_pad = _round_up(max(nd, db), db)
    lp_pad = _round_up(lp, tlp)
    d_pad = _round_up(d, 128)

    def padded(x, shape, dtype):
        x = x.astype(dtype)
        if x.shape == shape:
            return x
        return jnp.zeros(shape, dtype).at[tuple(slice(0, s) for s in x.shape)].set(x)

    Qp = padded(Q, (nq_pad, lq_pad, d_pad), compute_dtype)
    Pp = padded(P, (nd_pad, lp_pad, d_pad), compute_dtype)
    qm = padded(qmask, (nq_pad, lq_pad), jnp.float32)
    pm = padded(pmask, (nd_pad, lp_pad), jnp.float32)

    qbl = qb * lq_pad
    qf = Qp.reshape(nq_pad * lq_pad, d_pad)
    n_qb, n_db, n_lp = nq_pad // qb, nd_pad // db, lp_pad // tlp
    qmf = qm.reshape(n_qb, 1, qbl)
    pm_t = (pm.reshape(n_db, db, n_lp, tlp).transpose(0, 2, 1, 3)
            .reshape(n_db * n_lp, 1, db * tlp))
    dims = dict(nq=nq, lq=lq, nd=nd, lp=lp, d=d, qb=qb, lq_pad=lq_pad, db=db,
                tlp=tlp, nq_pad=nq_pad, nd_pad=nd_pad, lp_pad=lp_pad,
                d_pad=d_pad, qbl=qbl, n_qb=n_qb, n_db=n_db, n_lp=n_lp)
    return qf, qmf, Pp, pm_t, pm, dims


def _simT(qf_blk, p_ref, pm_ref, db, tlp, precision):
    pblk = p_ref[:].reshape(db * tlp, p_ref.shape[-1])
    simT = jax.lax.dot_general(
        pblk, qf_blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    pmcol = jnp.transpose(pm_ref[0])
    return jnp.where(pmcol > 0.5, simT, NEG_INIT)


# ---------------------------------------------------------------------------
# training forward: scores + per-(qtoken, doc) max values M
# ---------------------------------------------------------------------------

def _fwd_train_kernel(qf_ref, qmf_ref, p_ref, pm_ref, out_ref, m_ref, acc_ref, *,
                      db, tlp, lq_pad, qb, precision):
    l = pl.program_id(2)
    n_l = pl.num_programs(2)

    @pl.when(l == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, NEG_INIT)

    simT = _simT(qf_ref[:], p_ref, pm_ref, db, tlp, precision)
    blockmax = jnp.max(simT.reshape(db, tlp, simT.shape[-1]), axis=1)
    acc_ref[:] = jnp.maximum(acc_ref[:], blockmax)

    @pl.when(l == n_l - 1)
    def _finish():
        acc = acc_ref[:]
        m_ref[0, 0] = acc
        mx = jnp.where(acc > NEG_THRESH, acc, 0.0)
        weighted = mx * qmf_ref[0]
        # pure-VPU segmented Lq-sum (exact; see pallas_maxsim._finish_sum
        # 'sublane' — the fp32-HIGHEST selector matmul it replaces capped
        # the serving kernel at small Lp)
        wT = jnp.transpose(weighted)  # (QBL, DB)
        out_ref[0, 0] = jnp.sum(wT.reshape(qb, lq_pad, db), axis=1)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def maxsim_pallas_fwd_train(Q, P, qmask, pmask, compute_dtype=jnp.bfloat16,
                            interpret: bool = False):
    """Returns (scores (nq, nd) f32, M (n_qb, n_db, db, qbl) f32 residual)."""
    qf, qmf, Pp, pm_t, pm, dm = _prep(Q, P, qmask, pmask, compute_dtype,
                                      1024, 1024)
    fp32 = compute_dtype == jnp.float32
    precision = jax.lax.Precision.HIGHEST if fp32 else jax.lax.Precision.DEFAULT
    kernel = functools.partial(_fwd_train_kernel, db=dm["db"], tlp=dm["tlp"],
                               lq_pad=dm["lq_pad"], qb=dm["qb"],
                               precision=precision)
    out, M = pl.pallas_call(
        kernel,
        grid=(dm["n_qb"], dm["n_db"], dm["n_lp"]),
        in_specs=[
            pl.BlockSpec((dm["qbl"], dm["d_pad"]), lambda i, j, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dm["qbl"]), lambda i, j, l: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dm["db"], dm["tlp"], dm["d_pad"]),
                         lambda i, j, l: (j, l, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dm["db"] * dm["tlp"]),
                         lambda i, j, l: (j * pl.num_programs(2) + l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, dm["qb"], dm["db"]), lambda i, j, l: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dm["db"], dm["qbl"]), lambda i, j, l: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((dm["n_qb"], dm["n_db"], dm["qb"], dm["db"]),
                                 jnp.float32),
            jax.ShapeDtypeStruct((dm["n_qb"], dm["n_db"], dm["db"], dm["qbl"]),
                                 jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((dm["db"], dm["qbl"]), jnp.float32)],
        interpret=interpret,
    )(qf, qmf, Pp, pm_t)
    scores = out.transpose(0, 2, 1, 3).reshape(dm["nq_pad"], dm["nd_pad"])
    return scores[: dm["nq"], : dm["nd"]], M


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _indicator(simT, m_ref, w_ref, db, tlp, compute_dtype):
    """E_T = (sim == M) * W as a (DB*TLP, QBL) tile in the compute dtype."""
    qbl = simT.shape[-1]
    sim3 = simT.reshape(db, tlp, qbl)
    m = m_ref[0, 0]  # (db, qbl)
    w = w_ref[0, 0]
    e3 = jnp.where(sim3 == m[:, None, :], w[:, None, :], 0.0)
    return e3.reshape(db * tlp, qbl).astype(compute_dtype)


def _dqdp_kernel(qf_ref, p_ref, pm_ref, m_ref, w_ref, dq_ref, dp_ref, acc_ref,
                 *, db, tlp, precision, compute_dtype):
    """ONE sim recompute feeds BOTH gradient matmuls (VERDICT r1 item 4).

    Grid (i=q-block, j=doc-block, l=lp-tile), i outermost:
    - dQ accumulates over (j, l) in a VMEM scratch, written once per i;
    - dP partials go to PER-q-block output slices (i, j, l) — every output
      block is visited exactly once, so no block is revisited after other
      blocks were written (Pallas only supports read-modify-write
      accumulation across CONSECUTIVE visits; a (j, l)-keyed block revisited
      per i would see stale window contents on hardware when n_qb > 1). The
      sum over q-blocks happens outside the kernel as one XLA reduce; at the
      common training shape n_qb == 1 this is bit-identical and free.
    """
    j, l = pl.program_id(1), pl.program_id(2)
    n_j, n_l = pl.num_programs(1), pl.num_programs(2)

    @pl.when((j == 0) & (l == 0))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    simT = _simT(qf_ref[:], p_ref, pm_ref, db, tlp, precision)
    e_t = _indicator(simT, m_ref, w_ref, db, tlp, compute_dtype)

    pblk = p_ref[:].reshape(db * tlp, p_ref.shape[-1])
    acc_ref[:] += jax.lax.dot_general(
        e_t, pblk, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    dp_ref[:] = jax.lax.dot_general(
        e_t, qf_ref[:].astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision).reshape(1, 1, db, tlp, qf_ref.shape[-1])

    @pl.when((j == n_j - 1) & (l == n_l - 1))
    def _finish():
        dq_ref[:] = acc_ref[:]


# dP partials are materialized per q-block: (n_qb, nd_pad, lp_pad, d_pad) f32
# in HBM, i.e. n_qb x the index gradient size (required for correct
# accumulation on hardware — see _dqdp_kernel). Above this many q-blocks the
# backward chunks the query axis outside the kernel so the partials buffer
# stays bounded at _MAX_QB_BLOCKS x |dP| regardless of batch size.
_MAX_QB_BLOCKS = 8


def maxsim_pallas_bwd(Q, P, qmask, pmask, M, g, compute_dtype=jnp.bfloat16,
                      interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused VJP: returns (dQ, dP) for upstream gradient g (nq, nd).

    Memory note: the kernel writes per-q-block dP partials (reduced in XLA),
    so peak HBM for the partials is ``min(n_qb, _MAX_QB_BLOCKS) * nd_pad *
    lp_pad * d_pad * 4`` bytes; larger batches (full-batch SPL runs) are
    chunked along the query axis at q-block granularity, which is exact
    (dP sums over query blocks; dQ rows are independent).
    """
    nq, lq, d = Q.shape
    qb, lq_pad, _, _ = _pick_tiles(lq, P.shape[1], 1024, 1024)
    n_qb = _round_up(max(nq, qb), qb) // qb
    if n_qb > _MAX_QB_BLOCKS:
        rows = _MAX_QB_BLOCKS * qb
        dQs, dP = [], None
        for qs in range(0, nq, rows):
            qe = min(qs + rows, nq)
            dq_c, dp_c = _maxsim_pallas_bwd_impl(
                Q[qs:qe], P, qmask[qs:qe], pmask,
                M[qs // qb: -(-qe // qb)], g[qs:qe],
                compute_dtype=compute_dtype, interpret=interpret)
            dQs.append(dq_c)
            dP = dp_c if dP is None else dP + dp_c
        return jnp.concatenate(dQs, axis=0), dP
    return _maxsim_pallas_bwd_impl(Q, P, qmask, pmask, M, g,
                                   compute_dtype=compute_dtype,
                                   interpret=interpret)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def _maxsim_pallas_bwd_impl(Q, P, qmask, pmask, M, g,
                            compute_dtype=jnp.bfloat16,
                            interpret: bool = False
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    qf, qmf, Pp, pm_t, pm, dm = _prep(Q, P, qmask, pmask, compute_dtype,
                                      1024, 1024)
    fp32 = compute_dtype == jnp.float32
    precision = jax.lax.Precision.HIGHEST if fp32 else jax.lax.Precision.DEFAULT

    # W[(q,n), c] = g[q,c] * qmask[q,n] * doc_has_token[c], laid out in the
    # kernels' (n_qb, n_db, db, qbl) block structure
    g_pad = jnp.zeros((dm["nq_pad"], dm["nd_pad"]), jnp.float32)
    g_pad = g_pad.at[: dm["nq"], : dm["nd"]].set(g.astype(jnp.float32))
    doc_has = jnp.any(pm > 0.5, axis=-1)
    g_pad = g_pad * doc_has[None, :]
    qm_pad = qmf.reshape(dm["nq_pad"], dm["lq_pad"])
    W = (g_pad[:, None, :] * qm_pad[:, :, None])  # (nq_pad, lq_pad, nd_pad)
    W = (W.reshape(dm["n_qb"], dm["qbl"], dm["n_db"], dm["db"])
         .transpose(0, 2, 3, 1))  # (n_qb, n_db, db, qbl)

    dq, dp = pl.pallas_call(
        functools.partial(_dqdp_kernel, db=dm["db"], tlp=dm["tlp"],
                          precision=precision, compute_dtype=compute_dtype),
        grid=(dm["n_qb"], dm["n_db"], dm["n_lp"]),
        in_specs=[
            pl.BlockSpec((dm["qbl"], dm["d_pad"]), lambda i, j, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dm["db"], dm["tlp"], dm["d_pad"]),
                         lambda i, j, l: (j, l, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dm["db"] * dm["tlp"]),
                         lambda i, j, l: (j * pl.num_programs(2) + l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dm["db"], dm["qbl"]),
                         lambda i, j, l: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dm["db"], dm["qbl"]),
                         lambda i, j, l: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((dm["qbl"], dm["d_pad"]), lambda i, j, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dm["db"], dm["tlp"], dm["d_pad"]),
                         lambda i, j, l: (i, j, 0, l, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (dm["nq_pad"] * dm["lq_pad"], dm["d_pad"]), jnp.float32),
            jax.ShapeDtypeStruct(
                (dm["n_qb"], dm["n_db"], dm["db"], dm["lp_pad"], dm["d_pad"]),
                jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((dm["qbl"], dm["d_pad"]), jnp.float32)],
        # dq accumulates over j,l in scratch; dp blocks are write-once
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(qf, Pp, pm_t, M, W)

    dQ = dq.reshape(dm["nq_pad"], dm["lq_pad"], dm["d_pad"])[
        : dm["nq"], : dm["lq"], : dm["d"]]
    dP = dp.sum(axis=0).reshape(dm["nd_pad"], dm["lp_pad"], dm["d_pad"])[
        : dm["nd"], : dm["lp"], : dm["d"]]
    return dQ, dP
