"""Quantization-aware distillation: train the student against its SERVING
representation.

The storage ladder (int8 / int4 / PQ — ops/quantize.py, ops/int4.py,
ops/pq.py) is normally applied post-hoc to a student distilled in fp32; the
resulting nDCG/recall deltas are avoidable by exposing the quantizer INSIDE
the train step with a straight-through estimator (STE): the forward pass
scores the exact quantize->dequantize reconstruction the serving index will
use, while gradients flow through the identity, so the optimizer learns
embeddings that survive their own serving dtype.

Numerics contract: each ``qdq_*`` here reproduces
``dequantize(quantize_tokens_*(x))`` of the numpy serving quantizers
bit-for-bit (both use round-half-to-even; tests/test_qat.py pins this), so
training-time scores see the true serving grid, not an approximation.

Model selection happens in the serving form too: under ``cfg.qat`` the
harness evaluates (and picks best checkpoints by) the reconstruction, and
for 'pq' the codebooks REFIT on the current student at every eval so the
grid tracks the drifting embeddings (a grid frozen on the init measured
WORSE than post-hoc quantization at reference compression); the final
books export with the best npz so serving uses the exact training grid.

This extends the reference's score-preservation objective
(criterion.py:74-83) to the serving dtype — the reference itself has no
quantized serving tier at all. Wired via ``TrainConfig.qat`` /
``evdr-train --qat {int8,int4,pq}``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ste(x, q):
    """Straight-through estimator: forward = q, gradient = identity on x."""
    return x + jax.lax.stop_gradient(q - x)


def _qdq_symmetric(x, levels: float):
    """Per-token symmetric quantize->dequantize on the last axis.

    Matches ops/quantize.quantize_tokens_int8 (levels=127) and
    ops/int4.quantize_tokens_int4 (levels=7): s = amax/levels per token,
    code = clip(round(x/s)), fully-zero tokens reconstruct to exact 0.
    jnp.round and np.rint both round half to even, so the grids agree.
    """
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = amax / levels
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(x / safe), -levels, levels)
    return jnp.where(scale > 0, q * safe, 0.0)


def qdq_int8(x):
    return _qdq_symmetric(x, 127.0)


def qdq_int4(x):
    return _qdq_symmetric(x, 7.0)


def qdq_pq(x, books, pmask=None):
    """Nearest-centroid PQ reconstruction, differentiable-free assignment.

    Compact (M, K, D/M) codebooks (ops/pq.py layout): ``x`` (..., D) splits
    into M subvectors and the reconstruction CONCATENATES the winning
    centroids. Expanded OPQ (M, K, D) codebooks (ops/pq.expand_books, the
    shipped PQ form): per-subspace assignment recovers from full-D dots
    (R is orthogonal — same identity as ``encode_with_books``) and the
    winning full-width vectors SUM. Assignment uses the
    ||x - c||^2 = ||c||^2 - 2<x, c> (+ const) expansion either way, so the
    chosen codes match the serving encoder exactly.
    """
    m, k, w = books.shape
    d = x.shape[-1]
    lead = x.shape[:-1]
    expanded = m > 1 and w == d
    if expanded:
        # (..., M, K) full-D dots against each expanded book
        dots = jnp.einsum("...d,mkd->...mk", x, books)
    else:
        xs = x.reshape(*lead, m, w)
        dots = jnp.einsum("...md,mkd->...mk", xs, books)
    c2 = jnp.sum(books * books, axis=-1)               # (M, K)
    assign = jnp.argmin(c2 - 2.0 * dots, axis=-1)      # (..., M)
    rec = jnp.take_along_axis(
        jnp.broadcast_to(books, (*lead, m, k, w)),
        assign[..., None, None], axis=-2)[..., 0, :]   # (..., M, w)
    rec = rec.sum(axis=-2) if expanded else rec.reshape(*lead, m * w)
    # masked tokens must reconstruct to 0: the nearest centroid to 0 is
    # generally NOT 0 (serving masks those columns — encode_pq zeroes their
    # codes — and downstream consumers of Ps, e.g. hardtoken mining, rely
    # on masked tokens staying inert). Mask by ``pmask`` when the caller
    # has it: the x!=0 fallback would ALSO zero a LIVE token whose
    # embedding is exactly zero, while the serving encoder (pmask-driven)
    # gives that token the nearest-centroid-to-0 reconstruction.
    if pmask is not None:
        alive = pmask.astype(bool)[..., None]
    else:
        alive = jnp.any(x != 0, axis=-1, keepdims=True)
    return jnp.where(alive, rec, 0.0)


def qat_apply(Ps, cfg_qat: str, books=None, pmask=None):
    """Serving-form STE pass over the normalized student ``Ps``.

    ``cfg_qat``: 'none' (identity), 'int8', 'int4', 'pq', or 'opq' (the
    last two need the replicated codebooks trained on the current student —
    compact for 'pq', expanded for 'opq'; see harness eval_now). Masked
    tokens are all-zero in Ps and reconstruct to exact 0 under the
    symmetric tiers; PQ needs ``pmask`` to match the serving encoder
    exactly when a LIVE token is all-zero (see :func:`qdq_pq`).
    """
    if cfg_qat == "none":
        return Ps
    if cfg_qat == "int8":
        return ste(Ps, qdq_int8(Ps))
    if cfg_qat == "int4":
        return ste(Ps, qdq_int4(Ps))
    if cfg_qat in ("pq", "opq"):
        if books is None:
            raise ValueError(f"qat={cfg_qat!r} needs trained codebooks")
        return ste(Ps, qdq_pq(Ps, books, pmask=pmask))
    raise ValueError(f"unknown qat tier {cfg_qat!r}")
