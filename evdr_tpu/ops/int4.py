"""Per-token symmetric int4 quantization: the half-of-int8 storage tier.

The serving-index storage ladder (ARCHITECTURE.md) runs f32 (4D bytes per
token) -> bf16 (2D) -> int8 + scale (D + 4, ops/quantize.py) -> THIS (D/2
+ 4) -> PQ (M, ops/pq.py). Two 4-bit two's-complement codes pack per byte
(low nibble = dim j, high nibble = dim j + D/2), with one f32 scale per
token exactly like int8: ``sim = (codes @ Q^T) * scale`` applied after the
matmul (linear, so bit-equivalent to dequantizing first) and before the
max/masking, preserving the reference's masking semantics
(evaluator/retrieval.py:166-213; the reference itself has no quantization).

Codes live at ±7 (scale = amax/7) so the grid is symmetric around an exact
zero — the same convention as the int8 tier's ±127. Scoring is the chunked
XLA path (per-chunk unpack bounds the dequantized transient to chunk size;
the packed index is what sits in HBM). On quality: 4 bits/dim with a
per-token scale sits between int8 (measured 0.000 metric delta) and PQ —
scripts/index_quality.py carries the measured column.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evdr_tpu.ops.maxsim import NEG_FILL


def quantize_tokens_int4(P, pmask=None) -> Tuple[np.ndarray, np.ndarray]:
    """(N, Lp, D) float -> ((N, Lp, D/2) packed uint8, (N, Lp) f32 scales).

    Symmetric per token: code = clip(round(x / s), -7, 7), s = amax / 7.
    Fully-zero (e.g. masked) tokens get scale 0 and all-zero codes. D must
    be even (it is a lane-multiple everywhere else already)."""
    P = np.asarray(P, dtype=np.float32)
    d = P.shape[-1]
    if d % 2:
        raise ValueError(f"int4 packing needs an even dim, got {d}")
    amax = np.max(np.abs(P), axis=-1)                      # (N, Lp)
    scale = amax / 7.0
    safe = np.where(scale > 0, scale, 1.0)
    q = np.clip(np.rint(P / safe[..., None]), -7, 7).astype(np.int8)
    q = np.where((scale > 0)[..., None], q, np.int8(0))
    if pmask is not None:
        valid = np.asarray(pmask, dtype=bool)
        q = np.where(valid[..., None], q, np.int8(0))
        scale = np.where(valid, scale, 0.0)
    lo = q[..., : d // 2].astype(np.uint8) & np.uint8(0xF)
    hi = q[..., d // 2:].astype(np.uint8) & np.uint8(0xF)
    return (lo | (hi << np.uint8(4))).astype(np.uint8), scale.astype(
        np.float32)


def unpack_int4(packed) -> np.ndarray:
    """(..., D/2) packed uint8 -> (..., D) int8 sign-extended codes."""
    packed = np.asarray(packed, np.uint8)
    lo = (packed & 0xF).astype(np.int8)
    hi = (packed >> 4).astype(np.int8)
    lo -= np.int8(16) * (lo >= 8)
    hi -= np.int8(16) * (hi >= 8)
    return np.concatenate([lo, hi], axis=-1)


def dequantize_int4(packed, scale) -> np.ndarray:
    """Reference dequantization: (N, Lp, D) f32 — the scoring oracle."""
    return (unpack_int4(packed).astype(np.float32)
            * np.asarray(scale, np.float32)[..., None])


def unpack_int4_jnp(packed):
    """Packed uint8 -> f32 codes, sign-extended on device (VPU shifts)."""
    lo = (packed & jnp.uint8(0xF)).astype(jnp.int8)
    hi = (packed >> jnp.uint8(4)).astype(jnp.int8)
    lo = lo - jnp.int8(16) * (lo >= 8).astype(jnp.int8)
    hi = hi - jnp.int8(16) * (hi >= 8).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)


def _int4_chunk(Q, qmask_f, codes_c, sc_c, pmc):
    """Score one doc chunk: unpack -> matmul -> scale -> mask/max/sum.

    The dequantized transient is chunk-sized; only packed bytes stream
    from the full index."""
    Pc = unpack_int4_jnp(codes_c)                              # (C, Lp, D) f32
    sim = jnp.einsum("qnd,cmd->qcnm", Q, Pc,
                     preferred_element_type=jnp.float32)
    sim = sim * sc_c[None, :, None, :]                      # linear: == dequant-first
    sim = jnp.where(pmc[None, :, None, :], sim, NEG_FILL)
    mx = jnp.max(sim, axis=-1)
    mx = mx * jnp.any(pmc, axis=-1)[None, :, None].astype(mx.dtype)
    mx = mx * qmask_f[:, None, :]
    return jnp.sum(mx, axis=-1)


@functools.partial(jax.jit, static_argnames=("chunk_p",))
def maxsim_int4_xla(Q, packed, scales, qmask, pmask, chunk_p: int = 128):
    """Masked MaxSim over a packed-int4 index: (B, N) f32 scores.

    Args:
      Q:      (B, Lq, D) float queries
      packed: (N, Lp, D/2) uint8 packed codes (quantize_tokens_int4)
      scales: (N, Lp) f32 per-token scales
      qmask:  (B, Lq) bool
      pmask:  (N, Lp) bool
      chunk_p: doc-axis chunk (bounds the unpacked (chunk, Lp, D) + the
        (B, chunk, Lq, Lp) transients, same blocking as maxsim_xla)
    """
    Q = Q.astype(jnp.float32)
    qmask_f = qmask.astype(jnp.float32)
    pmask = pmask.astype(bool)
    pn = packed.shape[0]
    chunk_p = min(chunk_p, pn)
    n_chunks = -(-pn // chunk_p)
    pad = n_chunks * chunk_p - pn
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0), (0, 0)))
        scales = jnp.pad(scales, ((0, pad), (0, 0)))
        pmask = jnp.pad(pmask, ((0, pad), (0, 0)))
    cc = packed.reshape(n_chunks, chunk_p, *packed.shape[1:])
    sc = scales.reshape(n_chunks, chunk_p, scales.shape[1])
    pmc = pmask.reshape(n_chunks, chunk_p, pmask.shape[1])

    if n_chunks == 1:
        out = _int4_chunk(Q, qmask_f, cc[0], sc[0], pmc[0])[:, None, :]
    else:
        out = jax.lax.map(lambda args: _int4_chunk(Q, qmask_f, *args),
                          (cc, sc, pmc))
        out = jnp.transpose(out, (1, 0, 2))
    return out.reshape(Q.shape[0], n_chunks * chunk_p)[:, :pn]
