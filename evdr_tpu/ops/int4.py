"""Per-token symmetric int4 quantization: the half-of-int8 storage tier.

The serving-index storage ladder (ARCHITECTURE.md) runs f32 (4D bytes per
token) -> bf16 (2D) -> int8 + scale (D + 4, ops/quantize.py) -> THIS (D/2
+ 4) -> PQ (M, ops/pq.py). Two 4-bit two's-complement codes pack per byte,
with one f32 scale per token exactly like int8: ``sim = (codes @ Q^T) *
scale`` applied after the matmul (linear, so bit-equivalent to
dequantizing first) and before the max/masking, preserving the reference's
masking semantics (evaluator/retrieval.py:166-213; the reference itself
has no quantization).

Packing is TOKEN-PAIR (not dim-pair): byte [n, t, d] holds dim ``d`` of
token ``2t`` (low nibble) and of token ``2t+1`` (high nibble), so packed
codes are (N, ceil(Lp/2), D) uint8 with full-width lanes. This layout is
chosen FOR the TPU kernel: unpacking splits along the token axis, and
MaxSim's max-over-tokens absorbs it — the kernel runs two half-tile dots
at the full K=D contraction and maxes the results, with no lane-axis
concat or relayout (a dim-pair layout would need K=D/2 dots or an in-
kernel lane concat). Odd-Lp corpora pad the token axis with a zero nibble
(score-inert behind pmask/scale).

Codes live at ±7 (scale = amax/7) so the grid is symmetric around an exact
zero — the same convention as the int8 tier's ±127. Scoring: the Pallas
kernel (ops/pallas_maxsim.maxsim_pallas_int4) on TPU, or the chunked XLA
path here (per-chunk unpack bounds the dequantized transient to chunk
size; the packed index is what sits in HBM). On quality: measured
-0.0008 nDCG@5 / 0.000 R@1 on the worst-case sweep
(scripts/index_quality.py) — near-lossless at half of int8's bytes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evdr_tpu.ops.maxsim import NEG_FILL


def packed_token_rows(lp: int) -> int:
    """Token-axis length of the packed array for an Lp-token index."""
    return (lp + 1) // 2


def quantize_tokens_int4(P, pmask=None) -> Tuple[np.ndarray, np.ndarray]:
    """(N, Lp, D) float -> ((N, ceil(Lp/2), D) packed uint8, (N, Lp) f32
    scales).

    Symmetric per token: code = clip(round(x / s), -7, 7), s = amax / 7.
    Fully-zero (e.g. masked) tokens get scale 0 and all-zero codes; an odd
    Lp pads one all-zero token into the last byte's high nibble."""
    P = np.asarray(P, dtype=np.float32)
    n, lp, d = P.shape
    amax = np.max(np.abs(P), axis=-1)                      # (N, Lp)
    scale = amax / 7.0
    safe = np.where(scale > 0, scale, 1.0)
    q = np.clip(np.rint(P / safe[..., None]), -7, 7).astype(np.int8)
    q = np.where((scale > 0)[..., None], q, np.int8(0))
    if pmask is not None:
        valid = np.asarray(pmask, dtype=bool)
        q = np.where(valid[..., None], q, np.int8(0))
        scale = np.where(valid, scale, 0.0)
    if lp % 2:
        q = np.concatenate([q, np.zeros((n, 1, d), np.int8)], axis=1)
    lo = q[:, 0::2].astype(np.uint8) & np.uint8(0xF)   # tokens 0, 2, 4, ...
    hi = q[:, 1::2].astype(np.uint8) & np.uint8(0xF)   # tokens 1, 3, 5, ...
    return (lo | (hi << np.uint8(4))).astype(np.uint8), scale.astype(
        np.float32)


def unpack_int4(packed, lp: int = None) -> np.ndarray:
    """(..., H, D) packed uint8 -> (..., 2H or lp, D) int8 codes.

    Interleaves the low-nibble (even) and high-nibble (odd) token planes
    back into original token order; ``lp`` slices off the odd-Lp pad."""
    packed = np.asarray(packed, np.uint8)
    lo = (packed & 0xF).astype(np.int8)
    hi = (packed >> 4).astype(np.int8)
    lo -= np.int8(16) * (lo >= 8)
    hi -= np.int8(16) * (hi >= 8)
    out = np.stack([lo, hi], axis=-2).reshape(
        *packed.shape[:-2], 2 * packed.shape[-2], packed.shape[-1])
    return out if lp is None else out[..., :lp, :]


def dequantize_int4(packed, scale) -> np.ndarray:
    """Reference dequantization: (N, Lp, D) f32 — the scoring oracle."""
    scale = np.asarray(scale, np.float32)
    return (unpack_int4(packed, lp=scale.shape[-1]).astype(np.float32)
            * scale[..., None])


def unpack_int4_jnp(packed, lp: int = None):
    """Device unpack: packed uint8 -> f32 codes in token order (VPU
    shifts); works over any leading batch dims (rerank gathers pass
    (nq, C, H, D))."""
    lo = (packed & jnp.uint8(0xF)).astype(jnp.int8)
    hi = (packed >> jnp.uint8(4)).astype(jnp.int8)
    lo = lo - jnp.int8(16) * (lo >= 8).astype(jnp.int8)
    hi = hi - jnp.int8(16) * (hi >= 8).astype(jnp.int8)
    out = jnp.stack([lo, hi], axis=-2).reshape(
        *packed.shape[:-2], 2 * packed.shape[-2], packed.shape[-1])
    if lp is not None:
        out = out[..., :lp, :]
    return out.astype(jnp.float32)


def _int4_chunk(Q, qmask_f, codes_c, sc_c, pmc):
    """Score one doc chunk: unpack -> matmul -> scale -> mask/max/sum.

    The dequantized transient is chunk-sized; only packed bytes stream
    from the full index."""
    lp = pmc.shape[-1]
    Pc = unpack_int4_jnp(codes_c, lp=lp)                    # (C, Lp, D) f32
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
      packed: (N, ceil(Lp/2), D) uint8 packed codes (quantize_tokens_int4)
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
