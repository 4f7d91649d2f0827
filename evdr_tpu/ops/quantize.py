"""Per-token symmetric int8 quantization of multi-vector indexes.

Serving indexes are HBM-bandwidth-bound (the P stream dominates the fused
MaxSim kernel's bytes); storing doc tokens as int8 + one f32 scale per token
halves the stream vs bf16 (scale overhead: 4/D ≈ 3% at D=128). Scores are
exactly ``(P_i8 @ Q^T) * scale`` — the scale is applied to the similarity
AFTER the matmul (linear, so bit-equivalent to dequantizing P first) and
BEFORE the max/masking, preserving the reference's masking semantics
(evaluator/retrieval.py:166-213).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def quantize_tokens_int8(P, pmask=None) -> Tuple[np.ndarray, np.ndarray]:
    """(N, Lp, D) float -> (int8 codes, (N, Lp) f32 per-token scales).

    Symmetric: code = round(x / s), s = max|x| / 127 per token. Fully-zero
    (e.g. masked) tokens get scale 0 and all-zero codes.
    """
    P = np.asarray(P, dtype=np.float32)
    amax = np.max(np.abs(P), axis=-1)                      # (N, Lp)
    scale = amax / 127.0
    safe = np.where(scale > 0, scale, 1.0)
    codes = np.clip(np.rint(P / safe[..., None]), -127, 127).astype(np.int8)
    codes = np.where((scale > 0)[..., None], codes, np.int8(0))
    if pmask is not None:
        valid = np.asarray(pmask, dtype=bool)
        codes = np.where(valid[..., None], codes, np.int8(0))
        scale = np.where(valid, scale, 0.0)
    return codes, scale.astype(np.float32)


def dequantize_int8(codes, scale) -> np.ndarray:
    """Reference dequantization: (N, Lp, D) f32."""
    return np.asarray(codes, np.float32) * np.asarray(scale, np.float32)[..., None]
