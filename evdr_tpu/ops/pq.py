"""Product-quantized (PQ) multi-vector indexes: the 8-32x compression tier.

The storage ladder for serving indexes is f32 (4D bytes/token) -> bf16 (2D)
-> int8 + scale (D + 4, ops/quantize.py) -> PQ (M bytes/token, this
module): each D-dim token splits into ``M`` subvectors of ``D/M`` dims and
stores only the uint8 id of the nearest centroid in a per-subspace
``K=256``-entry codebook (TileMaxSim / PLAID-style product quantization —
PAPERS.md; the reference repo has no quantization at all). At D=128, M=16
is 8x smaller than int8 — the index-memory lever that moves the
pages-per-chip ceiling, at the cost of lossy scores.

Scoring is ASYMMETRIC-distance: queries stay float, and

    sim(q, d) = sum_m <q[m], C[m, code_m(d)]> = <q, decode(d)>

i.e. exactly the float MaxSim against the reconstructed token — so
``maxsim_pq_xla(Q, codes, ...) == maxsim_xla(Q, decode_pq(codes), ...)``
bit-for-bit up to float summation order (the parity test). Rather than
materializing reconstructions (which would forfeit the memory win), each
doc chunk's similarities come from a per-(query-token, subspace) lookup
table ``LUT = Q_sub @ C^T`` — one MXU einsum per batch — gathered by the
codes; the -1e4 mask fill / all-invalid-doc zero / qmask-multiply
semantics mirror ops/maxsim.py exactly (reference retrieval.py:166-213).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evdr_tpu.ops.maxsim import NEG_FILL


def _kmeans_np(X: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Plain-numpy Lloyd with kmeans++ seeding (host-side, training-time).

    Small by construction: X is a <=``sample``-row slice of one subspace
    (ds = D/M dims). Empty clusters re-seed from the farthest points.
    """
    n = X.shape[0]
    if n <= k:
        # fewer vectors than centroids: every vector is its own centroid,
        # the rest duplicate row 0 (harmless — never the argmin winner)
        reps = np.concatenate([X, np.repeat(X[:1], k - n, axis=0)], axis=0)
        return reps.astype(np.float32)
    centers = np.empty((k, X.shape[1]), np.float32)
    centers[0] = X[rng.integers(n)]
    d2 = np.full(n, np.inf, np.float32)
    for j in range(1, k):
        d2 = np.minimum(d2, ((X - centers[j - 1]) ** 2).sum(-1))
        tot = float(d2.sum())
        if tot <= 0.0:  # all remaining points coincide with a center
            centers[j:] = centers[j - 1]
            break
        centers[j] = X[rng.choice(n, p=d2 / tot)]
    for _ in range(iters):
        # assignment via the dot trick: ||x-c||^2 = ||x||^2 - 2x.c + ||c||^2
        dist = (centers * centers).sum(-1)[None, :] - 2.0 * (X @ centers.T)
        assign = np.argmin(dist, axis=1)
        for j in range(k):
            sel = assign == j
            if sel.any():
                centers[j] = X[sel].mean(axis=0)
            else:  # re-seed empty cluster from the current farthest point
                centers[j] = X[np.argmax(np.min(dist, axis=1))]
    return centers


def train_pq(P, pmask=None, m: int = 16, k: int = 256, iters: int = 10,
             sample: int = 65536, seed: int = 0) -> np.ndarray:
    """Fit per-subspace codebooks on the valid tokens: (M, K, D/M) f32.

    Tokens are pooled across docs (masked ones dropped); at most ``sample``
    tokens train each subspace (uniform subsample — PQ codebooks saturate
    long before full-corpus kmeans pays off)."""
    P = np.asarray(P, dtype=np.float32)
    n, lp, d = P.shape
    if d % m:
        raise ValueError(f"dim {d} must divide into m={m} subspaces")
    toks = P.reshape(n * lp, d)
    if pmask is not None:
        toks = toks[np.asarray(pmask, bool).reshape(-1)]
    if toks.shape[0] == 0:
        raise ValueError("no valid tokens to train PQ on")
    rng = np.random.default_rng(seed)
    if toks.shape[0] > sample:
        toks = toks[rng.choice(toks.shape[0], sample, replace=False)]
    ds = d // m
    sub = toks.reshape(-1, m, ds)
    return np.stack([_kmeans_np(np.ascontiguousarray(sub[:, j]), k, iters,
                                rng) for j in range(m)]).astype(np.float32)


def encode_pq(P, books: np.ndarray, pmask=None) -> np.ndarray:
    """(N, Lp, D) float -> (N, Lp, M) uint8 nearest-centroid codes.

    Masked tokens encode as code 0 (they are score-inert behind pmask, same
    convention as int8's zeroed codes)."""
    P = np.asarray(P, dtype=np.float32)
    n, lp, d = P.shape
    m, k, ds = books.shape
    sub = P.reshape(n * lp, m, ds)
    codes = np.empty((n * lp, m), np.uint8)
    cnorm = (books * books).sum(-1)  # (M, K)
    for j in range(m):
        x = sub[:, j]
        dist = cnorm[j][None, :] - 2.0 * (x @ books[j].T)
        codes[:, j] = np.argmin(dist, axis=1).astype(np.uint8)
    codes = codes.reshape(n, lp, m)
    if pmask is not None:
        codes = np.where(np.asarray(pmask, bool)[..., None], codes,
                         np.uint8(0))
    return codes


def decode_pq(codes, books) -> np.ndarray:
    """Reconstruct (N, Lp, D) f32 from codes — the scoring oracle."""
    codes = np.asarray(codes)
    books = np.asarray(books, np.float32)
    m, k, ds = books.shape
    rec = books[np.arange(m)[None, None, :], codes.astype(np.int64)]
    return rec.reshape(*codes.shape[:2], m * ds)


def _pq_chunk(lut, qmask_f, codes_c, pmc):
    """Score one doc chunk from the LUT: (B,Lq,M,K)x(C,Lp,M) -> (B,C).

    sim[b,c,l,p] = sum_m lut[b,l,m,codes[c,p,m]] — M gathers along the
    K=256 axis (unrolled: M is small and static), accumulated in f32."""
    b, lq, m, k = lut.shape
    c, lp, _ = codes_c.shape
    flat = codes_c.reshape(c * lp, m)
    sim = jnp.zeros((b, lq, c * lp), jnp.float32)
    for j in range(m):
        # (B, Lq, K) gathered at (C*Lp,) positions -> (B, Lq, C*Lp)
        sim = sim + jnp.take(lut[:, :, j], flat[:, j].astype(jnp.int32),
                             axis=-1)
    sim = sim.reshape(b, lq, c, lp).transpose(0, 2, 1, 3)  # (B, C, Lq, Lp)
    sim = jnp.where(pmc[None, :, None, :], sim, NEG_FILL)
    mx = jnp.max(sim, axis=-1)
    mx = mx * jnp.any(pmc, axis=-1)[None, :, None].astype(mx.dtype)
    mx = mx * qmask_f[:, None, :]
    return jnp.sum(mx, axis=-1)


@functools.partial(jax.jit, static_argnames=("chunk_p",))
def maxsim_pq_xla(Q, codes, qmask, pmask, books, chunk_p: int = 128):
    """Masked MaxSim over a PQ index: (B, N) f32 scores.

    Args:
      Q:      (B, Lq, D) float queries
      codes:  (N, Lp, M) uint8 PQ codes
      qmask:  (B, Lq) bool
      pmask:  (N, Lp) bool
      books:  (M, K, D/M) f32 codebooks
      chunk_p: doc-axis chunk (bounds the (B, chunk, Lq, Lp) transient,
        same blocking as maxsim_xla)
    """
    Q = Q.astype(jnp.float32)
    qmask_f = qmask.astype(jnp.float32)
    pmask = pmask.astype(bool)
    m, k, ds = books.shape
    b, lq, d = Q.shape
    # per-(query-token, subspace) lookup table: ONE MXU einsum per batch
    lut = jnp.einsum("blms,mks->blmk", Q.reshape(b, lq, m, ds),
                     books.astype(jnp.float32),
                     preferred_element_type=jnp.float32)

    pn = codes.shape[0]
    chunk_p = min(chunk_p, pn)
    n_chunks = -(-pn // chunk_p)
    pad = n_chunks * chunk_p - pn
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0), (0, 0)))
        pmask = jnp.pad(pmask, ((0, pad), (0, 0)))
    cc = codes.reshape(n_chunks, chunk_p, *codes.shape[1:])
    pmc = pmask.reshape(n_chunks, chunk_p, pmask.shape[1])

    if n_chunks == 1:
        out = _pq_chunk(lut, qmask_f, cc[0], pmc[0])[:, None, :]
    else:
        out = jax.lax.map(lambda args: _pq_chunk(lut, qmask_f, *args),
                          (cc, pmc))
        out = jnp.transpose(out, (1, 0, 2))
    return out.reshape(b, n_chunks * chunk_p)[:, :pn]
