"""Two-stage pruned MaxSim retrieval (PLAID-style candidate generation).

Late-interaction scoring over every page is O(N * Lp) per query token; PLAID
(Santhanam et al., 2022) showed a cheap first stage over compressed
representations prunes the corpus to a small candidate set with negligible
recall loss. Our TPU-native variant:

1. BUILD: each page's tokens are summarized by ``k_centroids`` k-means++
   centers (per-page, not a global codebook — pages are small), giving a
   summary index ~Lp/k_centroids times cheaper to score.
2. STAGE 1: fused MaxSim over the summary index -> top-``n_candidates`` pages
   per query (device-side).
3. STAGE 2: gather the candidates' FULL token sets and rerank with exact
   masked MaxSim (batched einsum over per-query candidate sets).

Exactness is probabilistic (stage 1 can miss); measure recall-vs-exact with
``pruned_recall`` and size ``n_candidates`` accordingly (the bench uses
n_candidates ~ 1-5% of the corpus for >0.99 top-10 recall).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evdr_tpu.ops.maxsim import NEG_FILL


def build_summary_tokens(P: np.ndarray, pmask: np.ndarray, k_centroids: int = 4,
                         iters: int = 5, seed: int = 0,
                         chunk_pages: int = 16384
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-page k-means summaries: (N, Lp, D) -> (N, k, D) + occupancy mask.

    Corpus-scale device build: all N per-page k-means problems are solved at
    once as batched matmuls (``ops/batched_kmeans.py``), chunked along the
    page axis — no per-page host loop, runs at 1M pages. Pages with fewer
    valid tokens than k get zero centers (masked out). Summaries are scored
    like tokens: L2-normalized.
    """
    from evdr_tpu.ops.batched_kmeans import batched_kmeans

    S, smask = batched_kmeans(P, pmask, k=k_centroids, iters=iters, seed=seed,
                              chunk_pages=chunk_pages)
    norms = np.linalg.norm(S, axis=-1, keepdims=True)
    S = np.where(norms > 0, S / np.maximum(norms, 1e-12), 0.0).astype(np.float32)
    return S, smask


def build_summary_tokens_from_pq(codes, books, pmask, k_centroids: int = 4,
                                 iters: int = 5, seed: int = 0,
                                 chunk_pages: int = 16384,
                                 expanded: bool = False
                                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Summaries for a PQ-only store WITHOUT materializing the full
    reconstruction: decode ``chunk_pages`` of codes at a time and k-means
    each chunk (page-independent, so chunking is exact). A one-shot
    ``decode_pq`` of a 4M-page corpus is a 16 GB f32 host spike; this peaks
    at chunk_pages x Lp x D f32 (default 128 MB) plus the (N, k, D)
    summaries themselves. Used by the engine's from_npz/compact paths for
    ``dtype='pq'`` + ``prune_centroids``."""
    from evdr_tpu.ops.pq import decode_pq

    n = codes.shape[0]
    outs, masks = [], []
    for s in range(0, n, chunk_pages):
        e = min(s + chunk_pages, n)
        rec = decode_pq(np.asarray(codes[s:e]), books, expanded=expanded)
        S, sm = build_summary_tokens(rec, np.asarray(pmask[s:e]),
                                     k_centroids=k_centroids, iters=iters,
                                     seed=seed + s, chunk_pages=chunk_pages)
        outs.append(S)
        masks.append(sm)
    return np.concatenate(outs, axis=0), np.concatenate(masks, axis=0)


def _rerank_block(Q, qmask, P, pmask, cand_idx, k: int, scales=None,
                  books=None, pq_decode: str = "onehot"):
    """One query block of the exact candidate rerank (see rerank_candidates)."""
    Pg = jnp.take(P, cand_idx, axis=0)        # (nq, C, Lp, D) or PQ codes
    if books is not None:
        # PQ index: P holds (N, Lp, M) uint8 codes — reconstruct only the
        # gathered candidates (same footprint as the float gather). Compact
        # (M, K, D/M) books concatenate subspaces; expanded (M, K, D) OPQ
        # books (ops/pq.expand_books) sum full-width vectors.
        m = books.shape[0]
        if pq_decode == "onehot":
            # resolve codes as one-hot x codebook MXU dots instead of row
            # gathers: nq x C x Lp x M take-rows is hundreds of millions of
            # scalar gathers at capacity shapes and TPUs have no gather
            # unit. Same math bit-for-bit in f32 (one-hot entries are
            # exact). Transient: (rows, K) one-hot per subspace at the
            # caller's chunk_q — bounded by the query chunking.
            nq_, c_, lp_, _ = Pg.shape
            codes2 = Pg.reshape(nq_ * c_ * lp_, m).astype(jnp.int32)
            kk_ = books.shape[1]
            iota = jax.lax.broadcasted_iota(jnp.int32,
                                            (codes2.shape[0], kk_), 1)
            rec = [jax.lax.dot_general(
                       (iota == codes2[:, j:j + 1]).astype(jnp.float32),
                       books[j].astype(jnp.float32),
                       dimension_numbers=(((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.float32)
                   for j in range(m)]
            if m > 1 and books.shape[-1] == Q.shape[-1]:
                full = functools.reduce(jnp.add, rec)
            else:
                full = jnp.concatenate(rec, axis=-1)
            Pg = full.reshape(nq_, c_, lp_, -1)
        else:
            rec = [jnp.take(books[j], Pg[..., j].astype(jnp.int32), axis=0)
                   for j in range(m)]
            if m > 1 and books.shape[-1] == Q.shape[-1]:
                Pg = functools.reduce(jnp.add, rec)  # (nq, C, Lp, D)
            else:
                Pg = jnp.concatenate(rec, axis=-1)   # (nq, C, Lp, D)
    elif Pg.dtype == jnp.uint8:
        # packed-int4 index (ops/int4.py): unpack only the gathered
        # candidates (token-pair layout -> original token order);
        # per-token scales apply below like int8's
        from evdr_tpu.ops.int4 import unpack_int4_jnp

        Pg = unpack_int4_jnp(Pg, lp=pmask.shape[-1])
    if scales is not None:
        Pg = Pg.astype(jnp.float32) * jnp.take(scales, cand_idx,
                                               axis=0)[..., None]
    pmg = jnp.take(pmask, cand_idx, axis=0)   # (nq, C, Lp)
    sim = jnp.einsum("qnd,qcmd->qcnm", Q.astype(jnp.float32),
                     Pg.astype(jnp.float32), preferred_element_type=jnp.float32)
    sim = jnp.where(pmg[:, :, None, :], sim, NEG_FILL)
    mx = jnp.max(sim, axis=-1)
    any_valid = jnp.any(pmg, axis=-1)         # (nq, C)
    mx = mx * any_valid[:, :, None].astype(mx.dtype)
    mx = mx * qmask.astype(mx.dtype)[:, None, :]
    scores = jnp.sum(mx, axis=-1)             # (nq, C)
    # all-invalid candidates (index-padding rows, or docs with no valid
    # token) rank LAST, matching the exact top-k path's -inf masking
    # (parallel/topk.py) — a 0 score here could outrank real docs whose
    # exact MaxSim is negative
    scores = jnp.where(any_valid, scores, -jnp.inf)
    vals, pos = jax.lax.top_k(scores, min(k, scores.shape[-1]))
    return vals, jnp.take_along_axis(cand_idx, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "chunk_q", "pq_decode"))
def rerank_candidates(Q, qmask, P, pmask, cand_idx, k: int, scales=None,
                      chunk_q: int = 32, books=None,
                      pq_decode: str = "onehot"):
    """Exact masked MaxSim over per-query candidate sets.

    Q (nq, Lq, D); P (N, Lp, D); cand_idx (nq, C) -> top-k (values, GLOBAL doc
    indices) among the candidates. ``scales`` dequantizes int8 indexes
    (ops/quantize.py) after the gather; ``books`` reconstructs PQ candidates
    (ops/pq.py) — "exact" then means exact over the reconstruction.
    ``pq_decode`` defaults to 'onehot' (bit-identical to 'take'): at the
    4M-page capacity shapes onehot beat the take-row gather in every cell
    (+10% at n_cand=1024 up to +83% at 16384 — capacity_4m, RESULTS.md),
    because candidate-decode volume grows with n_cand and TPUs resolve
    one-hot MXU dots far faster than scalar gathers.

    Chunked over queries (``lax.map`` blocks of ``chunk_q``): the gathered
    candidate tokens are upcast to f32 for the exact einsum, which at
    batch 256 x n_cand 2048 x Lp 64 would materialize ~17 GB in one shot
    (observed HBM OOM); per-block the footprint is chunk_q/nq of that while
    the whole rerank stays inside one compiled program.
    """
    nq = Q.shape[0]
    kk = min(k, cand_idx.shape[1])
    if nq <= chunk_q:
        return _rerank_block(Q, qmask, P, pmask, cand_idx, k, scales, books,
                             pq_decode)
    nb = -(-nq // chunk_q)
    pad = nb * chunk_q - nq

    def pad0(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x

    Qb = pad0(Q).reshape(nb, chunk_q, *Q.shape[1:])
    qmb = pad0(qmask).reshape(nb, chunk_q, *qmask.shape[1:])
    cb = pad0(cand_idx).reshape(nb, chunk_q, cand_idx.shape[1])

    def body(args):
        q, qm, c = args
        return _rerank_block(q, qm, P, pmask, c, k, scales, books, pq_decode)

    vals, idx = jax.lax.map(body, (Qb, qmb, cb))
    return (vals.reshape(nb * chunk_q, kk)[:nq],
            idx.reshape(nb * chunk_q, kk)[:nq])


@functools.partial(jax.jit,
                   static_argnames=("k", "n_cand", "impl", "pq_decode"))
def pruned_topk_fused(Q, qmask, P, pmask, S, smask, k: int, n_cand: int,
                      impl: str = "pallas", scales=None, sscales=None,
                      books=None, pq_decode: str = "onehot"):
    """Both pruning stages in ONE compiled program (single-device serving).

    Remote/tunneled backends pay ~30ms per dispatch; splitting candidate
    generation and reranking across two dispatches caps throughput at
    ~1/(2*RTT) regardless of compute. Fusing them restores the full
    summary-index speedup.

    ``scales``/``sscales`` support int8-quantized full/summary indexes
    (ops/quantize.py): stage 1 scores the quantized summary with the int8
    kernels, stage 2 dequantizes only the gathered candidates.
    """
    # same impl dispatch as the sharded layer (incl. int8 kernel variants)
    from evdr_tpu.parallel.topk import _local_scores

    sc = _local_scores(Q, qmask, S, smask, 128, impl, sscales)
    valid = jnp.any(smask, axis=-1)[None, :]
    sc = jnp.where(valid, sc, -jnp.inf)
    if n_cand > 128:
        _, cand = jax.lax.approx_max_k(sc, n_cand, recall_target=0.95)
    else:
        _, cand = jax.lax.top_k(sc, n_cand)
    # adaptive rerank query-chunk: the decoded-candidate block is
    # (chunk_q, n_cand, Lp, D) f32 — at n_cand 16384 x Lp 16 the legacy
    # chunk_q=32 would materialize 4.3 GB per block. Bound it to ~512 MB
    # (the onehot decode's (rows, K) one-hot planes add K*8 bytes/row and
    # tighten the bound further). Shapes are static under jit, so this is
    # trace-time arithmetic.
    lp, d = pmask.shape[-1], Q.shape[-1]
    row_bytes = lp * d * 4
    if pq_decode == "onehot" and books is not None:
        row_bytes += lp * books.shape[1] * 8
    chunk_q = max(1, min(32, 512 * 1024 ** 2 // max(1, n_cand * row_bytes)))
    return rerank_candidates(Q, qmask, P, pmask, cand, k=k, scales=scales,
                             chunk_q=chunk_q, books=books,
                             pq_decode=pq_decode)


def pruned_recall(exact_idx: np.ndarray, pruned_idx: np.ndarray) -> float:
    """Fraction of exact top-k docs recovered by the pruned search."""
    hits, total = 0, 0
    for e, p in zip(np.asarray(exact_idx), np.asarray(pruned_idx)):
        hits += len(set(e.tolist()) & set(p.tolist()))
        total += len(e)
    return hits / max(total, 1)
