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


def _kmeans_np(X: np.ndarray, k: int, iters: int, rng,
               init: np.ndarray | None = None) -> np.ndarray:
    """Plain-numpy Lloyd with kmeans++ seeding (host-side, training-time).

    Small by construction: X is a <=``sample``-row slice of one subspace
    (ds = D/M dims). Empty clusters re-seed from the farthest points.
    ``init`` warm-starts Lloyd from existing centers (OPQ's alternating
    refits), skipping the kmeans++ pass.
    """
    n = X.shape[0]
    if n <= k:
        # fewer vectors than centroids: every vector is its own centroid,
        # the rest duplicate row 0 (harmless — never the argmin winner)
        reps = np.concatenate([X, np.repeat(X[:1], k - n, axis=0)], axis=0)
        return reps.astype(np.float32)
    if init is not None:
        centers = np.array(init, np.float32, copy=True)
    else:
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


def _pooled_tokens(P, pmask, m: int, sample: int, rng) -> np.ndarray:
    """Pool valid tokens across docs + uniform-subsample: (n_tok, D) f32."""
    P = np.asarray(P, dtype=np.float32)
    n, lp, d = P.shape
    if d % m:
        raise ValueError(f"dim {d} must divide into m={m} subspaces")
    toks = P.reshape(n * lp, d)
    if pmask is not None:
        toks = toks[np.asarray(pmask, bool).reshape(-1)]
    if toks.shape[0] == 0:
        raise ValueError("no valid tokens to train PQ on")
    if toks.shape[0] > sample:
        toks = toks[rng.choice(toks.shape[0], sample, replace=False)]
    return toks


def _fit_books(toks: np.ndarray, m: int, k: int, iters: int, rng,
               init: np.ndarray | None = None) -> np.ndarray:
    """Per-subspace kmeans over pooled tokens: (M, K, D/M) f32."""
    ds = toks.shape[1] // m
    sub = toks.reshape(-1, m, ds)
    return np.stack([
        _kmeans_np(np.ascontiguousarray(sub[:, j]), k, iters, rng,
                   init=None if init is None else init[j])
        for j in range(m)]).astype(np.float32)


def _encode_tokens(toks: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n_tok, D) float -> (n_tok, M) uint8 nearest-centroid codes."""
    m, k, ds = books.shape
    sub = toks.reshape(-1, m, ds)
    codes = np.empty((toks.shape[0], m), np.uint8)
    cnorm = (books * books).sum(-1)  # (M, K)
    for j in range(m):
        x = sub[:, j]
        dist = cnorm[j][None, :] - 2.0 * (x @ books[j].T)
        codes[:, j] = np.argmin(dist, axis=1).astype(np.uint8)
    return codes


def train_pq(P, pmask=None, m: int = 16, k: int = 256, iters: int = 10,
             sample: int = 65536, seed: int = 0) -> np.ndarray:
    """Fit per-subspace codebooks on the valid tokens: (M, K, D/M) f32.

    Tokens are pooled across docs (masked ones dropped); at most ``sample``
    tokens train each subspace (uniform subsample — PQ codebooks saturate
    long before full-corpus kmeans pays off)."""
    rng = np.random.default_rng(seed)
    toks = _pooled_tokens(P, pmask, m, sample, rng)
    return _fit_books(toks, m, k, iters, rng)


def train_opq(P, pmask=None, m: int = 16, k: int = 256, iters: int = 10,
              opq_iters: int = 8, sample: int = 65536, seed: int = 0
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Optimized PQ (OPQ-NP): learn an orthogonal rotation R that the
    codebooks quantize better, by alternating (a) codebook refit on the
    rotated tokens and (b) the orthogonal-Procrustes solve
    ``R = argmin ||X R^T - decode(encode(X R^T))||_F`` (SVD of X^T X̂).

    MaxSim is rotation-invariant (<Rq, Rd> = <q, d>), so rotated codes
    score EXACTLY like plain PQ once the rotation is folded into the
    query side — which :func:`expand_books` does once at build time, after
    which no scoring path needs to know about R at all.

    Returns ``(books, rot)``: (M, K, D/M) codebooks in the ROTATED space
    and the (D, D) rotation. Encode with ``encode_pq(P, books, rot=rot)``;
    serve with ``expand_books(books, rot)``.
    """
    rng = np.random.default_rng(seed)
    X = _pooled_tokens(P, pmask, m, sample, rng)
    d = X.shape[1]
    R = np.eye(d, dtype=np.float32)
    books = None
    for _ in range(opq_iters):
        Y = X @ R.T
        # few Lloyd iters per outer step, warm-started: OPQ converges on
        # the alternation, not on per-step kmeans accuracy
        books = _fit_books(Y, m, k, max(2, iters // 3), rng, init=books)
        Yhat = _decode_tokens(_encode_tokens(Y, books), books)
        # orthogonal Procrustes: max_R tr(R X^T Yhat) -> R = V U^T
        U, _, Vt = np.linalg.svd(X.T.astype(np.float64)
                                 @ Yhat.astype(np.float64))
        R = (U @ Vt).T.astype(np.float32)
    # final full-strength codebook fit under the converged rotation
    books = _fit_books(X @ R.T, m, k, iters, rng, init=books)
    return books, R


def expand_books(books: np.ndarray, rot: np.ndarray) -> np.ndarray:
    """Fold an OPQ rotation into the codebooks: (M, K, D/M) + (D, D) ->
    (M, K, D) full-width codebooks in the ORIGINAL (un-rotated) space.

    Derivation: sim(q, d) = <Rq, ĉ> = Σ_m <(Rq)[m-block], C[m, code_m]>
    = Σ_m <q, E[m, code_m]> with E[m,k,:] = R[m-block rows]^T @ C[m,k].
    Every downstream consumer (LUT scoring, candidate rerank, decode) then
    treats PQ as "sum of per-subspace full-D vectors" and the rotation
    disappears from the serving path entirely. Expanded books are detected
    by shape (last dim == D, impossible for compact books when M > 1);
    reconstruction = Σ_m E[m, code_m] (sum, not concat)."""
    m, k, ds = books.shape
    rot = np.asarray(rot, np.float32)
    d = rot.shape[0]
    if d != m * ds:
        raise ValueError(f"rotation dim {d} != m*ds = {m * ds}")
    # E[m,k,j] = Σ_s C[m,k,s] * R[m*ds+s, j]
    return np.einsum("mks,msj->mkj", books.astype(np.float32),
                     rot.reshape(m, ds, d)).astype(np.float32)


def books_expanded(books, d: int) -> bool:
    """True if ``books`` are full-width (M, K, D) expanded codebooks for
    token dim ``d`` (sum-decode), False for compact (M, K, D/M) (concat-
    decode). Unambiguous: compact books have last dim D/M != D for M > 1,
    and for M == 1 the two layouts coincide semantically."""
    return int(books.shape[-1]) == int(d)


def encode_pq(P, books: np.ndarray, pmask=None, rot=None) -> np.ndarray:
    """(N, Lp, D) float -> (N, Lp, M) uint8 nearest-centroid codes.

    Masked tokens encode as code 0 (they are score-inert behind pmask, same
    convention as int8's zeroed codes). ``rot`` (from :func:`train_opq`)
    rotates tokens into the codebooks' space before encoding; ``books``
    must then be the COMPACT rotated-space codebooks, not expanded ones."""
    P = np.asarray(P, dtype=np.float32)
    n, lp, d = P.shape
    m, k, ds = books.shape
    if m * ds != d:
        raise ValueError(
            f"encode_pq needs compact (M, K, D/M) books; got {books.shape} "
            f"for token dim {d} (expanded books cannot encode)")
    toks = P.reshape(n * lp, d)
    if rot is not None:
        toks = toks @ np.asarray(rot, np.float32).T
    codes = _encode_tokens(toks, books).reshape(n, lp, m)
    if pmask is not None:
        codes = np.where(np.asarray(pmask, bool)[..., None], codes,
                         np.uint8(0))
    return codes


@jax.jit
def _encode_chunk_dev(toks, books, rot):
    """One device chunk of nearest-centroid encoding: (c, D) f32 ->
    (c, M) uint8. The distance argmin runs as ONE batched MXU einsum
    (||x-c||^2 = ||c||^2 - 2<x,c> + const-in-k)."""
    if rot is not None:
        toks = toks @ rot.T
    m, k, ds = books.shape
    sub = toks.reshape(-1, m, ds)
    cn = jnp.sum(books * books, axis=-1)                    # (M, K)
    prod = jnp.einsum("cms,mks->cmk", sub, books,
                      preferred_element_type=jnp.float32)
    return jnp.argmin(cn[None] - 2.0 * prod, axis=-1).astype(jnp.uint8)


def encode_pq_device(P, books, pmask=None, rot=None,
                     chunk_tokens: int = 262_144) -> np.ndarray:
    """Corpus-scale PQ encoding on the accelerator: same contract as
    :func:`encode_pq`, computed chunk-by-chunk on device.

    The build-time split this enables: codebooks TRAIN on a 65k-token
    host sample in seconds (:func:`train_pq` / :func:`train_opq`), but
    ENCODING touches every token — at 1M pages x 16 tokens that is
    minutes of host numpy vs one batched MXU einsum per chunk here.
    Ties in the argmin may resolve differently from numpy's (floating
    summation order); both pick a true nearest centroid, so
    reconstructions are equivalent."""
    P = np.asarray(P, dtype=np.float32)
    n, lp, d = P.shape
    m, k, ds = books.shape
    if m * ds != d:
        raise ValueError(
            f"encode_pq_device needs compact (M, K, D/M) books; got "
            f"{books.shape} for token dim {d}")
    books_d = jnp.asarray(np.asarray(books, np.float32))
    rot_d = None if rot is None else jnp.asarray(np.asarray(rot, np.float32))
    toks = P.reshape(n * lp, d)
    out = np.empty((n * lp, m), np.uint8)
    chunk_tokens = min(chunk_tokens, n * lp)
    for lo in range(0, n * lp, chunk_tokens):
        hi = min(lo + chunk_tokens, n * lp)
        sl = toks[lo:hi]
        if hi - lo < chunk_tokens:
            # pad the tail chunk to the ONE compiled shape (a second
            # compile costs 40s-3min through a remote-TPU tunnel)
            sl = np.pad(sl, ((0, chunk_tokens - (hi - lo)), (0, 0)))
        out[lo:hi] = np.asarray(
            _encode_chunk_dev(jnp.asarray(sl), books_d, rot_d))[: hi - lo]
    codes = out.reshape(n, lp, m)
    if pmask is not None:
        codes = np.where(np.asarray(pmask, bool)[..., None], codes,
                         np.uint8(0))
    return codes


def encode_with_books(P, books, pmask=None, rot=None) -> np.ndarray:
    """Encode tokens against EITHER codebook layout (incremental adds).

    Compact (M, K, D/M) books (+ optional ``rot``) use the standard
    subspace encoder. Expanded (M, K, D) OPQ books encode WITHOUT the
    rotation matrix: because R is orthogonal,
    ``argmin_k ||(Rx)[m] - C[m,k]||^2 = argmin_k (||E[m,k]||^2 - 2<x, E[m,k]>)``
    — the per-subspace assignment is recoverable from the expanded books
    alone, which is what lets an engine loaded from an OPQ packed file
    (no compact books on disk) still grow."""
    P = np.asarray(P, dtype=np.float32)
    n, lp, d = P.shape
    m, k, w = books.shape
    if not (m > 1 and w == d):                  # compact layout
        return encode_pq(P, books, pmask, rot=rot)
    if rot is not None:
        raise ValueError("expanded books already carry the rotation")
    toks = P.reshape(n * lp, d)
    books = np.asarray(books, np.float32)
    cn = (books * books).sum(-1)                # (M, K)
    codes = np.empty((n * lp, m), np.uint8)
    for j in range(m):
        dist = cn[j][None, :] - 2.0 * (toks @ books[j].T)
        codes[:, j] = np.argmin(dist, axis=1).astype(np.uint8)
    codes = codes.reshape(n, lp, m)
    if pmask is not None:
        codes = np.where(np.asarray(pmask, bool)[..., None], codes,
                         np.uint8(0))
    return codes


def _decode_tokens(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n_tok, M) codes -> (n_tok, M*ds) reconstructions (compact books)."""
    m = books.shape[0]
    rec = books[np.arange(m)[None, :], codes.astype(np.int64)]
    return rec.reshape(codes.shape[0], -1)


def decode_pq(codes, books, expanded: bool = False) -> np.ndarray:
    """Reconstruct (N, Lp, D) f32 from codes — the scoring oracle.

    ``expanded=False`` (default): compact (M, K, D/M) books — subspace
    centroids CONCATENATE to a D-vector. ``expanded=True``: full-width
    (M, K, D) OPQ books (:func:`expand_books`) — per-subspace vectors SUM
    (each carries its subspace un-rotated into the original space). Packed
    files record the layout in the ``P_pq_expanded`` key; in-memory callers
    can test with :func:`books_expanded` when the token dim is known."""
    codes = np.asarray(codes)
    books = np.asarray(books, np.float32)
    m, k, w = books.shape
    if codes.shape[-1] != m:
        raise ValueError(f"codes last dim {codes.shape[-1]} != M={m}")
    gathered = books[np.arange(m)[None, None, :], codes.astype(np.int64)]
    if expanded:
        return gathered.sum(axis=2)                       # (N, Lp, D)
    return gathered.reshape(*codes.shape[:2], m * w)      # concat subspaces


def _pq_chunk(lut, qmask_f, codes_mc, pmc):
    """Score one doc chunk from the LUT: (B,Lq,M,K)x(M,C*Lp) -> (B,C).

    sim[b,c,l,p] = sum_m lut[b,l,m,codes[c,p,m]] — M gathers along the
    K=256 axis (unrolled: M is small and static), accumulated in f32.

    Codes arrive SUBSPACE-major (M leading, tokens minor): with the big
    token axis on lanes the u8 chunk tiles with NO padding. The earlier
    (C, Lp, M) layout lane-padded M=16 by 8x — a 496 MB HBM copy at 250k
    docs that, next to the gather transients, OOM'd the 16 GB chip
    (bench_artifacts/tpuq/bench_pq.out, 8/19). The reduction runs max ->
    weight -> sum directly on the (B, Lq, C, Lp) view; the old per-chunk
    transpose to (B, C, Lq, Lp) doubled the peak transient."""
    b, lq, m, k = lut.shape
    c_lp = codes_mc.shape[-1]
    c, lp = pmc.shape
    sim = jnp.zeros((b, lq, c_lp), jnp.float32)
    for j in range(m):
        # (B, Lq, K) gathered at (C*Lp,) positions -> (B, Lq, C*Lp)
        sim = sim + jnp.take(lut[:, :, j], codes_mc[j].astype(jnp.int32),
                             axis=-1)
    sim = jnp.where(pmc[None, None], sim.reshape(b, lq, c, lp), NEG_FILL)
    mx = jnp.max(sim, axis=-1)                                 # (B, Lq, C)
    mx = mx * jnp.any(pmc, axis=-1)[None, None, :].astype(mx.dtype)
    mx = mx * qmask_f[:, :, None]
    return jnp.sum(mx, axis=1)


@functools.partial(jax.jit, static_argnames=("chunk_p",))
def maxsim_pq_xla(Q, codes, qmask, pmask, books, chunk_p: int = 128):
    """Masked MaxSim over a PQ index: (B, N) f32 scores.

    Args:
      Q:      (B, Lq, D) float queries
      codes:  (N, Lp, M) uint8 PQ codes
      qmask:  (B, Lq) bool
      pmask:  (N, Lp) bool
      books:  (M, K, D/M) f32 compact codebooks, or (M, K, D) expanded
        OPQ codebooks (expand_books) — the rotation rides inside them, so
        the two layouts share every line below except the LUT einsum
      chunk_p: doc-axis chunk (bounds the (B, chunk, Lq, Lp) transient,
        same blocking as maxsim_xla)
    """
    Q = Q.astype(jnp.float32)
    qmask_f = qmask.astype(jnp.float32)
    pmask = pmask.astype(bool)
    m, k, w = books.shape
    b, lq, d = Q.shape
    # per-(query-token, subspace) lookup table: ONE MXU einsum per batch
    if w == d and m > 1:
        # expanded OPQ books: LUT[b,l,m,k] = <q, E[m,k]> over full D
        lut = jnp.einsum("bld,mkd->blmk", Q, books.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    else:
        lut = jnp.einsum("blms,mks->blmk", Q.reshape(b, lq, m, w),
                         books.astype(jnp.float32),
                         preferred_element_type=jnp.float32)

    pn, lp = pmask.shape
    # clamp the doc chunk so the per-chunk (B, Lq, C*Lp) f32 sim transient
    # stays under ~128 MB regardless of the caller's chunk_p (the gather
    # fusions materialize remat clones of it; 4096-doc chunks at B=64 built
    # four 1 GB clones and OOM'd — bench_artifacts/tpuq/bench_pq.out)
    budget_elems = (128 << 20) // 4
    chunk_cap = max(1, budget_elems // max(1, b * lq * lp))
    chunk_p = min(chunk_p, chunk_cap, pn)
    n_chunks = -(-pn // chunk_p)
    pad = n_chunks * chunk_p - pn
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0), (0, 0)))
        pmask = jnp.pad(pmask, ((0, pad), (0, 0)))
    # subspace-major flat codes: (M, n_chunks, C*Lp) — see _pq_chunk
    cm = codes.transpose(2, 0, 1).reshape(m, n_chunks, chunk_p * lp)
    pmc = pmask.reshape(n_chunks, chunk_p, lp)

    if n_chunks == 1:
        out = _pq_chunk(lut, qmask_f, cm[:, 0], pmc[0])[:, None, :]
    else:
        out = jax.lax.map(lambda args: _pq_chunk(lut, qmask_f, *args),
                          (cm.transpose(1, 0, 2), pmc))
        out = jnp.transpose(out, (1, 0, 2))
    return out.reshape(b, n_chunks * chunk_p)[:, :pn]
