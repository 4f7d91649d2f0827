"""Masked MaxSim late-interaction scoring — XLA path + numpy oracle.

Scoring semantics (parity with reference ``evaluator/retrieval.py:166-213``):

    score[q, p] = sum_n qmask[q, n] * relu-less max_m sim[q, p, n, m]

where ``sim = Q . P^T`` per token pair, invalid doc tokens are filled with
``-1e4`` before the max (:198), documents with **no** valid token score 0
(:203-204), and invalid query tokens are zeroed by multiplying with the float
qmask (:207). Everything is computed in float32 (:176-177).

TPU notes: the XLA path chunks the doc axis with ``lax.map`` (static chunk
count) so the (Q, C, Lq, Lp) similarity tensor never exceeds one chunk —
mirroring the reference's ``chunk_p`` loop (:187) but trace-once compilable.
The fused Pallas kernel (``evdr_tpu.ops.pallas_maxsim``) avoids materializing
the similarity tensor in HBM entirely.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NEG_FILL = -1e4  # reference uses -1e4, not -inf (retrieval.py:185)


def maxsim_numpy(Q, P, qmask, pmask) -> np.ndarray:
    """Pure-numpy brute-force oracle. O(Q*P*Lq*Lp*D) — tests only."""
    Q = np.asarray(Q, dtype=np.float32)
    P = np.asarray(P, dtype=np.float32)
    qmask = np.asarray(qmask, dtype=bool)
    pmask = np.asarray(pmask, dtype=bool)
    sim = np.einsum("qnd,cmd->qcnm", Q, P)
    sim = np.where(pmask[None, :, None, :], sim, NEG_FILL)
    mx = sim.max(axis=-1)
    mx = mx * pmask.any(axis=-1)[None, :, None].astype(np.float32)
    mx = mx * qmask[:, None, :].astype(np.float32)
    return mx.sum(axis=-1)


def _maxsim_chunk(Q, qmask_f, Pc, pmc):
    """Score one doc chunk: (Q,Lq,D) x (C,Lp,D) -> (Q,C)."""
    sim = jnp.einsum(
        "qnd,cmd->qcnm", Q, Pc, preferred_element_type=jnp.float32
    )
    sim = jnp.where(pmc[None, :, None, :], sim, NEG_FILL)
    mx = jnp.max(sim, axis=-1)
    mx = mx * jnp.any(pmc, axis=-1)[None, :, None].astype(mx.dtype)
    mx = mx * qmask_f[:, None, :]
    return jnp.sum(mx, axis=-1)


@functools.partial(jax.jit, static_argnames=("chunk_p",))
def maxsim_xla(Q, P, qmask, pmask, chunk_p: int = 128):
    """Differentiable chunked MaxSim in plain XLA.

    Args:
      Q:     (Qn, Lq, D) float
      P:     (Pn, Lp, D) float
      qmask: (Qn, Lq) bool
      pmask: (Pn, Lp) bool
      chunk_p: doc-axis chunk size (static).
    Returns:
      (Qn, Pn) float32 scores.
    """
    Q = Q.astype(jnp.float32)
    P = P.astype(jnp.float32)
    qmask_f = qmask.astype(jnp.float32)
    pmask = pmask.astype(bool)

    pn = P.shape[0]
    chunk_p = min(chunk_p, pn)
    n_chunks = -(-pn // chunk_p)
    pad = n_chunks * chunk_p - pn
    if pad:
        P = jnp.pad(P, ((0, pad), (0, 0), (0, 0)))
        pmask = jnp.pad(pmask, ((0, pad), (0, 0)))  # padded docs: no valid token -> 0

    Pc = P.reshape(n_chunks, chunk_p, *P.shape[1:])
    pmc = pmask.reshape(n_chunks, chunk_p, pmask.shape[1])

    if n_chunks == 1:
        out = _maxsim_chunk(Q, qmask_f, Pc[0], pmc[0])[:, None, :]
    else:
        out = jax.lax.map(
            lambda args: _maxsim_chunk(Q, qmask_f, *args), (Pc, pmc)
        )  # (n_chunks, Qn, chunk)
        out = jnp.transpose(out, (1, 0, 2))
    scores = out.reshape(Q.shape[0], n_chunks * chunk_p)
    return scores[:, :pn]


def maxsim(Q, P, qmask, pmask, chunk_p: int = 128, impl: str = "auto",
           compute_dtype=None):
    """Dispatching MaxSim scorer.

    impl: 'auto' (Pallas on TPU, XLA otherwise), 'xla', or 'pallas'.
    compute_dtype: Pallas-kernel accumulation dtype; None keeps the kernel
    default (bfloat16 for throughput). Metric-bearing paths (eval, teacher
    precompute) pass float32 so reported Recall/NDCG are not affected by
    bf16-rounded near-tie rankings (the reference evaluates in fp32,
    evaluator/retrieval.py:176-177).
    """
    if impl == "xla":
        return maxsim_xla(Q, P, qmask, pmask, chunk_p=chunk_p)
    if impl == "pallas":
        from evdr_tpu.ops.pallas_maxsim import maxsim_pallas

        kw = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
        return maxsim_pallas(Q, P, qmask, pmask, **kw)
    # auto
    platform = jax.default_backend()
    if platform in ("tpu", "axon"):
        from evdr_tpu.ops.pallas_maxsim import maxsim_pallas

        kw = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
        return maxsim_pallas(Q, P, qmask, pmask, **kw)
    return maxsim_xla(Q, P, qmask, pmask, chunk_p=chunk_p)


# ---------------------------------------------------------------------------
# Legacy list-based APIs (parity with BaseVisualRetrieverProcessor,
# evaluator/retrieval.py:78-150): ragged python lists in, dense scores out.
# ---------------------------------------------------------------------------

def score_single_vector(qs: Sequence, ps: Sequence) -> np.ndarray:
    """Single-vector dot-product scores (reference retrieval.py:78-99)."""
    if len(qs) == 0:
        raise ValueError("No queries provided")
    if len(ps) == 0:
        raise ValueError("No passages provided")
    q = jnp.asarray(np.stack([np.asarray(x) for x in qs]), dtype=jnp.float32)
    p = jnp.asarray(np.stack([np.asarray(x) for x in ps]), dtype=jnp.float32)
    return np.asarray(jnp.einsum("bd,cd->bc", q, p))


def score_multi_vector(
    qs: Sequence,
    ps: Sequence,
    batch_size: int = 128,
    chunk_p: int = 128,
    impl: str = "auto",
    timing: Optional[list] = None,
) -> np.ndarray:
    """Ragged list-of-(Li,D) scorer (reference retrieval.py:101-150).

    The reference left-pads with zeros and does NOT mask them — a zero token's
    dot product is 0 which can exceed true max sims only if all sims < 0; we
    reproduce exact semantics by padding with zeros and treating all positions
    as valid (mask all-True), matching its einsum/max/sum behaviour.
    """
    if len(qs) == 0:
        raise ValueError("No queries provided")
    if len(ps) == 0:
        raise ValueError("No passages provided")

    def pad_right(seqs):
        seqs = [np.asarray(s, dtype=np.float32) for s in seqs]
        seqs = [s[None, :] if s.ndim == 1 else s for s in seqs]
        L = max(s.shape[0] for s in seqs)
        d = seqs[0].shape[-1]
        out = np.zeros((len(seqs), L, d), dtype=np.float32)
        for i, s in enumerate(seqs):
            # left padding (reference left_padding, retrieval.py:30-45);
            # position is irrelevant to max/sum but kept for parity.
            out[i, L - s.shape[0]:] = s
        return out

    import time as _time

    rows = []
    for i in range(0, len(qs), batch_size):
        qb = pad_right(qs[i : i + batch_size])
        qm = np.ones(qb.shape[:2], dtype=bool)
        cols = []
        for j in range(0, len(ps), batch_size):
            pb = pad_right(ps[j : j + batch_size])
            pm = np.ones(pb.shape[:2], dtype=bool)
            # unmasked semantics: zero pad tokens participate in the max,
            # exactly like the reference's unmasked einsum (:136)
            t0 = _time.perf_counter()
            sc = maxsim(qb, pb, qm, pm, chunk_p=chunk_p, impl=impl)
            sc = np.asarray(sc)  # host fetch = honest per-batch-pair timing
            if timing is not None:
                # per-batch-pair kernel wall time (reference retrieval.py:135-145)
                timing.append(_time.perf_counter() - t0)
            cols.append(sc)
        rows.append(np.concatenate(cols, axis=1))
    scores = np.concatenate(rows, axis=0)
    assert scores.shape[0] == len(qs)
    return scores.astype(np.float32)
