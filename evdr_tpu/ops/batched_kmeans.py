"""Batched per-page k-means on device: (N, Lp, D) -> (N, K, D) centers.

Corpus-scale summary building for pruned retrieval (reference semantics being
accelerated: exact rescoring in evaluator/retrieval.py:166-213 — the summary
stage is our TPU-native addition, PLAID-style). The per-page k-means problems
are tiny (Lp tokens, K centers) but there are N ~ 10^5..10^6 of them, so the
whole corpus is solved AT ONCE as batched dense algebra:

- init: farthest-point ("greedy k-means++") seeding, batched over pages via a
  ``lax.fori_loop`` carrying a running min-distance map (N, Lp);
- Lloyd iterations: assignment by one argmin over K, center update as a
  one-hot (N, Lp, K)^T x (N, Lp, D) matmul — both map onto the MXU;
- masked tokens are excluded from sampling (distance 0) and from the update
  (weight 0); empty clusters keep their previous center.

Everything is static-shaped and jitted once per (chunk, Lp, D, K, iters);
callers chunk the page axis on the host to bound transfer/HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans_chunk(P, pmask, k: int, iters: int, seed):
    """One chunk of pages: P (n, lp, d) fp32, pmask (n, lp) bool."""
    n, lp, d = P.shape
    P = P.astype(jnp.float32)
    valid = pmask.astype(jnp.float32)                       # (n, lp)
    pn2 = jnp.sum(P * P, axis=-1)                           # (n, lp)

    # --- farthest-point init -------------------------------------------------
    # first center: a random valid token per page (gumbel-argmax over valid)
    key = jax.random.PRNGKey(seed)
    g = jax.random.gumbel(key, (n, lp))
    idx0 = jnp.argmax(jnp.where(pmask, g, -jnp.inf), axis=1)          # (n,)
    c0 = jnp.take_along_axis(P, idx0[:, None, None], axis=1)[:, 0]    # (n, d)

    def seed_body(j, carry):
        centers, d2min = carry
        cj = jax.lax.dynamic_slice_in_dim(centers, j - 1, 1, axis=1)[:, 0]
        d2 = pn2 - 2.0 * jnp.einsum("nld,nd->nl", P, cj) + jnp.sum(cj * cj, -1)[:, None]
        d2min = jnp.minimum(d2min, d2)
        # farthest VALID token becomes the next center
        idx = jnp.argmax(jnp.where(pmask, d2min, -jnp.inf), axis=1)
        cnew = jnp.take_along_axis(P, idx[:, None, None], axis=1)     # (n,1,d)
        centers = jax.lax.dynamic_update_slice_in_dim(centers, cnew, j, axis=1)
        return centers, d2min

    centers = jnp.zeros((n, k, d), jnp.float32).at[:, 0].set(c0)
    if k > 1:
        centers, _ = jax.lax.fori_loop(
            1, k, seed_body, (centers, jnp.full((n, lp), jnp.inf)))

    # --- Lloyd iterations ----------------------------------------------------
    def lloyd_body(_, centers):
        dots = jnp.einsum("nld,nkd->nlk", P, centers,
                          preferred_element_type=jnp.float32)
        cn2 = jnp.sum(centers * centers, axis=-1)                     # (n, k)
        d2 = pn2[:, :, None] - 2.0 * dots + cn2[:, None, :]
        assign = jnp.argmin(d2, axis=-1)                              # (n, lp)
        w = jax.nn.one_hot(assign, k, dtype=jnp.float32) * valid[:, :, None]
        counts = jnp.sum(w, axis=1)                                   # (n, k)
        sums = jnp.einsum("nlk,nld->nkd", w, P,
                          preferred_element_type=jnp.float32)
        return jnp.where(counts[..., None] > 0,
                         sums / jnp.maximum(counts[..., None], 1.0), centers)

    centers = jax.lax.fori_loop(0, iters, lloyd_body, centers)

    # final occupancy mask (which centers own >=1 valid token)
    dots = jnp.einsum("nld,nkd->nlk", P, centers,
                      preferred_element_type=jnp.float32)
    cn2 = jnp.sum(centers * centers, axis=-1)
    assign = jnp.argmin(pn2[:, :, None] - 2.0 * dots + cn2[:, None, :], axis=-1)
    w = jax.nn.one_hot(assign, k, dtype=jnp.float32) * valid[:, :, None]
    cmask = jnp.sum(w, axis=1) > 0
    # pages with zero valid tokens: all-masked, zero centers
    any_valid = jnp.any(pmask, axis=1)
    cmask = cmask & any_valid[:, None]
    centers = centers * cmask[..., None].astype(centers.dtype)
    return centers, cmask


def batched_kmeans(P, pmask, k: int, iters: int = 5, seed: int = 0,
                   chunk_pages: int = 16384):
    """Per-page k-means over the whole corpus, chunked along the page axis.

    Accepts host or device arrays of any float dtype (computes in fp32).
    Returns host float32 ``(N, k, D)`` centers and ``(N, k)`` bool occupancy.
    """
    n = P.shape[0]
    chunk_pages = min(chunk_pages, n)
    outs, masks = [], []
    for s in range(0, n, chunk_pages):
        e = min(s + chunk_pages, n)
        # device inputs slice on device (no host round trip); host inputs ship
        # in their storage dtype (bf16 indexes transfer at 2 bytes/elt — the
        # fp32 upcast happens inside the kernel)
        Pc, mc = jnp.asarray(P[s:e]), jnp.asarray(pmask[s:e])
        pad = chunk_pages - (e - s)
        if pad:  # pad the tail chunk: ONE compiled shape for the whole build
            Pc = jnp.pad(Pc, ((0, pad), (0, 0), (0, 0)))
            mc = jnp.pad(mc, ((0, pad), (0, 0)))
        c, m = _kmeans_chunk(Pc, mc, k=k, iters=iters, seed=seed + s)
        outs.append(np.asarray(c)[: e - s])
        masks.append(np.asarray(m)[: e - s])
    return np.concatenate(outs, axis=0), np.concatenate(masks, axis=0)
