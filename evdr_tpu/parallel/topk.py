"""Sharded MaxSim scoring and device-side top-k retrieval.

Design (BASELINE config 5, 1M-page corpus): the index lives doc-sharded across
the mesh; queries replicate. Each device scores its local shard with the fused
kernel, takes a LOCAL top-k, and only (k x world) candidate (score, docid)
pairs cross the interconnect via all_gather — never the full (Q, N) score
matrix. A final tiny top-k merges candidates. This is exact: global top-k is
contained in the union of per-shard top-ks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evdr_tpu.ops.maxsim import maxsim_xla
from evdr_tpu.parallel.mesh import DOC_AXIS, DP_AXIS
from evdr_tpu.parallel.sharded_index import ShardedIndex


def _local_scores(Q, qmask, P_loc, pm_loc, chunk_p: int, impl: str,
                  scales=None, books=None):
    if books is not None:
        # product-quantized index: P_loc holds (N_loc, Lp, M) uint8 codes,
        # books the replicated compact (M, K, D/M) or expanded OPQ (M, K, D)
        # codebooks (ops/pq.py). Serving goes through the fused decode-in-
        # VMEM kernel — the XLA LUT-gather path measured 17.4 q/s on chip vs
        # 2,561 for the fused bf16 tier at the same shape (TPUs have no fast
        # gather; bench_artifacts/tpuq/bench_pq2.out) and stays as the
        # portable impl="xla" fallback.
        if impl == "pallas_q8":
            from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_pqfull

            return maxsim_pallas_pqfull(Q, P_loc, qmask, pm_loc, books)
        if impl == "pallas":
            from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_pq

            return maxsim_pallas_pq(Q, P_loc, qmask, pm_loc, books)
        from evdr_tpu.ops.pq import maxsim_pq_xla

        return maxsim_pq_xla(Q, P_loc, qmask, pm_loc, books, chunk_p=chunk_p)
    if scales is not None and P_loc.dtype == jnp.uint8:
        # packed-int4 index (ops/int4.py): token-pair uint8 codes + per-
        # token scales. The Pallas kernel unpacks in VMEM (the packed
        # stream is the HBM win); XLA fallback unpacks chunk-by-chunk.
        if impl == "pallas_q8":
            from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int4full

            # default tiles: _auto_rows (one q-block per batch; 137.7 vs
            # 134.2 TFLOP/s index-variant, i4x_sweep_smalllp) composed with
            # the small-Lp VMEM clamp (_clamp_int4_db) — legal everywhere,
            # no manual flags (vs ~106 at the old 2048-row serving tile)
            return maxsim_pallas_int4full(Q, P_loc, scales, qmask, pm_loc)
        if impl == "pallas":
            from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int4

            return maxsim_pallas_int4(Q, P_loc, scales, qmask, pm_loc)
        from evdr_tpu.ops.int4 import maxsim_int4_xla

        return maxsim_int4_xla(Q, P_loc, scales, qmask, pm_loc,
                               chunk_p=chunk_p)
    if scales is not None:
        # int8-quantized index (ops/quantize.py)
        if impl == "pallas_q8":
            # queries quantized too: int8 x int8 MXU dot (2x bf16 peak).
            # Default tiles = the kernel's _auto_rows policy (one q-block
            # covers the batch, cap 8192): 170.1 TFLOP/s vs 120.8 at the
            # old rows=2048 serving workaround (a stale f32-epilogue-era
            # VMEM limit; i8f_sweep_smalllp.out swept it away).
            from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int8full

            return maxsim_pallas_int8full(Q, P_loc, scales, qmask, pm_loc)
        if impl == "pallas":
            from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int8

            return maxsim_pallas_int8(Q, P_loc, scales, qmask, pm_loc)
        Pf = P_loc.astype(jnp.float32) * scales[..., None]
        return maxsim_xla(Q, Pf, qmask, pm_loc, chunk_p=chunk_p)
    if impl == "pallas":
        from evdr_tpu.ops.pallas_maxsim import maxsim_pallas

        return maxsim_pallas(Q, P_loc, qmask, pm_loc)
    return maxsim_xla(Q, P_loc, qmask, pm_loc, chunk_p=chunk_p)


def _q_spec(mesh) -> P:
    """Queries shard over the dp axis on 2D meshes, replicate on 1D."""
    return P(DP_AXIS) if DP_AXIS in mesh.axis_names else P()


def chunked_topk(scores, k: int, chunk: int = 4096):
    """Exact top-k over a huge last axis via two-stage selection.

    ``lax.top_k`` over millions of columns is a giant sorting network; chunked
    per-block top-k + a merge over (n_chunks * k) candidates is exact (every
    global top-k element is a top-k element of its own chunk) and orders of
    magnitude faster at 1M docs.
    """
    nq, n = scores.shape
    k = min(k, n)
    if n <= 2 * chunk:
        return jax.lax.top_k(scores, k)
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    if n_pad != n:
        scores = jnp.pad(scores, ((0, 0), (0, n_pad - n)),
                         constant_values=-jnp.inf)
    s3 = scores.reshape(nq, n_chunks, chunk)
    kk = min(k, chunk)
    v1, i1 = jax.lax.top_k(s3, kk)  # (nq, n_chunks, kk)
    offs = (jnp.arange(n_chunks, dtype=i1.dtype) * chunk)[None, :, None]
    g1 = (i1 + offs).reshape(nq, n_chunks * kk)
    v1 = v1.reshape(nq, n_chunks * kk)
    v2, p2 = jax.lax.top_k(v1, k)
    return v2, jnp.take_along_axis(g1, p2, axis=1)


@functools.partial(jax.jit, static_argnames=("chunk_p", "impl"))
def _single_device_scores(Q, qmask, P_loc, pm_loc, chunk_p, impl, scales=None,
                          books=None):
    # scales/books=None are empty pytrees: the float, int8 and PQ paths
    # share this one jitted entry point
    return _local_scores(Q, qmask, P_loc, pm_loc, chunk_p, impl, scales,
                         books)


def _select_topk(sc, k: int, approx: bool):
    """k-selection: exact lax.top_k for small k; hardware approx_max_k for
    large k (exact top_k compiles a sorting network whose build time explodes
    with k — top_k(250k, k=1024) was observed compiling for >45 min)."""
    if approx and k > 128:
        return jax.lax.approx_max_k(sc, k, recall_target=0.95)
    return jax.lax.top_k(sc, k)


@functools.partial(jax.jit, static_argnames=("k", "chunk_p", "impl", "approx",
                                              "n_docs"))
def _single_device_topk(Q, qmask, P_loc, pm_loc, k, chunk_p, impl,
                        approx=False, scales=None, n_docs=None, books=None):
    sc = _local_scores(Q, qmask, P_loc, pm_loc, chunk_p, impl, scales, books)
    # exclude only PADDING columns (global index >= n_docs). A REAL doc with
    # zero valid tokens scores exactly 0 under MaxSim semantics and must stay
    # rankable — the old any(pmask) proxy pushed it to -inf, disagreeing with
    # sharded_maxsim + argsort on the same corpus.
    nd = int(pm_loc.shape[0])
    limit = nd if n_docs is None else int(n_docs)
    if limit < nd:
        sc = jnp.where(jnp.arange(nd)[None, :] < limit, sc, -jnp.inf)
    return _select_topk(sc, k, approx)


@functools.partial(jax.jit, static_argnames=("k", "chunk_p", "impl",
                                              "n_main", "n_tail"))
def _single_device_merged_topk(Q, qmask, P_m, pm_m, P_t, pm_t, alive,
                               k, chunk_p, impl, n_main, n_tail,
                               scales_m=None, scales_t=None, books=None):
    """Incremental-serving top-k in ONE dispatched program: score the main
    index AND the tail index, mask tombstoned columns with a DYNAMIC alive
    vector, and select top-k — all device-side.

    Why one program: a remote-TPU dispatch costs ~30 ms RTT, so a separate
    tail dispatch per search doubles serving latency for even a one-doc
    tail. Why the alive mask is an ARGUMENT (not folded into k): k is a
    static argname, so over-fetching k + n_tombstones would recompile the
    corpus-scale program on EVERY delete (40s-3min through the tunnel,
    under the serving dispatch lock); a (n_main + n_tail) bool vector
    changes freely between calls. Recompiles happen only when the tail
    SHAPE changes — once per add(), not per delete or per search."""
    sc_m = _local_scores(Q, qmask, P_m, pm_m, chunk_p, impl, scales_m,
                         books)[:, :n_main]
    parts = [sc_m]
    if P_t is not None:
        sc_t = _local_scores(Q, qmask, P_t, pm_t, chunk_p, impl, scales_t,
                             books)[:, :n_tail]
        parts.append(sc_t)
    sc = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    sc = jnp.where(alive[None, :], sc, -jnp.inf)
    return chunked_topk(sc, min(k, n_main + n_tail))


@functools.lru_cache(maxsize=64)
def _sharded_scores_prog(mesh: Mesh, chunk_p: int, impl: str, quant: bool,
                         pq: bool = False):
    """Build ONE jitted shard_map scoring program per (mesh, config).

    Rebuilding the shard_map closure per call re-traced AND re-compiled on
    every invocation (measured ~0.63 s/call on a 4-device CPU mesh; 40 s-3
    min per compile through the TPU tunnel) — the jit wrapper makes repeat
    calls with the same shapes hit the executable cache like the
    single-device path does."""
    qs = _q_spec(mesh)
    row_axis = DP_AXIS if DP_AXIS in mesh.axis_names else None
    specs = [qs, qs, P(DOC_AXIS), P(DOC_AXIS)]
    if quant:
        specs.append(P(DOC_AXIS))   # int8 per-token scales shard with docs
    if pq:
        specs.append(P())           # PQ codebooks replicate

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=P(row_axis, DOC_AXIS),
    )
    def score(Qr, qmr, P_loc, pm_loc, *ex):
        return _local_scores(Qr, qmr, P_loc, pm_loc, chunk_p, impl,
                             ex[0] if quant else None,
                             ex[-1] if pq else None)

    return jax.jit(score)


def sharded_maxsim(Q, qmask, index: ShardedIndex, chunk_p: int = 128,
                   impl: str = "xla") -> jnp.ndarray:
    """Full (Q, N) scores, sharded over (dp-groups x doc shards)."""
    mesh = index.mesh
    if mesh.devices.size == 1:
        # shard_map measured ~200x slower than plain jit on the remote-TPU
        # backend; a 1-device mesh needs no collectives anyway
        sc = _single_device_scores(Q, qmask, index.P, index.pmask,
                                   chunk_p, impl, index.scales,
                                   getattr(index, "books", None))
        return sc[:, : index.n_docs]
    quant = index.scales is not None
    pq = getattr(index, "books", None) is not None
    score = _sharded_scores_prog(mesh, chunk_p, impl, quant, pq)
    args = (Q, qmask, index.P, index.pmask) + (
        (index.scales,) if quant else ()) + ((index.books,) if pq else ())
    scores = score(*args)
    return scores[:, : index.n_docs]


def sharded_topk(Q, qmask, index: ShardedIndex, k: int, chunk_p: int = 128,
                 impl: str = "xla", approx: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global top-k (values, doc indices) per query.

    Per-shard local top-k -> all_gather of (k, score, global idx) candidates
    over ICI -> merge top-k. Communication is O(world * k) per query instead
    of O(N). Exact by default; ``approx=True`` uses the TPU's hardware
    approximate k-selection for large k (recall ~0.95 per stage) — intended
    for candidate generation where a reranker follows.
    """
    mesh = index.mesh
    if mesh.devices.size == 1:
        return _single_device_topk(Q, qmask, index.P, index.pmask,
                                   min(k, index.n_pad), chunk_p, impl,
                                   approx, index.scales,
                                   n_docs=index.n_docs,
                                   books=getattr(index, "books", None))
    import os

    if (os.environ.get("EVDR_TOPK_IMPL") == "gspmd"
            and index.scales is None
            and getattr(index, "books", None) is None):
        # GSPMD-partitioned alternative (no shard_map dispatch overhead on
        # backends where that matters; see parallel/gspmd.py + RESULTS.md)
        from evdr_tpu.parallel.gspmd import gspmd_topk

        return gspmd_topk(Q, qmask, index, k, approx=approx)
    quant = index.scales is not None
    pq = getattr(index, "books", None) is not None
    prog = _sharded_topk_prog(mesh, k, index.n_pad, index.n_docs, chunk_p,
                              impl, approx, quant, pq)
    args = (Q, qmask, index.P, index.pmask) + (
        (index.scales,) if quant else ()) + ((index.books,) if pq else ())
    return prog(*args)


@functools.lru_cache(maxsize=64)
def _sharded_topk_prog(mesh: Mesh, k: int, n_pad: int, n_docs: int,
                       chunk_p: int, impl: str, approx: bool, quant: bool,
                       pq: bool = False):
    """One jitted shard_map top-k program per (mesh, corpus, k, config) —
    see _sharded_scores_prog for why the per-call closure was a per-call
    recompile."""
    world = dict(mesh.shape).get(DOC_AXIS, mesh.devices.size)
    shard_size = n_pad // world
    k_local = min(k, shard_size)
    qs = _q_spec(mesh)

    specs = [qs, qs, P(DOC_AXIS), P(DOC_AXIS)]
    if quant:
        specs.append(P(DOC_AXIS))   # int8 per-token scales shard with docs
    if pq:
        specs.append(P())           # PQ codebooks replicate

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=(qs, qs),
        # outputs ARE replicated across the doc axis (identical merge on
        # every doc shard) but the varying-manual-axes checker can't infer
        # that through all_gather
        check_vma=False,
    )
    def topk_local_merge(Qr, qmr, P_loc, pm_loc, *ex):
        sc = _local_scores(Qr, qmr, P_loc, pm_loc, chunk_p, impl,
                           ex[0] if quant else None,
                           ex[-1] if pq else None)  # (Qn, shard)
        my = jax.lax.axis_index(DOC_AXIS)
        # exclude only PADDING columns (global index >= n_docs): real docs
        # with zero valid tokens keep their exact 0 score (MaxSim semantics,
        # matching sharded_maxsim + argsort — the old any(pmask) proxy
        # dropped them and the two public APIs disagreed)
        gcol = my * shard_size + jnp.arange(shard_size)[None, :]
        sc = jnp.where(gcol < n_docs, sc, -jnp.inf)
        if approx and k_local > 128:
            vals, idx = _select_topk(sc, k_local, True)  # hw approx selection
        else:
            vals, idx = chunked_topk(sc, k_local)  # (Qn, k_local)
        gidx = idx + my * shard_size
        # gather candidates from all shards: (world*k_local) per query
        vals_g = jax.lax.all_gather(vals, DOC_AXIS, axis=1, tiled=True)
        gidx_g = jax.lax.all_gather(gidx, DOC_AXIS, axis=1, tiled=True)
        mvals, mpos = jax.lax.top_k(vals_g, min(k, world * k_local))
        midx = jnp.take_along_axis(gidx_g, mpos, axis=1)
        return mvals, midx

    return jax.jit(topk_local_merge)
