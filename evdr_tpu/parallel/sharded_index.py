"""Doc-axis sharded multi-vector index.

Pads the doc axis to a multiple of the mesh size (padded docs are fully
masked, so they score 0 and can never enter top-k with positive scores; the
valid-count is tracked so exact merges drop them).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from evdr_tpu.parallel.mesh import shard_docs


@dataclass
class ShardedIndex:
    P: jnp.ndarray          # (N_pad, Lp, D) sharded on dim 0 (float or int8)
    pmask: jnp.ndarray      # (N_pad, Lp) sharded on dim 0
    n_docs: int             # valid docs (<= N_pad)
    docids: Optional[np.ndarray] = None
    mesh: Optional[Mesh] = None
    # int8-quantized indexes: per-token f32 scales (N_pad, Lp), sharded on
    # dim 0; None for float indexes (see ops/quantize.py)
    scales: Optional[jnp.ndarray] = None
    # product-quantized indexes: replicated (M, K, D/M) f32 codebooks and
    # P holds (N_pad, Lp, M) uint8 codes (see ops/pq.py)
    books: Optional[jnp.ndarray] = None
    # True for full-width (M, K, D) OPQ codebooks (ops/pq.expand_books):
    # shape-only consumers (serve warm-up) can't tell the layouts apart
    # without a query dim in hand, so the builder records it
    books_expanded: bool = False

    @property
    def n_pad(self) -> int:
        return int(self.P.shape[0])


def _shard_docs_streamed(x, mesh: Mesh, n_pad: int, cast=None):
    """device_put one doc shard at a time (1D doc mesh).

    The host working set per transfer is ONE shard slice — combined with an
    np.memmap-backed ``x`` (tools/convert_packed.py: load_packed_payload
    mmap_docs=True) a GB-scale index streams file -> page cache -> device
    with bounded anonymous RSS (no full-array host copy, no np.pad copy)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    devs = list(mesh.devices.flat)
    world = len(devs)
    shard = n_pad // world
    spec = PartitionSpec("docs", *([None] * (x.ndim - 1)))
    pieces = []
    for i, dev in enumerate(devs):
        sl = np.asarray(x[i * shard: min((i + 1) * shard, x.shape[0])])
        if cast is not None and sl.dtype != cast:
            sl = sl.astype(cast)
        if sl.shape[0] < shard:  # only trailing shards pad
            sl = np.pad(sl, ((0, shard - sl.shape[0]),)
                        + ((0, 0),) * (x.ndim - 1))
        pieces.append(jax.device_put(sl, dev))
    return jax.make_array_from_single_device_arrays(
        (n_pad,) + tuple(x.shape[1:]), NamedSharding(mesh, spec), pieces)


def _shard_docs_streamed_quantized(P, pmask, mesh: Mesh, n_pad: int):
    """Streamed int8 quantization + transfer: per-token symmetric scales
    (ops/quantize.py) are doc-independent, so quantizing one doc shard at a
    time is bit-identical to a full-array pass while keeping host RSS to one
    shard slice. Mirrors _shard_docs_streamed's slice/pad/assemble loop but
    emits TWO arrays per shard (codes + scales); a change to the streaming
    contract there (axis names, shard rounding) must be applied here too."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from evdr_tpu.ops.quantize import quantize_tokens_int8

    devs = list(mesh.devices.flat)
    world = len(devs)
    shard = n_pad // world
    code_pieces, scale_pieces = [], []
    for i, dev in enumerate(devs):
        sl = np.asarray(P[i * shard: min((i + 1) * shard, P.shape[0])])
        ms = np.asarray(pmask[i * shard: min((i + 1) * shard, P.shape[0])])
        # zero-row trailing slices quantize fine (shapes (0, Lp, D)/(0, Lp))
        codes, sc = quantize_tokens_int8(sl, ms)
        if codes.shape[0] < shard:  # only trailing shards pad
            pad = shard - codes.shape[0]
            codes = np.pad(codes, ((0, pad), (0, 0), (0, 0)))
            sc = np.pad(sc, ((0, pad), (0, 0)))
        code_pieces.append(jax.device_put(codes, dev))
        scale_pieces.append(jax.device_put(sc, dev))
    mk = jax.make_array_from_single_device_arrays
    codes_arr = mk((n_pad,) + tuple(P.shape[1:]),
                   NamedSharding(mesh, PartitionSpec("docs", None, None)),
                   code_pieces)
    scales_arr = mk((n_pad, P.shape[1]),
                    NamedSharding(mesh, PartitionSpec("docs", None)),
                    scale_pieces)
    return codes_arr, scales_arr


def build_sharded_index(P, pmask, mesh: Mesh, docids=None, dtype=None,
                        pad_docs_to: int = 1, scales=None,
                        streaming: bool = False) -> ShardedIndex:
    """Shard an index across the mesh's doc axis.

    ``dtype`` stores the index in a narrower type (bf16 halves HBM for
    serving); ``pad_docs_to`` additionally rounds the doc axis up to a
    multiple (e.g. the scoring kernel's doc block) so the hot path never
    re-pads on device. With ``dtype='int8'`` pass pre-quantized ``P`` (int8
    codes) + ``scales`` to skip requantization (packed files written with
    --normalize). ``streaming=True`` transfers shard-by-shard without a full
    host copy (pairs with mmap-backed inputs; 1D doc mesh only).
    """
    np_cast = None
    if dtype is not None and dtype not in ("int8", "int4"):
        import ml_dtypes  # numpy bf16 support

        np_cast = (np.dtype(dtype) if dtype != "bfloat16"
                   else np.dtype(ml_dtypes.bfloat16))
    n = P.shape[0]
    # shard count = size of the DOC axis (a 2D dp x docs mesh replicates the
    # index across dp groups); each local shard a multiple of pad_docs_to
    n_shards = dict(mesh.shape).get("docs", mesh.devices.size)
    quantum = n_shards * max(1, int(pad_docs_to))
    n_pad = ((n + quantum - 1) // quantum) * quantum

    if streaming and "dp" in mesh.axis_names:
        # falling through would np.asarray the whole mmap — the exact
        # full-host materialization streaming exists to avoid
        raise ValueError("streaming builds support 1D doc meshes only "
                         "(dp-replicated transfers need a full host copy); "
                         "load eagerly or use a 1D mesh")
    if streaming:
        # ALL per-doc transforms (dtype cast, int8 quantization — per-token,
        # so shard-local is exact) run inside the per-shard loop: a host-side
        # astype/quantize of the full mmap here would materialize the whole
        # index in anonymous RAM, defeating the bounded-RSS contract.
        if dtype == "int8" and scales is None:
            P_sh, sc_sh = _shard_docs_streamed_quantized(P, pmask, mesh, n_pad)
            return ShardedIndex(
                P=P_sh, pmask=_shard_docs_streamed(pmask, mesh, n_pad,
                                                   cast=bool),
                n_docs=n, docids=docids, mesh=mesh, scales=sc_sh)
        if dtype == "int4" and scales is None:
            # falling through would stream FLOAT tokens under an int4 label;
            # quantize-on-stream is unimplemented — pack the file instead
            # (tools/convert_packed.py --dtype int4) and pass codes+scales
            raise ValueError("streaming int4 builds need pre-packed codes "
                             "+ scales (convert_packed --dtype int4)")
        return ShardedIndex(
            P=_shard_docs_streamed(P, mesh, n_pad, cast=np_cast),
            pmask=_shard_docs_streamed(pmask, mesh, n_pad, cast=bool),
            n_docs=n, docids=docids, mesh=mesh,
            scales=(_shard_docs_streamed(scales, mesh, n_pad)
                    if scales is not None else None))

    P = np.asarray(P)
    if dtype == "int8" and scales is None:
        from evdr_tpu.ops.quantize import quantize_tokens_int8

        P, scales = quantize_tokens_int8(P, pmask)
    elif dtype == "int4" and scales is None:
        from evdr_tpu.ops.int4 import quantize_tokens_int4

        P, scales = quantize_tokens_int4(P, pmask)
    elif np_cast is not None and P.dtype != np_cast:
        P = P.astype(np_cast)
    pmask = np.asarray(pmask, dtype=bool)
    if scales is not None:
        scales = np.asarray(scales)
    if n_pad != n:
        P = np.pad(P, ((0, n_pad - n), (0, 0), (0, 0)))
        pmask = np.pad(pmask, ((0, n_pad - n), (0, 0)))
        if scales is not None:
            scales = np.pad(scales, ((0, n_pad - n), (0, 0)))
    return ShardedIndex(
        P=shard_docs(jnp.asarray(P), mesh),
        pmask=shard_docs(jnp.asarray(pmask), mesh),
        n_docs=n,
        docids=docids,
        mesh=mesh,
        scales=(shard_docs(jnp.asarray(scales), mesh)
                if scales is not None else None),
    )
