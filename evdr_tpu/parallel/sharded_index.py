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

    @property
    def n_pad(self) -> int:
        return int(self.P.shape[0])


def build_sharded_index(P, pmask, mesh: Mesh, docids=None, dtype=None,
                        pad_docs_to: int = 1) -> ShardedIndex:
    """Shard an index across the mesh's doc axis.

    ``dtype`` stores the index in a narrower type (bf16 halves HBM for
    serving); ``pad_docs_to`` additionally rounds the doc axis up to a
    multiple (e.g. the scoring kernel's doc block) so the hot path never
    re-pads on device.
    """
    P = np.asarray(P)
    scales = None
    if dtype == "int8":
        from evdr_tpu.ops.quantize import quantize_tokens_int8

        P, scales = quantize_tokens_int8(P, pmask)
    elif dtype is not None:
        import ml_dtypes  # numpy bf16 support

        np_dtype = np.dtype(dtype) if dtype != "bfloat16" else ml_dtypes.bfloat16
        if P.dtype != np_dtype:
            P = P.astype(np_dtype)
    pmask = np.asarray(pmask, dtype=bool)
    n = P.shape[0]
    # shard count = size of the DOC axis (a 2D dp x docs mesh replicates the
    # index across dp groups); each local shard a multiple of pad_docs_to
    n_shards = dict(mesh.shape).get("docs", mesh.devices.size)
    quantum = n_shards * max(1, int(pad_docs_to))
    n_pad = ((n + quantum - 1) // quantum) * quantum
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
