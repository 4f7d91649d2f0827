"""Device mesh + sharding helpers.

The framework's parallel axis is the DOCUMENT axis of the multi-vector index:
pages shard across devices ("docs" axis), queries replicate, scores/top-k
merge over ICI with XLA collectives. (The reference is single-GPU with no
distributed layer — SURVEY.md §2.4; this design follows BASELINE.json's
1M-page north star.)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DOC_AXIS = "docs"
DP_AXIS = "dp"


def make_mesh(n_devices: Optional[int] = None, axis: str = DOC_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(dp: int, docs: int) -> Mesh:
    """2D mesh: query data-parallel groups x doc shards.

    Layout intent: the ``docs`` axis should ride ICI (index shards exchange
    top-k candidates), the ``dp`` axis needs no communication at all during
    serving (each group owns its queries; the index is replicated across
    groups) and may span DCN on multi-slice deployments.
    """
    devs = jax.devices()
    if dp * docs > len(devs):
        raise ValueError(f"need {dp * docs} devices, have {len(devs)}")
    grid = np.array(devs[: dp * docs]).reshape(dp, docs)
    return Mesh(grid, (DP_AXIS, DOC_AXIS))


def shard_docs(x, mesh: Mesh, axis: str = DOC_AXIS):
    """Place an array sharded along dim 0 (the doc axis)."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
