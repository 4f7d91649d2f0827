"""Seeding: numpy host RNG + JAX PRNGKey threading (reference ``set_seed``,
utils/utils.py:20-23, adapted to JAX's functional PRNG)."""

from __future__ import annotations

import numpy as np
import jax


def set_seed(seed: int) -> "PRNGSequence":
    np.random.seed(seed)
    return PRNGSequence(seed)


class PRNGSequence:
    """Stateful convenience wrapper producing fresh JAX keys."""

    def __init__(self, seed: int):
        self._key = jax.random.PRNGKey(seed)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    __next__ = next
