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

    def advance(self, n: int) -> None:
        """Skip ``n`` draws in ONE dispatch (bit-identical to n ``next()``
        calls, which set key = split(key)[0] each time). Used by --resume to
        fast-forward to the checkpoint step without n tunnel round trips."""
        if n <= 0:
            return
        self._key = jax.lax.scan(
            lambda k, _: (jax.random.split(k)[0], None), self._key,
            None, length=int(n))[0]
