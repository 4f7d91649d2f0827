"""Capture a jax.profiler trace of the fused MaxSim kernel.

Writes a TensorBoard-loadable trace under --logdir (default /tmp/evdr_trace);
inspect op-level timings with `tensorboard --logdir ...` or xprof.

    python scripts/profile_maxsim.py --nq 256 --nd 500 --lp 768
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", default="/tmp/evdr_trace")
    p.add_argument("--nq", type=int, default=256)
    p.add_argument("--lq", type=int, default=32)
    p.add_argument("--nd", type=int, default=500)
    p.add_argument("--lp", type=int, default=768)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--iters", type=int, default=4)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas

    rng = np.random.default_rng(0)

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    Q = jnp.asarray(unit(rng.normal(size=(a.nq, a.lq, a.d))).astype(np.float32))
    P = jnp.asarray(unit(rng.normal(size=(a.nd, a.lp, a.d))).astype(np.float32))
    qm = jnp.asarray(rng.random((a.nq, a.lq)) > 0.15)
    pm = jnp.asarray(rng.random((a.nd, a.lp)) > 0.1)

    float(jnp.sum(maxsim_pallas(Q, P, qm, pm)))  # compile outside the trace
    with jax.profiler.trace(a.logdir):
        for i in range(a.iters):
            out = maxsim_pallas(jnp.roll(Q, i, axis=0), P, qm, pm)
            float(jnp.sum(out))
    print(f"[profile] trace written to {a.logdir}")


if __name__ == "__main__":
    main()
