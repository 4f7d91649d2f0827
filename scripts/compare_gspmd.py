"""shard_map vs GSPMD-partitioned jit for doc-sharded serving (VERDICT r1 #7).

Measures compile time and steady-state dispatch latency of the two top-k
formulations on the 8-device virtual CPU mesh (the only multi-device hardware
on this machine). Run: python scripts/compare_gspmd.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(n_docs=8192, tokens=32, d=128, nq=16, lq=16, k=10, iters=30):
    from evdr_tpu.parallel import (build_sharded_index, gspmd_topk, make_mesh,
                                   replicate, sharded_topk)

    rng = np.random.default_rng(0)

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    P = unit(rng.normal(size=(n_docs, tokens, d))).astype(np.float32)
    pm = rng.random((n_docs, tokens)) > 0.1
    Q = unit(rng.normal(size=(nq, lq, d))).astype(np.float32)
    qm = rng.random((nq, lq)) > 0.1

    mesh = make_mesh(8)
    idx = build_sharded_index(P, pm, mesh)
    Qd = replicate(jnp.asarray(Q), mesh)
    qmd = replicate(jnp.asarray(qm), mesh)

    def run(fn, label):
        t0 = time.perf_counter()
        v, i = fn()
        jax.block_until_ready(v)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            v, i = fn()
        jax.block_until_ready(v)
        per = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:>10}: compile {compile_s:6.2f}s  dispatch {per:7.3f} ms")
        return np.asarray(v), np.asarray(i), per

    v_sm, i_sm, t_sm = run(lambda: sharded_topk(Qd, qmd, idx, k=k), "shard_map")
    v_gs, i_gs, t_gs = run(lambda: gspmd_topk(Qd, qmd, idx, k=k), "gspmd")
    np.testing.assert_allclose(v_gs, v_sm, rtol=1e-5, atol=1e-5)
    print(f"exact match; gspmd/shard_map dispatch ratio: {t_gs / t_sm:.2f}x")


if __name__ == "__main__":
    main()
