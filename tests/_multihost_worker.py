"""Worker for tests/test_multihost.py — NOT a pytest module.

Runs as one of N OS processes wired by jax.distributed (Gloo collectives on
the CPU backend): builds the global doc-sharded index from only its local
rows, runs the sharded serving programs, and checks them against the
process-local numpy oracle. Prints MULTIHOST_OK on success.

Usage: python _multihost_worker.py <process_id> <num_processes> <host:port>
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    # sitecustomize preloads jax pointed at the accelerator platform; force
    # CPU with 2 virtual devices BEFORE the backend initializes (the same
    # dance as tests/conftest.py / __graft_entry__.py's dryrun child)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 2)
    except Exception:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=2")

    from evdr_tpu.parallel.multihost import (
        build_multihost_index,
        global_doc_mesh,
        init_multihost,
        replicate_global,
    )

    init_multihost(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 2 * nproc and n_local == 2, (n_global, n_local)

    import numpy as np

    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.ops.quantize import dequantize_int8, quantize_tokens_int8
    from evdr_tpu.parallel.topk import sharded_maxsim, sharded_topk

    # identical corpus on every process (seeded); deliberately NOT divisible
    # by the 4-device mesh so doc padding engages, with one fully-masked doc
    # to pin the exact-0-score semantics across the process boundary
    rng = np.random.default_rng(7)
    N, LP, LQ, D, NQ, K = 37, 6, 5, 16, 9, 5

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    P = unit(rng.normal(size=(N, LP, D))).astype(np.float32)
    pmask = rng.random((N, LP)) > 0.2
    pmask[3] = False
    Q = unit(rng.normal(size=(NQ, LQ, D))).astype(np.float32)
    qmask = rng.random((NQ, LQ)) > 0.15

    mesh = global_doc_mesh()
    idx = build_multihost_index(P, pmask, mesh)
    Qg = replicate_global(Q, mesh)
    qmg = replicate_global(qmask, mesh)

    ref = maxsim_numpy(Q, P, qmask, pmask)

    sc = np.asarray(sharded_maxsim(Qg, qmg, idx))
    np.testing.assert_allclose(sc, ref, rtol=2e-5, atol=2e-5)

    vals, ids = sharded_topk(Qg, qmg, idx, k=K)
    order = np.argsort(-ref, axis=1, kind="stable")[:, :K]
    np.testing.assert_allclose(np.asarray(vals),
                               np.take_along_axis(ref, order, axis=1),
                               rtol=2e-5, atol=2e-5)
    # indices can differ from the oracle only on exact score ties
    # (continuous random corpus: none); compare directly
    np.testing.assert_array_equal(np.asarray(ids), order)

    # int8 path: shard-local per-token quantization must equal the global
    # quantize -> score pipeline
    idx8 = build_multihost_index(P, pmask, mesh, dtype="int8")
    codes, scales = quantize_tokens_int8(P, pmask)
    ref8 = maxsim_numpy(Q, dequantize_int8(codes, scales), qmask, pmask)
    sc8 = np.asarray(sharded_maxsim(Qg, qmg, idx8))
    np.testing.assert_allclose(sc8, ref8, rtol=2e-5, atol=2e-5)

    # pre-quantized build (--normalize packed files): codes + scales given
    idx8p = build_multihost_index(codes, pmask, mesh, dtype="int8",
                                  scales=scales)
    sc8p = np.asarray(sharded_maxsim(Qg, qmg, idx8p))
    np.testing.assert_allclose(sc8p, ref8, rtol=2e-5, atol=2e-5)

    # bounded-memory host gather on a genuinely doc-SHARDED array (idx.P),
    # forcing multiple row chunks with an uneven remainder (40 rows in
    # chunks of 16 -> 16+16+8); must equal the zero-padded host corpus
    from evdr_tpu.parallel.multihost import gather_to_host

    assert not idx.P.sharding.is_fully_replicated
    row_b = int(np.prod(idx.P.shape[1:])) * idx.P.dtype.itemsize
    P_pad = np.pad(P, ((0, idx.n_pad - N), (0, 0), (0, 0)))
    np.testing.assert_array_equal(
        gather_to_host(idx.P, mesh, chunk_bytes=16 * row_b), P_pad)

    # --- the public serving engine across the process boundary ----------
    import tempfile
    from pathlib import Path

    from evdr_tpu.engine import RetrievalEngine

    eng = RetrievalEngine(mesh=mesh, dtype="float32", impl="xla")
    eng.build(P, pmask)
    ev, ei = eng.search_dense(Q, qmask, k=K)
    np.testing.assert_array_equal(ei, order)
    np.testing.assert_allclose(ev, np.take_along_axis(ref, order, axis=1),
                               rtol=2e-5, atol=2e-5)

    eng8 = RetrievalEngine(mesh=mesh, dtype="int8", impl="xla")
    eng8.build(P, pmask)
    ev8, _ = eng8.search_dense(Q, qmask, k=K)
    order8 = np.argsort(-ref8, axis=1, kind="stable")[:, :K]
    np.testing.assert_allclose(ev8, np.take_along_axis(ref8, order8, axis=1),
                               rtol=2e-5, atol=2e-5)

    # two-stage pruned search with every doc as a candidate == exact top-k
    engp = RetrievalEngine(mesh=mesh, dtype="float32", impl="xla",
                           prune_centroids=2)
    engp.build(P, pmask)
    pv, pi = engp.search_dense(Q, qmask, k=K, n_candidates=N)
    np.testing.assert_array_equal(pi, order)
    np.testing.assert_allclose(pv, np.take_along_axis(ref, order, axis=1),
                               rtol=2e-5, atol=2e-5)

    # packed-file load path (per-host mmap-lazy reads of shared storage)
    from evdr_tpu.data.npz_io import save_packed_npz
    from evdr_tpu.data.packing import l2_normalize as _l2

    with tempfile.TemporaryDirectory() as td:
        Pn_norm = np.asarray(_l2(P * pmask[..., None].astype(np.float32)),
                             dtype=np.float32)
        save_packed_npz(Path(td) / "idx.npz",
                        docid=[str(i) for i in range(N)], P_pad=Pn_norm,
                        pmask=pmask, doc_normalized=np.asarray(True))
        engf = RetrievalEngine.from_npz(Path(td) / "idx.npz", mmap=True,
                                        mesh=mesh, dtype="float32",
                                        impl="xla")
        fv, fi = engf.search_dense(Q, qmask, k=K)
        np.testing.assert_array_equal(fi, order)

    # full score matrix fetch (doc-sharded output -> replicated -> host)
    sc_all = eng.score_all(Q, qmask)
    np.testing.assert_allclose(sc_all, ref, rtol=2e-5, atol=2e-5)

    # --- incremental updates across the process boundary -----------------
    # engine.add/delete/compact/save_npz are collectives: every process
    # applies the identical mutation; the lazily-built tail assembles
    # per-host rows like any multihost index
    from jax.experimental import multihost_utils

    enginc = RetrievalEngine(mesh=mesh, dtype="int8", impl="xla")
    enginc.build(P, pmask, docids=[f"m{i}" for i in range(N)])
    Pt = unit(rng.normal(size=(5, LP, D))).astype(np.float32)
    pmt = rng.random((5, LP)) > 0.2
    assert enginc.add(Pt, pmt, docids=[f"t{i}" for i in range(5)]) == 5
    assert enginc.delete(["m2", "t1"]) == 2
    assert enginc.n_docs == N + 5 - 2
    vI, iI = enginc.search_dense(Q, qmask, k=K)
    idsI = enginc.ids_for(iI)
    ct, st_ = quantize_tokens_int8(Pt, pmt)
    ref_t8 = maxsim_numpy(Q, dequantize_int8(ct, st_), qmask, pmt)
    refI = np.concatenate([ref8, ref_t8], axis=1)
    refI[:, 2] = -np.inf       # m2
    refI[:, N + 1] = -np.inf   # t1
    orderI = np.argsort(-refI, axis=1, kind="stable")[:, :K]
    expectI = [[(f"m{j}" if j < N else f"t{j - N}") for j in row]
               for row in orderI]
    assert idsI == expectI, (idsI[0], expectI[0])
    np.testing.assert_allclose(vI, np.take_along_axis(refI, orderI, axis=1),
                               rtol=2e-5, atol=2e-5)

    # durability with LIVE incremental state: process 0 writes, everyone
    # reloads the packed file per-host-lazily and reproduces the results
    import pathlib as _pl

    save_path = _pl.Path(tempfile.gettempdir()) / (
        f"evdr_mh_inc_{coord.rsplit(':', 1)[-1]}.npz")
    enginc.save_npz(save_path)
    multihost_utils.sync_global_devices("evdr_inc_saved")
    engr = RetrievalEngine.from_npz(save_path, mesh=mesh, dtype="int8",
                                    impl="xla", mmap=True)
    assert engr.n_docs == N + 5 - 2
    v3, i3 = engr.search_dense(Q, qmask, k=K)
    assert engr.ids_for(i3) == idsI
    np.testing.assert_allclose(v3, vI, rtol=2e-5, atol=2e-5)
    multihost_utils.sync_global_devices("evdr_inc_loaded")
    if pid == 0:
        save_path.unlink(missing_ok=True)

    # compact folds the tail + drops tombstones; results unchanged
    enginc.compact()
    assert enginc.tail is None and not enginc._tombstones
    assert enginc.n_docs == N + 5 - 2
    v2, i2 = enginc.search_dense(Q, qmask, k=K)
    assert enginc.ids_for(i2) == idsI
    np.testing.assert_allclose(v2, vI, rtol=1e-5, atol=1e-5)

    # --- one sharded TRAIN step across the process boundary -------------
    # identical unsharded reference computed process-locally; the global
    # doc-sharded step must reproduce its loss and its local param rows
    import jax.numpy as jnp
    import optax

    from evdr_tpu.parallel.multihost import shard_docs_global
    from evdr_tpu.parallel.train_sharded import build_sharded_train_step
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import DatasetBundle, build_train_step

    mf_keep = 3
    Ps_raw = unit(P[:, :mf_keep] + 0.05 * rng.normal(size=(N, mf_keep, D))
                  ).astype(np.float32)
    pm_s = pmask[:, :mf_keep].copy()
    pm_s[3, 0] = True  # student row of the all-masked doc stays trainable
    param0 = (Ps_raw * pm_s[..., None]).astype(np.float32)
    Pn = (P * pmask[..., None]).astype(np.float32)

    cfg = TrainConfig(loss="liscore", k=6, temp=0.3, lambda_list=1.0,
                      lambda_score=0.5, lr=1e-3, chunk_p=8)
    optimizer = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)

    bundle = DatasetBundle(
        dataset="x", Q_train=jnp.asarray(Q), qmask_train=jnp.asarray(qmask),
        pos_idx=None, Q_test=jnp.asarray(Q), qmask_test=jnp.asarray(qmask),
        P_teacher_norm=jnp.asarray(Pn), pmask_teacher=jnp.asarray(pmask),
        docid_teacher=None, relevant_docs_test={}, docidx_2_docid_test={},
        qsidx_2_query_test=None,
    )
    p1 = jnp.asarray(param0)
    st1 = optimizer.init(p1)
    step1 = build_train_step(cfg, bundle, jnp.asarray(pm_s), optimizer)
    idx_b = np.arange(NQ, dtype=np.int32)
    key = np.asarray(jax.random.PRNGKey(0))
    p1b, _, parts1 = step1(p1, st1, jnp.asarray(idx_b), jnp.asarray(key))

    tidx = build_multihost_index(Pn, pmask, mesh)
    p2 = shard_docs_global(param0, mesh)
    step2, opt2 = build_sharded_train_step(
        cfg, mesh, pmask_student=shard_docs_global(pm_s, mesh),
        P_teacher=tidx.P, pmask_teacher=tidx.pmask, n_docs=N,
        Q_all=replicate_global(Q, mesh), qm_all=replicate_global(qmask, mesh),
        optimizer=optimizer)
    st2 = opt2.init(p2)
    p2b, _, parts2 = step2(p2, st2, replicate_global(idx_b, mesh),
                           replicate_global(key, mesh))
    np.testing.assert_allclose(float(parts2["total_loss"]),
                               float(parts1["total_loss"]),
                               rtol=1e-5, atol=1e-5)
    p1b_np = np.asarray(p1b)
    for shard in p2b.addressable_shards:  # only local rows are addressable
        rows = shard.index[0]
        lo = 0 if rows.start is None else rows.start
        ref_rows = p1b_np[lo:min(rows.stop or N, N)]
        got = np.asarray(shard.data)[: ref_rows.shape[0]]
        np.testing.assert_allclose(got, ref_rows, rtol=1e-4, atol=2e-5)

    print(f"MULTIHOST_OK pid={pid} devices={n_global}", flush=True)


if __name__ == "__main__":
    main()
