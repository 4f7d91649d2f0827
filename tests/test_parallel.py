"""Mesh-sharded scoring, top-k, and training tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from evdr_tpu.data.packing import l2_normalize, preprocess_docs, preprocess_queries
from evdr_tpu.data.synthetic import make_synthetic_corpus, pooled_init_index
from evdr_tpu.losses.distill import (
    infonce_distillation_loss,
    listwise_distillation_loss,
    score_preserving_loss,
)
from evdr_tpu.ops.maxsim import maxsim_xla
from evdr_tpu.parallel import (
    build_sharded_index,
    build_sharded_train_step,
    make_mesh,
    replicate,
    shard_docs,
    sharded_maxsim,
    sharded_topk,
)
from evdr_tpu.train.config import TrainConfig


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _corpus(seed=0, n_docs=21, n_queries=6, dim=32):
    c = make_synthetic_corpus(n_docs=n_docs, n_queries=n_queries, dim=dim, seed=seed)
    P, pmask, _ = preprocess_docs(c["documents"], c["doc_attnmask"], c["doc_imgmask"])
    Q, qmask = preprocess_queries(c["query"], c["query_attnmask"])
    Pn = np.asarray(l2_normalize(P * pmask[..., None].astype(np.float32)))
    return c, Q, qmask, Pn, pmask


def test_sharded_maxsim_matches_local(mesh):
    _, Q, qmask, Pn, pmask = _corpus()
    idx = build_sharded_index(Pn, pmask, mesh)
    want = np.asarray(maxsim_xla(jnp.asarray(Q), jnp.asarray(Pn),
                                 jnp.asarray(qmask), jnp.asarray(pmask)))
    got = np.asarray(sharded_maxsim(replicate(jnp.asarray(Q), mesh),
                                    replicate(jnp.asarray(qmask), mesh), idx))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sharded_topk_exact(mesh):
    _, Q, qmask, Pn, pmask = _corpus(seed=1, n_docs=37)
    idx = build_sharded_index(Pn, pmask, mesh)
    scores = np.asarray(maxsim_xla(jnp.asarray(Q), jnp.asarray(Pn),
                                   jnp.asarray(qmask), jnp.asarray(pmask)))
    k = 5
    vals, gidx = sharded_topk(replicate(jnp.asarray(Q), mesh),
                              replicate(jnp.asarray(qmask), mesh), idx, k=k)
    vals, gidx = np.asarray(vals), np.asarray(gidx)
    for q in range(scores.shape[0]):
        want_idx = np.argsort(-scores[q])[:k]
        np.testing.assert_allclose(np.sort(vals[q])[::-1], np.sort(scores[q][want_idx])[::-1],
                                   rtol=1e-5, atol=1e-5)
        assert set(gidx[q].tolist()) == set(want_idx.tolist())


def test_sharded_topk_excludes_padded_docs(mesh):
    # 21 docs padded to 24: padded docs must never appear in top-k
    _, Q, qmask, Pn, pmask = _corpus(seed=2, n_docs=21)
    idx = build_sharded_index(Pn, pmask, mesh)
    vals, gidx = sharded_topk(replicate(jnp.asarray(Q), mesh),
                              replicate(jnp.asarray(qmask), mesh), idx, k=21)
    assert int(np.asarray(gidx).max()) < 21


@pytest.mark.parametrize("loss", [
    # fast loop keeps one global-softmax loss (liscore) and one
    # listwise-normalized loss (listwise); the remaining five share the
    # identical sharding plumbing and run under -m "slow or not slow"
    "liscore", "listwise",
    pytest.param("liscore_std", marks=pytest.mark.slow),
    pytest.param("infonce_distill", marks=pytest.mark.slow),
    pytest.param("score", marks=pytest.mark.slow),
    pytest.param("spl", marks=pytest.mark.slow),
    pytest.param("ranknet", marks=pytest.mark.slow)])
def test_sharded_train_step_matches_unsharded(mesh, loss):
    c, Q, qmask, Pn, pmask = _corpus(seed=3, n_docs=19)
    init = pooled_init_index(c, mf=4, seed=3)
    from evdr_tpu.data.align import align_by_docid

    (docs, attn, img), ok = align_by_docid(c["docid"], init["docid"],
                                           init["documents"], init["doc_attnmask"],
                                           init["doc_imgmask"])
    assert ok
    Ps_raw, pm_s, _ = preprocess_docs(docs, attn, img)
    param0 = (Ps_raw * pm_s[..., None]).astype(np.float32)

    cfg = TrainConfig(loss=loss, k=6, temp=0.3, lambda_list=1.0, lambda_score=0.5,
                      lr=1e-3, chunk_p=8)

    # ---- unsharded reference step ----
    from evdr_tpu.train.harness import DatasetBundle, build_train_step

    bundle = DatasetBundle(
        dataset="x", Q_train=jnp.asarray(Q), qmask_train=jnp.asarray(qmask),
        pos_idx=None, Q_test=jnp.asarray(Q), qmask_test=jnp.asarray(qmask),
        P_teacher_norm=jnp.asarray(Pn), pmask_teacher=jnp.asarray(pmask),
        docid_teacher=c["docid"], relevant_docs_test={}, docidx_2_docid_test={},
        qsidx_2_query_test=None,
    )
    optimizer = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    p1 = jnp.asarray(param0)
    st1 = optimizer.init(p1)
    step1 = build_train_step(cfg, bundle, jnp.asarray(pm_s), optimizer)
    idx_b = jnp.arange(Q.shape[0], dtype=jnp.int32)
    p1b, _, parts1 = step1(p1, st1, idx_b, jax.random.PRNGKey(0))

    # ---- sharded step ----
    n = Pn.shape[0]
    world = 8
    n_pad = ((n + world - 1) // world) * world
    pad = n_pad - n

    def padded(x):
        return np.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    teacher_idx = build_sharded_index(Pn, pmask, mesh)
    p2 = shard_docs(jnp.asarray(padded(param0)), mesh)
    pm_s_sh = shard_docs(jnp.asarray(padded(pm_s)), mesh)
    step2, opt2 = build_sharded_train_step(
        cfg, mesh, pmask_student=pm_s_sh, P_teacher=teacher_idx.P,
        pmask_teacher=teacher_idx.pmask, n_docs=n,
        Q_all=replicate(jnp.asarray(Q), mesh),
        qm_all=replicate(jnp.asarray(qmask), mesh))
    st2 = opt2.init(p2)
    p2b, _, parts2 = step2(p2, st2, idx_b, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(parts2["total_loss"]),
                               float(parts1["total_loss"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p2b)[:n], np.asarray(p1b),
                               rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("tier", [
    # int4 shares int8's doc-independent STE plumbing — slow-only
    "int8", pytest.param("int4", marks=pytest.mark.slow)])
def test_sharded_qat_step_matches_unsharded(mesh, tier):
    # the per-token quantize->dequantize STE pass is doc-independent, so the
    # shard-local application must reproduce the single-device step exactly
    c, Q, qmask, Pn, pmask = _corpus(seed=11, n_docs=19)
    init = pooled_init_index(c, mf=4, seed=11)
    from evdr_tpu.data.align import align_by_docid

    (docs, attn, img), ok = align_by_docid(
        c["docid"], init["docid"], init["documents"], init["doc_attnmask"],
        init["doc_imgmask"])
    assert ok
    Ps_raw, pm_s, _ = preprocess_docs(docs, attn, img)
    param0 = (Ps_raw * pm_s[..., None]).astype(np.float32)

    cfg = TrainConfig(loss="liscore", k=6, temp=0.3, lambda_score=0.5,
                      lr=1e-3, chunk_p=8, qat=tier)

    from evdr_tpu.train.harness import DatasetBundle, build_train_step

    bundle = DatasetBundle(
        dataset="x", Q_train=jnp.asarray(Q), qmask_train=jnp.asarray(qmask),
        pos_idx=None, Q_test=jnp.asarray(Q), qmask_test=jnp.asarray(qmask),
        P_teacher_norm=jnp.asarray(Pn), pmask_teacher=jnp.asarray(pmask),
        docid_teacher=c["docid"], relevant_docs_test={},
        docidx_2_docid_test={}, qsidx_2_query_test=None,
    )
    optimizer = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    p1 = jnp.asarray(param0)
    st1 = optimizer.init(p1)
    step1 = build_train_step(cfg, bundle, jnp.asarray(pm_s), optimizer)
    idx_b = jnp.arange(Q.shape[0], dtype=jnp.int32)
    p1b, _, parts1 = step1(p1, st1, idx_b, jax.random.PRNGKey(0))

    n = Pn.shape[0]
    world = 8
    pad = ((n + world - 1) // world) * world - n

    def padded(x):
        return np.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    teacher_idx = build_sharded_index(Pn, pmask, mesh)
    p2 = shard_docs(jnp.asarray(padded(param0)), mesh)
    pm_s_sh = shard_docs(jnp.asarray(padded(pm_s)), mesh)
    step2, opt2 = build_sharded_train_step(
        cfg, mesh, pmask_student=pm_s_sh, P_teacher=teacher_idx.P,
        pmask_teacher=teacher_idx.pmask, n_docs=n,
        Q_all=replicate(jnp.asarray(Q), mesh),
        qm_all=replicate(jnp.asarray(qmask), mesh))
    st2 = opt2.init(p2)
    p2b, _, parts2 = step2(p2, st2, idx_b, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(parts2["total_loss"]),
                               float(parts1["total_loss"]), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(p2b)[:n], np.asarray(p1b),
                               rtol=1e-4, atol=2e-5)


# slow: 7-loss sweep (~8s); test_sharded_train_step_matches_unsharded
# drives the same sharded loss fns per-loss (liscore/listwise fast)
@pytest.mark.slow
def test_sharded_losses_match_dense_directly(mesh):
    # direct check of the collective loss forms vs the dense functions
    rng = np.random.default_rng(0)
    b, n = 5, 19
    s = rng.normal(size=(b, n)).astype(np.float32) * 2
    t = rng.normal(size=(b, n)).astype(np.float32) * 2
    from evdr_tpu.parallel.train_sharded import (
        _global_lse, _infonce_distill_global, _listwise_global, _mse_global)
    import functools
    from jax.sharding import PartitionSpec as P

    world = 8
    n_pad = ((n + world - 1) // world) * world
    sp = np.pad(s, ((0, 0), (0, n_pad - n)), constant_values=-np.inf)
    tp = np.pad(t, ((0, 0), (0, n_pad - n)), constant_values=-np.inf)
    valid = np.arange(n_pad) < n

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(None, "docs"), P(None, "docs"), P("docs")),
                       out_specs=P(), check_vma=False)
    def f(s_loc, t_loc, v_loc):
        l1 = _listwise_global(s_loc, t_loc, 6, 0.5, "docs")
        l2 = _infonce_distill_global(s_loc, t_loc, 0.07, "docs")
        s0 = jnp.where(v_loc[None, :], s_loc, 0.0)
        t0 = jnp.where(v_loc[None, :], t_loc, 0.0)
        l3 = _mse_global(s0, t0, v_loc, "docs")
        return jnp.stack([l1, l2, l3])

    got = np.asarray(f(jnp.asarray(sp), jnp.asarray(tp), jnp.asarray(valid)))
    want = [
        float(listwise_distillation_loss(jnp.asarray(s), jnp.asarray(t), k=6,
                                         temperature=0.5)),
        float(infonce_distillation_loss(jnp.asarray(s), jnp.asarray(t),
                                        temperature=0.07)),
        float(score_preserving_loss(jnp.asarray(s), jnp.asarray(t))),
    ]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_chunked_topk_exact_large():
    from evdr_tpu.parallel.topk import chunked_topk

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(3, 20000)).astype(np.float32))
    v, i = chunked_topk(scores, 7, chunk=4096)
    s = np.asarray(scores)
    for q in range(3):
        want = np.argsort(-s[q])[:7]
        np.testing.assert_allclose(np.asarray(v[q]), s[q][want], rtol=1e-6)
        assert set(np.asarray(i[q]).tolist()) == set(want.tolist())


@pytest.mark.slow
def test_cli_mesh_training_matches_unsharded(tmp_path):
    """run_training with --mesh_docs 8 must reproduce the unsharded run's
    losses and metrics step for step (VERDICT r1 item 5). Slow-marked: two
    full 20-step training runs (~15s); the per-step sharded-vs-dense parity
    is covered by test_sharded_train_step_matches_unsharded in the fast
    loop, and the driver's dryrun_multichip exercises the CLI mesh path
    every round."""
    import json
    import re
    from pathlib import Path

    from evdr_tpu.data.synthetic import write_dataset_fixture
    from evdr_tpu.train.cli import build_argparser, config_from_args
    from evdr_tpu.train.harness import run_training

    root = tmp_path / "data"
    root.mkdir()
    write_dataset_fixture(root, key="synth", n_docs=21, n_test_queries=8,
                          n_train_queries=32, dim=32, mfs=(5,), seed=0,
                          init_noise=2.0)

    def run(name, extra):
        args = build_argparser().parse_args([
            "--datasets", "synth", "--loss", "liscore", "--mfs", "5",
            "--max_steps", "20", "--eval_every", "10", "--print_every", "5",
            "--q_batch", "8", "--k", "6", "--temp", "0.1", "--chunk_p", "8",
            "--query_root", str(root), "--teacher_root", str(root),
            "--init_root", str(root / "S3E_init"),
            "--out_root", str(tmp_path / "out"), "--name", name, *extra])
        run_training(config_from_args(args))
        log = (tmp_path / "out" / name / "mf5" / "synth" / "train.log").read_text()
        recs = [json.loads(m.group(0))
                for m in re.finditer(r"\{.*\}", log)]
        return recs

    recs_1 = run("single", [])
    recs_m = run("mesh", ["--mesh_docs", "8"])

    def series(recs, key):
        return {r["step"]: r[key] for r in recs if key in r and "step" in r}

    for key in ("train/total loss", "eval/eval loss", "eval/NDCG@5",
                "eval/Recall@1"):
        a, b = series(recs_1, key), series(recs_m, key)
        assert a and set(a) == set(b), (key, sorted(a), sorted(b))
        for step in a:
            np.testing.assert_allclose(b[step], a[step], rtol=2e-4, atol=2e-5,
                                       err_msg=f"{key} @ step {step}")


# slow: two full mesh training runs (~14s cold); the npz resume semantics
# (test_checkpoint_resume*), sharded-step parity, and the driver's
# per-round dryrun_multichip cover the pieces in the fast loop
@pytest.mark.slow
def test_mesh_training_checkpoint_resume(tmp_path):
    """Sharded checkpoint -> resume must re-shard state and keep training."""
    from evdr_tpu.data.synthetic import write_dataset_fixture
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import run_training

    root = tmp_path / "data"
    root.mkdir()
    write_dataset_fixture(root, key="synth", n_docs=21, n_test_queries=8,
                          n_train_queries=32, dim=32, mfs=(5,), seed=0)
    base = dict(datasets=["synth"], query_root=str(root),
                teacher_root=str(root), init_root=str(root / "S3E_init"),
                mfs=[5], out_root=str(tmp_path / "out"), name="m",
                eval_every=10, print_every=0, q_batch=8, loss="liscore",
                k=6, temp=0.1, chunk_p=8, mesh_docs=8, checkpoint_every=10)
    run_training(TrainConfig(**base, max_steps=10))
    r = run_training(TrainConfig(**base, max_steps=20, resume=True))
    assert r["synth/mf5"]["summary/best_ndcg5"]["NDCG@5"] > 0


def test_gspmd_topk_matches_shard_map(mesh):
    from evdr_tpu.parallel.gspmd import gspmd_maxsim, gspmd_topk

    _, Q, qmask, Pn, pmask = _corpus(seed=3, n_docs=41)
    idx = build_sharded_index(Pn, pmask, mesh)
    Qd = replicate(jnp.asarray(Q), mesh)
    qmd = replicate(jnp.asarray(qmask), mesh)
    k = 7
    v_sm, i_sm = sharded_topk(Qd, qmd, idx, k=k)
    v_gs, i_gs = gspmd_topk(Qd, qmd, idx, k=k)
    np.testing.assert_allclose(np.asarray(v_gs), np.asarray(v_sm),
                               rtol=1e-5, atol=1e-5)
    # same docs at every rank up to score ties
    sc_sm = np.asarray(sharded_maxsim(Qd, qmd, idx))
    for q in range(Q.shape[0]):
        got = set(np.asarray(i_gs[q]).tolist())
        want = set(np.asarray(i_sm[q]).tolist())
        if got != want:  # tie tolerance: scores must match exactly
            diff = got ^ want
            vals = {sc_sm[q, d] for d in diff}
            assert len(vals) <= 1, (q, got, want)

    sc_gs = np.asarray(gspmd_maxsim(Qd, qmd, idx))
    np.testing.assert_allclose(sc_gs, sc_sm, rtol=1e-5, atol=1e-5)


def test_gspmd_env_switch(mesh, monkeypatch):
    _, Q, qmask, Pn, pmask = _corpus(seed=4, n_docs=19)
    idx = build_sharded_index(Pn, pmask, mesh)
    Qd = replicate(jnp.asarray(Q), mesh)
    qmd = replicate(jnp.asarray(qmask), mesh)
    v0, i0 = sharded_topk(Qd, qmd, idx, k=5)
    monkeypatch.setenv("EVDR_TOPK_IMPL", "gspmd")
    v1, i1 = sharded_topk(Qd, qmd, idx, k=5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-5, atol=1e-5)


def test_sharded_infonce_sup_matches_unsharded(mesh):
    """Supervised InfoNCE with GLOBAL label indices over the sharded doc axis
    (the owning shard psums the label's score)."""
    c, Q, qmask, Pn, pmask = _corpus(seed=5, n_docs=19)
    from evdr_tpu.data.align import align_by_docid
    from evdr_tpu.data.synthetic import pooled_init_index
    from evdr_tpu.train.harness import DatasetBundle, build_train_step

    init = pooled_init_index(c, mf=4, seed=5)
    (docs, attn, img), ok = align_by_docid(c["docid"], init["docid"],
                                           init["documents"], init["doc_attnmask"],
                                           init["doc_imgmask"])
    assert ok
    Ps_raw, pm_s, _ = preprocess_docs(docs, attn, img)
    param0 = (Ps_raw * pm_s[..., None]).astype(np.float32)
    rng = np.random.default_rng(5)
    pos = rng.integers(0, Pn.shape[0], size=Q.shape[0]).astype(np.int64)

    cfg = TrainConfig(loss="infonce_sup", temp=0.05, lr=1e-3, chunk_p=8)
    bundle = DatasetBundle(
        dataset="x", Q_train=jnp.asarray(Q), qmask_train=jnp.asarray(qmask),
        pos_idx=pos, Q_test=jnp.asarray(Q), qmask_test=jnp.asarray(qmask),
        P_teacher_norm=jnp.asarray(Pn), pmask_teacher=jnp.asarray(pmask),
        docid_teacher=c["docid"], relevant_docs_test={}, docidx_2_docid_test={},
        qsidx_2_query_test=None,
    )
    optimizer = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    p1 = jnp.asarray(param0)
    step1 = build_train_step(cfg, bundle, jnp.asarray(pm_s), optimizer)
    idx_b = jnp.arange(Q.shape[0], dtype=jnp.int32)
    p1b, _, parts1 = step1(p1, optimizer.init(p1), idx_b, jax.random.PRNGKey(0))

    n = Pn.shape[0]
    n_pad = ((n + 7) // 8) * 8

    def padded(x):
        return np.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1))

    teacher_idx = build_sharded_index(Pn, pmask, mesh)
    p2 = shard_docs(jnp.asarray(padded(param0)), mesh)
    pm_s_sh = shard_docs(jnp.asarray(padded(pm_s)), mesh)
    step2, opt2 = build_sharded_train_step(
        cfg, mesh, pmask_student=pm_s_sh, P_teacher=teacher_idx.P,
        pmask_teacher=teacher_idx.pmask, n_docs=n,
        Q_all=replicate(jnp.asarray(Q), mesh),
        qm_all=replicate(jnp.asarray(qmask), mesh),
        pos_all=replicate(jnp.asarray(pos, dtype=jnp.int32), mesh))
    p2b, _, parts2 = step2(p2, opt2.init(p2), idx_b, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(parts2["total_loss"]),
                               float(parts1["total_loss"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2b)[:n], np.asarray(p1b),
                               rtol=1e-4, atol=2e-5)


def _mesh_vs_single_step(mesh, cfg, seed=7, n_docs=24, n_queries=6,
                         allmask_doc=None):
    """One train step through both paths with identical PRNG keys; returns
    (parts_single, parts_mesh, p_single, p_mesh_valid). ``allmask_doc``
    masks out every teacher token of one REAL doc (its MaxSim score becomes
    exactly 0 under the all-invalid-doc rule) to pin the mesh path's
    doc-validity semantics to the single-device ones."""
    c, Q, qmask, Pn, pmask = _corpus(seed=seed, n_docs=n_docs,
                                     n_queries=n_queries)
    if allmask_doc is not None:
        pmask = np.asarray(pmask).copy()
        pmask[allmask_doc] = False
    from evdr_tpu.data.align import align_by_docid
    from evdr_tpu.data.synthetic import pooled_init_index
    from evdr_tpu.train.harness import DatasetBundle, build_train_step

    init = pooled_init_index(c, mf=4, seed=seed)
    (docs, attn, img), ok = align_by_docid(c["docid"], init["docid"],
                                           init["documents"], init["doc_attnmask"],
                                           init["doc_imgmask"])
    assert ok
    Ps_raw, pm_s, _ = preprocess_docs(docs, attn, img)
    param0 = (Ps_raw * pm_s[..., None]).astype(np.float32)
    bundle = DatasetBundle(
        dataset="x", Q_train=jnp.asarray(Q), qmask_train=jnp.asarray(qmask),
        pos_idx=None, Q_test=jnp.asarray(Q), qmask_test=jnp.asarray(qmask),
        P_teacher_norm=jnp.asarray(Pn), pmask_teacher=jnp.asarray(pmask),
        docid_teacher=c["docid"], relevant_docs_test={}, docidx_2_docid_test={},
        qsidx_2_query_test=None,
    )
    optimizer = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    p1 = jnp.asarray(param0)
    step1 = build_train_step(cfg, bundle, jnp.asarray(pm_s), optimizer)
    idx_b = jnp.arange(Q.shape[0], dtype=jnp.int32)
    key = jax.random.PRNGKey(3)
    p1b, _, parts1 = step1(p1, optimizer.init(p1), idx_b, key)

    n = Pn.shape[0]
    world = dict(mesh.shape)["docs"]
    assert n % world == 0, "parity fixtures use an evenly-divisible doc count"
    teacher_idx = build_sharded_index(Pn, pmask, mesh)
    p2 = shard_docs(jnp.asarray(param0), mesh)
    pm_s_sh = shard_docs(jnp.asarray(pm_s), mesh)
    step2, opt2 = build_sharded_train_step(
        cfg, mesh, pmask_student=pm_s_sh, P_teacher=teacher_idx.P,
        pmask_teacher=teacher_idx.pmask, n_docs=n,
        Q_all=replicate(jnp.asarray(Q), mesh),
        qm_all=replicate(jnp.asarray(qmask), mesh))
    p2b, _, parts2 = step2(p2, opt2.init(p2), idx_b, key)
    return parts1, parts2, np.asarray(p1b), np.asarray(p2b)[:n]


def test_mesh_qnoise_matches_unsharded(mesh):
    """qnoise is shard-consistent (same key on replicated queries): mesh ==
    single-device bitwise-in-tolerance even at 8 shards."""
    cfg = TrainConfig(loss="liscore_std", aug="qnoise", q_noise_std=0.05,
                      k=6, temp=0.3, lr=1e-3, chunk_p=8)
    parts1, parts2, p1, p2 = _mesh_vs_single_step(mesh, cfg)
    np.testing.assert_allclose(float(parts2["total_loss"]),
                               float(parts1["total_loss"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(p2, p1, rtol=1e-4, atol=2e-5)


def test_mesh_hardtoken_matches_unsharded(mesh):
    """hardtoken under mesh computes EXACT global candidate ranks + psum
    hard-token gather: matches single-device (double-argsort ranks) on
    tie-free data even at 8 shards."""
    cfg = TrainConfig(loss="liscore_std", aug="hardtoken", aux_docs=2, k=6,
                      temp=0.3, lr=1e-3, chunk_p=8, virt_noise_std=0.05)
    parts1, parts2, p1, p2 = _mesh_vs_single_step(mesh, cfg)
    np.testing.assert_allclose(float(parts2["aux"]), float(parts1["aux"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(parts2["total_loss"]),
                               float(parts1["total_loss"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(p2, p1, rtol=1e-4, atol=2e-5)


def test_mesh_allmasked_real_doc_matches_unsharded(mesh):
    """A REAL doc whose teacher tokens are all masked scores exactly 0 and
    must still participate in softmax denominators, MSE counts, and the
    hardtoken rank counting — the single-device path includes it. Guards
    the mesh path's validity rule (real = global index < n_docs, NOT
    any(pmask)): with an any(pmask) proxy, the mesh loss diverges here."""
    for aug in ("none", "hardtoken"):
        cfg = TrainConfig(loss="liscore_std", aug=aug, aux_docs=2, k=6,
                          temp=0.3, lr=1e-3, chunk_p=8, virt_noise_std=0.05)
        parts1, parts2, p1, p2 = _mesh_vs_single_step(mesh, cfg,
                                                      allmask_doc=3)
        np.testing.assert_allclose(
            float(parts2["total_loss"]), float(parts1["total_loss"]),
            rtol=1e-4, atol=1e-5, err_msg=f"aug={aug}")
        np.testing.assert_allclose(p2, p1, rtol=1e-4, atol=2e-5,
                                   err_msg=f"aug={aug}")


def test_mesh_mixup_matches_unsharded_at_one_shard():
    """mixup permutes shard-locally; at world=1 (no padding) that equals the
    reference's global permutation draw with the same key."""
    mesh1 = make_mesh(1)
    cfg = TrainConfig(loss="liscore_std", aug="mixup", mixup_alpha=0.2,
                      k=6, temp=0.3, lr=1e-3, chunk_p=8)
    parts1, parts2, p1, p2 = _mesh_vs_single_step(mesh1, cfg)
    np.testing.assert_allclose(float(parts2["total_loss"]),
                               float(parts1["total_loss"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(p2, p1, rtol=1e-4, atol=2e-5)


def test_mesh_mixup_runs_multi_shard(mesh):
    """At 8 shards mixup pairs shard-locally (distribution differs from the
    global permutation; must train finitely with padded partners excluded)."""
    cfg = TrainConfig(loss="liscore_std", aug="mixup", k=6, temp=0.3,
                      lr=1e-3, chunk_p=8)
    _, parts2, _, p2 = _mesh_vs_single_step(mesh, cfg)
    assert np.isfinite(float(parts2["total_loss"]))
    assert np.isfinite(float(parts2["score_mix"]))
    assert np.isfinite(p2).all()


def test_mesh_k_step_dispatch_matches_unsharded(mesh):
    """steps_per_dispatch>1 under mesh: the fused K-step scan reproduces the
    single-device fused trajectory."""
    cfg = TrainConfig(loss="liscore_std", k=6, temp=0.3, lr=1e-3, chunk_p=8,
                      steps_per_dispatch=2)
    c, Q, qmask, Pn, pmask = _corpus(seed=9, n_docs=24, n_queries=8)
    from evdr_tpu.data.align import align_by_docid
    from evdr_tpu.data.synthetic import pooled_init_index
    from evdr_tpu.train.harness import DatasetBundle, build_train_step

    init = pooled_init_index(c, mf=4, seed=9)
    (docs, attn, img), ok = align_by_docid(c["docid"], init["docid"],
                                           init["documents"], init["doc_attnmask"],
                                           init["doc_imgmask"])
    assert ok
    Ps_raw, pm_s, _ = preprocess_docs(docs, attn, img)
    param0 = (Ps_raw * pm_s[..., None]).astype(np.float32)
    bundle = DatasetBundle(
        dataset="x", Q_train=jnp.asarray(Q), qmask_train=jnp.asarray(qmask),
        pos_idx=None, Q_test=jnp.asarray(Q), qmask_test=jnp.asarray(qmask),
        P_teacher_norm=jnp.asarray(Pn), pmask_teacher=jnp.asarray(pmask),
        docid_teacher=c["docid"], relevant_docs_test={}, docidx_2_docid_test={},
        qsidx_2_query_test=None,
    )
    optimizer = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    p1 = jnp.asarray(param0)
    step1 = build_train_step(cfg, bundle, jnp.asarray(pm_s), optimizer)
    idx_blk = jnp.stack([jnp.arange(4, dtype=jnp.int32),
                         jnp.arange(4, 8, dtype=jnp.int32)])
    key = jax.random.PRNGKey(11)
    p1b, _, parts1 = step1(p1, optimizer.init(p1), idx_blk, key)

    n = Pn.shape[0]
    teacher_idx = build_sharded_index(Pn, pmask, mesh)
    p2 = shard_docs(jnp.asarray(param0), mesh)
    pm_s_sh = shard_docs(jnp.asarray(pm_s), mesh)
    step2, opt2 = build_sharded_train_step(
        cfg, mesh, pmask_student=pm_s_sh, P_teacher=teacher_idx.P,
        pmask_teacher=teacher_idx.pmask, n_docs=n,
        Q_all=replicate(jnp.asarray(Q), mesh),
        qm_all=replicate(jnp.asarray(qmask), mesh))
    p2b, _, parts2 = step2(p2, opt2.init(p2), idx_blk, key)
    np.testing.assert_allclose(float(parts2["total_loss_sum"]),
                               float(parts1["total_loss_sum"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2b)[:n], np.asarray(p1b),
                               rtol=1e-4, atol=2e-5)


def test_sharded_teacher_precompute_matches_inline(mesh):
    """Precomputed per-shard teacher rows reproduce the inline-rescore step
    exactly, and the table itself matches dense MaxSim."""
    from evdr_tpu.parallel.train_sharded import precompute_teacher_scores_sharded

    c, Q, qmask, Pn, pmask = _corpus(seed=11, n_docs=24, n_queries=6)
    teacher_idx = build_sharded_index(Pn, pmask, mesh)
    Qd = replicate(jnp.asarray(Q), mesh)
    qmd = replicate(jnp.asarray(qmask), mesh)
    sct = precompute_teacher_scores_sharded(Qd, qmd, teacher_idx.P,
                                            teacher_idx.pmask, mesh,
                                            chunk_q=4, chunk_p=8)
    want = np.asarray(maxsim_xla(jnp.asarray(Q), jnp.asarray(Pn),
                                 jnp.asarray(qmask), jnp.asarray(pmask)))
    got = np.asarray(sct)[:, :Pn.shape[0]]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    from evdr_tpu.data.align import align_by_docid
    from evdr_tpu.data.synthetic import pooled_init_index

    init = pooled_init_index(c, mf=4, seed=11)
    (docs, attn, img), ok = align_by_docid(c["docid"], init["docid"],
                                           init["documents"], init["doc_attnmask"],
                                           init["doc_imgmask"])
    Ps_raw, pm_s, _ = preprocess_docs(docs, attn, img)
    param0 = (Ps_raw * pm_s[..., None]).astype(np.float32)
    cfg = TrainConfig(loss="liscore_std", k=6, temp=0.3, lr=1e-3, chunk_p=8)
    n = Pn.shape[0]
    p_base = shard_docs(jnp.asarray(param0), mesh)
    pm_s_sh = shard_docs(jnp.asarray(pm_s), mesh)
    idx_b = jnp.arange(Q.shape[0], dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    outs = {}
    for tag, sct_arg in (("inline", None), ("precomputed", sct)):
        stepf, optf = build_sharded_train_step(
            cfg, mesh, pmask_student=pm_s_sh, P_teacher=teacher_idx.P,
            pmask_teacher=teacher_idx.pmask, n_docs=n, Q_all=Qd, qm_all=qmd,
            sct_all=sct_arg)
        p = p_base + 0.0
        pb, _, parts = stepf(p, optf.init(p), idx_b, key)
        outs[tag] = (np.asarray(pb), float(parts["total_loss"]))
    np.testing.assert_allclose(outs["precomputed"][1], outs["inline"][1],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs["precomputed"][0], outs["inline"][0],
                               rtol=1e-5, atol=1e-6)


def test_sharded_eval_loss_no_host_transfers(mesh):
    """build_sharded_eval_loss computes the eval loss entirely on device:
    under jax.transfer_guard('disallow') no implicit host transfer may fire
    (VERDICT r2 item 1 — the old path gathered the whole index per eval)."""
    from evdr_tpu.losses.distill import combined_loss
    from evdr_tpu.parallel.train_sharded import build_sharded_eval_loss

    c, Q, qmask, Pn, pmask = _corpus(seed=13, n_docs=24, n_queries=6)
    from evdr_tpu.data.align import align_by_docid
    from evdr_tpu.data.synthetic import pooled_init_index

    init = pooled_init_index(c, mf=4, seed=13)
    (docs, attn, img), _ = align_by_docid(c["docid"], init["docid"],
                                          init["documents"], init["doc_attnmask"],
                                          init["doc_imgmask"])
    Ps_raw, pm_s, _ = preprocess_docs(docs, attn, img)
    param0 = (Ps_raw * pm_s[..., None]).astype(np.float32)

    cfg = TrainConfig(loss="liscore_std", k=6, temp=0.3, chunk_p=8)
    n = Pn.shape[0]
    teacher_idx = build_sharded_index(Pn, pmask, mesh)
    p2 = shard_docs(jnp.asarray(param0), mesh)
    pm_s_sh = shard_docs(jnp.asarray(pm_s), mesh)
    Qd = replicate(jnp.asarray(Q), mesh)
    qmd = replicate(jnp.asarray(qmask), mesh)
    ev = build_sharded_eval_loss(cfg, mesh, n)
    # warm (compile) outside the guard, then assert the steady-state call
    # makes zero implicit transfers
    ev(p2, pm_s_sh, teacher_idx.P, teacher_idx.pmask, Qd, qmd)
    with jax.transfer_guard("disallow"):
        total_d, parts_d = ev(p2, pm_s_sh, teacher_idx.P, teacher_idx.pmask,
                              Qd, qmd)
    total = float(total_d)

    # value parity vs the dense single-device loss
    Ps = l2_normalize(jnp.asarray(param0) * jnp.asarray(pm_s)[..., None].astype(jnp.float32))
    sc_s = maxsim_xla(jnp.asarray(Q), Ps, jnp.asarray(qmask), jnp.asarray(pm_s))
    sc_t = maxsim_xla(jnp.asarray(Q), jnp.asarray(Pn), jnp.asarray(qmask),
                      jnp.asarray(pmask))
    want, _ = combined_loss("liscore_std", sc_s, sc_t, cfg.loss_hp())
    np.testing.assert_allclose(total, float(want), rtol=1e-5, atol=1e-6)


def test_sharded_programs_are_cached():
    """shard_map programs must be built once per (mesh, config): the old
    per-call closure re-traced AND re-compiled on every invocation
    (~0.63 s/call on a 4-device CPU mesh; 40 s-3 min through the TPU
    tunnel)."""
    from evdr_tpu.parallel.topk import (_sharded_scores_prog,
                                        _sharded_topk_prog)
    from evdr_tpu.parallel import make_mesh

    mesh = make_mesh(4)
    assert _sharded_scores_prog(mesh, 128, "xla", False) is \
        _sharded_scores_prog(mesh, 128, "xla", False)
    assert _sharded_topk_prog(mesh, 5, 8, 7, 128, "xla", False, False) is \
        _sharded_topk_prog(mesh, 5, 8, 7, 128, "xla", False, False)


def test_sharded_topk_agrees_with_maxsim_on_empty_doc():
    """A REAL doc with zero valid tokens scores exactly 0 (MaxSim semantics)
    and must be ranked identically by sharded_maxsim+argsort and
    sharded_topk — the old any(pmask) proxy pushed it to -inf in top-k only,
    so the two public APIs disagreed whenever other docs scored negative."""
    import jax.numpy as jnp

    from evdr_tpu.parallel import (build_sharded_index, make_mesh, replicate,
                                   sharded_maxsim, sharded_topk)

    mesh = make_mesh(4)
    rng = np.random.default_rng(3)
    nd, lp, d, nq, lq = 7, 6, 16, 3, 4

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    P = unit(rng.normal(size=(nd, lp, d))).astype(np.float32)
    pm = np.ones((nd, lp), dtype=bool)
    pm[2] = False  # real all-masked doc: must stay rankable at score 0
    Q = unit(rng.normal(size=(nq, lq, d))).astype(np.float32)
    qm = np.ones((nq, lq), dtype=bool)
    idx = build_sharded_index(P * pm[..., None], pm, mesh)
    Qd, qmd = replicate(jnp.asarray(Q), mesh), replicate(jnp.asarray(qm), mesh)

    sc = np.asarray(sharded_maxsim(Qd, qmd, idx, chunk_p=8))
    vals, ids = sharded_topk(Qd, qmd, idx, k=nd, chunk_p=8)
    vals, ids = np.asarray(vals), np.asarray(ids)
    for q in range(nq):
        order = np.argsort(-sc[q], kind="stable")
        np.testing.assert_allclose(vals[q], sc[q][order], rtol=1e-5, atol=1e-6)
        assert set(ids[q].tolist()) == set(range(nd))
        assert 2 in ids[q].tolist()  # the empty doc is present, score 0
        assert vals[q][list(ids[q]).index(2)] == 0.0


def test_mesh_training_with_qat_evaluates_serving_form(tmp_path):
    """--mesh_docs with --qat int8: the doc-sharded harness runs end to end
    and its eval metrics equal the SINGLE-DEVICE qat run's (both score the
    serving reconstruction; per-token qdq is doc-independent)."""
    from evdr_tpu.data.synthetic import write_dataset_fixture
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import run_training

    root = tmp_path / "data"
    root.mkdir()
    write_dataset_fixture(root, key="synth", n_docs=21, n_test_queries=8,
                          n_train_queries=32, dim=32, mfs=(5,), seed=0,
                          init_noise=2.5)
    base = dict(datasets=["synth"], query_root=str(root),
                teacher_root=str(root), init_root=str(root / "S3E_init"),
                mfs=[5], out_root=str(tmp_path / "out"),
                eval_every=8, print_every=0, q_batch=8, loss="liscore",
                k=6, temp=0.1, chunk_p=8, qat="int8", max_steps=8)
    r_mesh = run_training(TrainConfig(**base, name="qm", mesh_docs=8))
    r_one = run_training(TrainConfig(**base, name="q1"))
    bm = r_mesh["synth/mf5"]["summary/best_ndcg5"]
    b1 = r_one["synth/mf5"]["summary/best_ndcg5"]
    assert bm["step"] == b1["step"]
    np.testing.assert_allclose(bm["NDCG@5"], b1["NDCG@5"], atol=1e-5)
    np.testing.assert_allclose(bm["Recall@1"], b1["Recall@1"], atol=1e-5)
