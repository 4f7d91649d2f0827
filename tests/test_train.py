"""End-to-end training harness tests on synthetic fixtures (golden-file style)."""

import json
from pathlib import Path

import numpy as np
import pytest

from evdr_tpu.data.npz_io import load_payload
from evdr_tpu.data.synthetic import write_dataset_fixture
from evdr_tpu.train.config import TrainConfig
from evdr_tpu.train.harness import run_training, load_dataset_bundle


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    # init_noise (relative) degrades the pooled init so distillation has
    # headroom to demonstrably recover ranking quality
    write_dataset_fixture(root, key="synth", n_docs=12, n_test_queries=10,
                          n_train_queries=48, dim=32, mfs=(5,), seed=0,
                          init_noise=2.5)
    return root


def _cfg(root, tmp_path, **kw):
    base = dict(
        datasets=["synth"],
        query_root=str(root),
        teacher_root=str(root),
        init_root=str(root / "S3E_init"),
        mfs=[5],
        out_root=str(tmp_path / "results"),
        name="t",
        max_steps=30,
        eval_every=15,
        print_every=10,
        q_batch=8,
        loss="liscore",
        k=6,
        temp=0.1,
        chunk_p=8,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_training_improves_metrics_and_logs(fixture_root, tmp_path):
    cfg = _cfg(fixture_root, tmp_path, max_steps=600, eval_every=100, lr=3e-3)
    results = run_training(cfg)
    summary = results["synth/mf5"]
    best = summary["summary/best_ndcg5"]

    out_dir = Path(cfg.out_root) / "t" / "mf5" / "synth"
    log_text = (out_dir / "train.log").read_text()
    # reporter-compatible final summary line
    assert "summary/best_ndcg5" in log_text
    import re
    m = re.search(r"(\{.*\"summary/best_ndcg5\".*\})\s*$", log_text, re.M)
    assert m, "summary line must be regex-parseable like the reference reporter"
    parsed = json.loads(m.group(1))
    assert "NDCG@5" in parsed["summary/best_ndcg5"]

    # config snapshot exists
    assert (out_dir / "config.json").exists()

    # best npz artifacts exist and round-trip through the payload loader
    best_npz = out_dir / "best_ndcg5.npz"
    assert best_npz.exists()
    z = np.load(best_npz, allow_pickle=True)
    assert "documents" in z.files and "meta" in z.files
    meta = z["meta"].item()
    assert meta["dataset"] == "synth" and meta["mf"] == 5

    # training should beat the untrained pooled init on eval loss or metrics:
    # compare step-0 eval line vs the best
    first_eval = None
    for line in log_text.splitlines():
        if '"eval/NDCG@5"' in line:
            payload = json.loads(line[line.index("{"):])
            first_eval = payload
            break
    assert first_eval is not None
    # distillation must visibly recover ranking quality from the noisy init
    assert best["NDCG@5"] >= first_eval["eval/NDCG@5"] + 0.05

    # params stay finite everywhere (incl. masked rows — NaN regression guard)
    z2 = np.load(out_dir / "best_ndcg5.npz", allow_pickle=True)
    for doc in z2["documents"]:
        assert np.isfinite(doc).all()


@pytest.mark.parametrize("loss", ["listwise", "infonce_distill", "score",
                                  "ranknet", "lambda", "ranknce", "spl",
                                  "lipairwise", "linfo", "pairscore",
                                  "liscore_std", "lipairscore_std"])
def test_all_losses_run(fixture_root, tmp_path, loss):
    cfg = _cfg(fixture_root, tmp_path, loss=loss, max_steps=4, eval_every=4,
               name=f"loss_{loss}")
    results = run_training(cfg)
    assert f"synth/mf5" in results


def test_supervised_infonce_runs(fixture_root, tmp_path):
    cfg = _cfg(fixture_root, tmp_path, loss="infonce_sup", max_steps=4,
               eval_every=4, name="sup", temp=0.01)
    results = run_training(cfg)
    assert "synth/mf5" in results


def test_supervised_loss_rejects_teacher_augs(fixture_root, tmp_path):
    """mixup/hardtoken aux terms are built FROM teacher scores; composing
    them with the teacher-free supervised loss must fail at config time
    (not as a trace-time TypeError on sc_t=None). qnoise only perturbs
    queries and stays legal."""
    for aug in ("mixup", "hardtoken"):
        with pytest.raises(ValueError, match="teacher"):
            _cfg(fixture_root, tmp_path, loss="infonce_sup", aug=aug,
                 name=f"sup_{aug}").validate()
    _cfg(fixture_root, tmp_path, loss="infonce_sup", aug="qnoise",
         name="sup_qnoise").validate()  # legal combination


@pytest.mark.parametrize("aug", ["qnoise", "mixup", "hardtoken"])
def test_augmentations_run(fixture_root, tmp_path, aug):
    cfg = _cfg(fixture_root, tmp_path, aug=aug, max_steps=4, eval_every=4,
               name=f"aug_{aug}", aux_docs=2)
    results = run_training(cfg)
    assert "synth/mf5" in results


def test_streaming_teacher_matches_precomputed(fixture_root, tmp_path):
    # same seed, precompute on/off -> identical loss trajectory
    import logging

    cfg1 = _cfg(fixture_root, tmp_path, max_steps=6, eval_every=6, name="pc1")
    cfg2 = _cfg(fixture_root, tmp_path, max_steps=6, eval_every=6, name="pc2",
                precompute_teacher=False)
    r1 = run_training(cfg1)
    r2 = run_training(cfg2)
    b1 = r1["synth/mf5"]["summary/best_ndcg5"]
    b2 = r2["synth/mf5"]["summary/best_ndcg5"]
    assert b1["NDCG@5"] == b2["NDCG@5"]
    assert b1["Recall@1"] == b2["Recall@1"]


def test_checkpoint_resume(fixture_root, tmp_path):
    cfg = _cfg(fixture_root, tmp_path, max_steps=10, eval_every=5,
               checkpoint_every=5, name="ck")
    run_training(cfg)
    out_dir = Path(cfg.out_root) / "ck" / "mf5" / "synth"
    assert (out_dir / "ckpt.npz").exists()
    # resume: continue to a larger step count without error
    cfg2 = _cfg(fixture_root, tmp_path, max_steps=12, eval_every=6,
                checkpoint_every=5, name="ck", resume=True)
    run_training(cfg2)


def test_export_packed_serving_artifact(fixture_root, tmp_path):
    """--export_packed int8 closes the train->serve loop: the run leaves
    a packed serving file that drops straight into the engine."""
    cfg = _cfg(fixture_root, tmp_path, max_steps=60, eval_every=10,
               name="xp", export_packed="int8")
    run_training(cfg)
    out_dir = Path(cfg.out_root) / "xp" / "mf5" / "synth"
    packed = out_dir / "best_ndcg5.packed.npz"
    assert packed.exists()
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.parallel.mesh import make_mesh
    from evdr_tpu.tools.convert_packed import is_packed

    assert is_packed(packed)
    eng = RetrievalEngine.from_npz(packed, dtype="int8", impl="xla",
                                   mesh=make_mesh(1))
    assert eng.index.P.dtype == np.int8  # direct-code path engaged
    assert eng.n_docs > 0


def test_resume_matches_uninterrupted_run(fixture_root, tmp_path):
    """Kill-and-resume must reproduce the uninterrupted trajectory bitwise:
    the batch stream and the per-dispatch rng are fast-forwarded to the
    checkpoint step (a resume that replayed draw 0 re-trained on the
    earliest batches and reused early qnoise keys). aug=qnoise makes the
    test rng-sensitive."""
    from evdr_tpu.train.harness import load_checkpoint, init_student, \
        load_dataset_bundle
    import optax

    kw = dict(loss="liscore", aug="qnoise", eval_every=5, checkpoint_every=5)
    cfg_full = _cfg(fixture_root, tmp_path, max_steps=10, name="rp_full", **kw)
    run_training(cfg_full)
    cfg_half = _cfg(fixture_root, tmp_path, max_steps=5, name="rp_half", **kw)
    run_training(cfg_half)
    cfg_res = _cfg(fixture_root, tmp_path, max_steps=10, name="rp_half",
                   resume=True, **kw)
    run_training(cfg_res)

    bundle = load_dataset_bundle(cfg_full, "synth")
    param, _, _ = init_student(cfg_full, "synth", bundle, 5)
    opt_state = optax.adamw(cfg_full.lr,
                            weight_decay=cfg_full.weight_decay).init(param)
    out = Path(cfg_full.out_root)
    p_full, _, s_full, *_ = load_checkpoint(
        out / "rp_full" / "mf5" / "synth" / "ckpt.npz", param, opt_state)
    p_res, _, s_res, *_ = load_checkpoint(
        out / "rp_half" / "mf5" / "synth" / "ckpt.npz", param, opt_state)
    assert s_full == s_res == 10
    np.testing.assert_array_equal(np.asarray(p_full), np.asarray(p_res))


# slow: orbax backend setup dominates (~6s); the npz backend resume
# tests cover the restore semantics in the fast loop
@pytest.mark.slow
def test_checkpoint_resume_orbax(fixture_root, tmp_path):
    """Orbax checkpoint backend: full train state round-trips and resume
    continues bit-for-bit like the npz backend (same restored pytree)."""
    import jax.numpy as jnp

    from evdr_tpu.train.harness import load_checkpoint

    cfg = _cfg(fixture_root, tmp_path, max_steps=10, eval_every=5,
               checkpoint_every=5, name="cko", checkpoint_backend="orbax")
    run_training(cfg)
    out_dir = Path(cfg.out_root) / "cko" / "mf5" / "synth"
    assert (out_dir / "ckpt.orbax").exists()  # orbax writes a directory
    cfg2 = _cfg(fixture_root, tmp_path, max_steps=12, eval_every=6,
                checkpoint_every=5, name="cko", resume=True,
                checkpoint_backend="orbax")
    run_training(cfg2)

    # npz and orbax backends restore identical state from identical runs
    cfgn = _cfg(fixture_root, tmp_path, max_steps=10, eval_every=5,
                checkpoint_every=5, name="ckn")
    run_training(cfgn)
    import optax

    from evdr_tpu.train.harness import init_student, load_dataset_bundle

    bundle = load_dataset_bundle(cfg, "synth")
    param, pmask_s, _ = init_student(cfg, "synth", bundle, 5)
    opt = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = opt.init(param)
    po, oo, so, *_ = load_checkpoint(out_dir / "ckpt.orbax", param, opt_state,
                                     backend="orbax")
    pn, nn, sn, *_ = load_checkpoint(
        Path(cfgn.out_root) / "ckn" / "mf5" / "synth" / "ckpt.npz",
        param, opt_state)
    assert so == sn == 10
    np.testing.assert_array_equal(np.asarray(po), np.asarray(pn))


def test_cli_roundtrip(fixture_root, tmp_path):
    from evdr_tpu.train.cli import build_argparser, config_from_args

    args = build_argparser().parse_args([
        "--datasets", "synth", "--loss", "liscore", "--mfs", "5",
        "--max_steps", "3", "--eval_every", "3",
        "--query_root", str(fixture_root), "--teacher_root", str(fixture_root),
        "--init_root", str(fixture_root / "S3E_init"),
        "--out_root", str(tmp_path / "r"), "--temp", "0.2",
    ])
    cfg = config_from_args(args)
    assert cfg.temp == 0.2 and cfg.loss == "liscore"
    from evdr_tpu.train.harness import run_training as rt

    rt(cfg)


def test_save_period_and_invariants(fixture_root, tmp_path):
    cfg = _cfg(fixture_root, tmp_path, max_steps=6, eval_every=6, name="sp",
               save_period=3, debug_invariants=True, print_every=2)
    run_training(cfg)
    out_dir = Path(cfg.out_root) / "sp" / "mf5" / "synth"
    assert (out_dir / "compressed_ep3.npz").exists()
    assert (out_dir / "compressed_ep6.npz").exists()
    log = (out_dir / "train.log").read_text()
    assert "debug/masked_param_absmax" in log
    assert "debug/grad_invalid_absmax" in log
    # the invariants themselves (mainv1.py:74-87): masked params AND masked
    # gradients stay exactly 0; valid gradients are non-degenerate
    saw_valid_grad = 0.0
    for line in log.splitlines():
        if "masked_param_absmax" in line:
            payload = json.loads(line[line.index("{"):])
            assert payload["debug/masked_param_absmax"] == 0.0
            assert payload["debug/grad_invalid_absmax"] == 0.0
            saw_valid_grad = max(saw_valid_grad,
                                 payload["debug/grad_valid_absmax"])
    assert saw_valid_grad > 0.0


@pytest.mark.parametrize("loss", [
    # lambda has the trickier SUM combiner semantics — it stays in the
    # fast loop; ranknet (weighted-mean combiner) runs in full mode
    "lambda", pytest.param("ranknet", marks=pytest.mark.slow)])
def test_evaluation_loss_query_chunking_matches_unchunked(loss):
    """>600 test queries trigger 300-query chunking for pairwise losses
    (mainv2_ranknet.py:149-161); the loss value must be unchanged — ranknet
    is a per-element MEAN (chunks combine by weighted mean), lambda a batch
    SUM over the pair-normalized per-query losses (chunks combine by SUM;
    the old weighted-mean combiner understated it ~2.6x at 700 queries)."""
    import jax.numpy as jnp
    import numpy as np

    from evdr_tpu.data.packing import l2_normalize
    from evdr_tpu.ops.maxsim import maxsim_xla
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import (DatasetBundle, evaluation_loss,
                                        make_loss_fn)

    rng = np.random.default_rng(0)
    nq, lq, n, lp, ls, d = 605, 3, 7, 10, 4, 8

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    Q = unit(rng.normal(size=(nq, lq, d))).astype(np.float32)
    qm = rng.random((nq, lq)) > 0.1
    P_t = unit(rng.normal(size=(n, lp, d))).astype(np.float32)
    pm_t = rng.random((n, lp)) > 0.1
    param = rng.normal(size=(n, ls, d)).astype(np.float32)
    pm_s = rng.random((n, ls)) > 0.1
    param = (param * pm_s[..., None]).astype(np.float32)

    cfg = TrainConfig(loss=loss, chunk_p=4)
    bundle = DatasetBundle(
        dataset="x",
        Q_train=jnp.asarray(Q[:4]), qmask_train=jnp.asarray(qm[:4]),
        pos_idx=None,
        Q_test=jnp.asarray(Q), qmask_test=jnp.asarray(qm),
        P_teacher_norm=jnp.asarray(P_t), pmask_teacher=jnp.asarray(pm_t),
        docid_teacher=np.array(["d"] * n, dtype=object),
        relevant_docs_test={}, docidx_2_docid_test={}, qsidx_2_query_test=None,
    )
    out = evaluation_loss(cfg, bundle, jnp.asarray(param), jnp.asarray(pm_s))

    Ps = l2_normalize(jnp.asarray(param) * jnp.asarray(pm_s)[..., None].astype(jnp.float32))
    sc_s = maxsim_xla(jnp.asarray(Q), Ps, jnp.asarray(qm), jnp.asarray(pm_s), chunk_p=4)
    sc_t = maxsim_xla(jnp.asarray(Q), jnp.asarray(P_t), jnp.asarray(qm),
                      jnp.asarray(pm_t), chunk_p=4)
    total, _ = make_loss_fn(cfg)(sc_s, sc_t, None)
    assert abs(out["total_loss"] - float(total)) < 1e-5


def test_steps_per_dispatch_matches_single(fixture_root, tmp_path):
    # K-step fused dispatch must produce the same training trajectory
    cfg1 = _cfg(fixture_root, tmp_path, max_steps=12, eval_every=12, name="k1",
                print_every=0)
    cfg4 = _cfg(fixture_root, tmp_path, max_steps=12, eval_every=12, name="k4",
                print_every=0, steps_per_dispatch=4)
    r1 = run_training(cfg1)
    r4 = run_training(cfg4)
    b1 = r1["synth/mf5"]["summary/best_ndcg5"]
    b4 = r4["synth/mf5"]["summary/best_ndcg5"]
    assert b1["NDCG@5"] == b4["NDCG@5"]
    assert b1["Recall@1"] == b4["Recall@1"]


# ---------------------------------------------------------------------------
# epoch-trainer families (mainv1 / mainv2 epoch scripts)
# ---------------------------------------------------------------------------

def test_epoch_trainer_family_b(fixture_root, tmp_path):
    """Family B (mainv2_distill_infonce.py etc.): epoch trainer over the
    ProxyQ pool — per-epoch eval cadence by default, improves from init,
    summary line parses."""
    cfg = _cfg(fixture_root, tmp_path, trainer="epoch", epochs=60,
               eval_every=0, loss="listwise", name="epB", lr=3e-3,
               max_steps=0)
    res = run_training(cfg)
    log = (Path(cfg.out_root) / "epB" / "mf5" / "synth" / "train.log").read_text()
    lines = log.splitlines()
    first = json.loads(lines[0][lines[0].index("{"):])
    last = [l for l in lines if "summary/best_ndcg5" in l][-1]
    summary = json.loads(last[last.index("{"):])
    assert summary["summary/best_ndcg5"]["NDCG@5"] > first["eval/NDCG@5"] + 0.05


def test_mainv1_family_a_full_batch_labeled_split(fixture_root, tmp_path):
    """Family A (mainv1.py): SPL loss, ONE full-batch step per epoch, teacher
    + train queries from the labeled train npz, eval on the test npz."""
    from evdr_tpu.data.registry import register_dataset
    from evdr_tpu.tools.split_data import split_query_npz

    # labeled split: query-axis 75/25 split of the dump (docs duplicated)
    split_query_npz(fixture_root / "synth_test_dump_all.npz",
                    fixture_root, test_ratio=0.25, shuffle=True, seed=3)
    register_dataset("synthsplit", "synth_test", has_split=True, mfs=(5,))

    cfg = _cfg(fixture_root, tmp_path, datasets=["synthsplit"],
               trainer="epoch", epochs=120, eval_every=0, loss="spl",
               full_batch=True, use_labeled_split=True, name="epA", lr=3e-3,
               max_steps=0)
    run_training(cfg)
    log = (Path(cfg.out_root) / "epA" / "mf5" / "synthsplit" / "train.log"
           ).read_text()
    lines = log.splitlines()
    first = json.loads(lines[0][lines[0].index("{"):])
    last = [l for l in lines if "summary/best_ndcg5" in l][-1]
    summary = json.loads(last[last.index("{"):])
    # full-batch SPL on the tiny fixture: must run end-to-end and not regress
    assert summary["summary/best_ndcg5"]["NDCG@5"] >= first["eval/NDCG@5"]


def test_evaluation_loss_chunking_covers_combined_pairwise_recipes():
    """The chunking guard derives from COMBINED_RECIPES membership: any recipe
    containing a pairwise component (ranknet/lambda/ranknce) chunks >600-query
    eval sets — a hand-listed set once missed lipairscore_std (VERDICT r2)."""
    from evdr_tpu.train.harness import _needs_query_chunking

    for loss in ("ranknet", "lambda", "ranknce", "lipairwise", "pairscore",
                 "lipairscore_std"):
        assert _needs_query_chunking(loss), loss
    for loss in ("listwise", "liscore", "liscore_std", "score", "spl",
                 "infonce_distill", "linfo"):
        assert not _needs_query_chunking(loss), loss


@pytest.mark.slow
def test_evaluation_loss_chunked_lipairscore_std_matches_unchunked():
    """>600-query eval loss for the 3-term recipe: chunked == unchunked.
    Slow-marked (~6s: >600-query fixture); the per-term combiner semantics
    are covered in the fast loop by the lambda case of
    test_evaluation_loss_query_chunking_matches_unchunked."""
    import jax.numpy as jnp

    from evdr_tpu.data.packing import l2_normalize
    from evdr_tpu.ops.maxsim import maxsim_xla
    from evdr_tpu.train.harness import (DatasetBundle, evaluation_loss,
                                        make_loss_fn)

    rng = np.random.default_rng(1)
    nq, lq, n, lp, ls, d = 610, 3, 7, 10, 4, 8

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    Q = unit(rng.normal(size=(nq, lq, d))).astype(np.float32)
    qm = rng.random((nq, lq)) > 0.1
    P_t = unit(rng.normal(size=(n, lp, d))).astype(np.float32)
    pm_t = rng.random((n, lp)) > 0.1
    pm_s = rng.random((n, ls)) > 0.1
    param = (rng.normal(size=(n, ls, d)) * pm_s[..., None]).astype(np.float32)

    cfg = TrainConfig(loss="lipairscore_std", chunk_p=4)
    bundle = DatasetBundle(
        dataset="x",
        Q_train=jnp.asarray(Q[:4]), qmask_train=jnp.asarray(qm[:4]),
        pos_idx=None,
        Q_test=jnp.asarray(Q), qmask_test=jnp.asarray(qm),
        P_teacher_norm=jnp.asarray(P_t), pmask_teacher=jnp.asarray(pm_t),
        docid_teacher=np.array(["d"] * n, dtype=object),
        relevant_docs_test={}, docidx_2_docid_test={}, qsidx_2_query_test=None,
    )
    out = evaluation_loss(cfg, bundle, jnp.asarray(param), jnp.asarray(pm_s))

    Ps = l2_normalize(jnp.asarray(param) * jnp.asarray(pm_s)[..., None].astype(jnp.float32))
    sc_s = maxsim_xla(jnp.asarray(Q), Ps, jnp.asarray(qm), jnp.asarray(pm_s), chunk_p=4)
    sc_t = maxsim_xla(jnp.asarray(Q), jnp.asarray(P_t), jnp.asarray(qm),
                      jnp.asarray(pm_t), chunk_p=4)
    total, _ = make_loss_fn(cfg)(sc_s, sc_t, None)
    # the 3 components are per-query means, so chunk-weighted averaging is
    # exact up to fp noise... EXCEPT listwise/std are also linear per query
    assert abs(out["total_loss"] - float(total)) < 1e-4


def test_npz_checkpoint_atomic_on_crash(tmp_path, monkeypatch):
    """A crash mid-save must leave the previous checkpoint intact (tmp +
    os.replace); resume after the failed save reads the OLD state."""
    import jax.numpy as jnp

    from evdr_tpu.train.harness import load_checkpoint, save_checkpoint

    param = jnp.arange(6.0).reshape(2, 3)
    opt_state = {"m": jnp.zeros((2, 3))}
    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, param, opt_state, 7, {"Recall@1": 0.5}, {"NDCG@5": 0.6})

    real_savez = np.savez

    def crashing_savez(file, *args, **kw):
        # simulate a mid-write crash: leave a partial tmp file behind
        Path(file).write_bytes(b"PK\x03\x04 partial garbage")
        raise RuntimeError("simulated crash")

    monkeypatch.setattr(np, "savez", crashing_savez)
    with pytest.raises(RuntimeError, match="simulated crash"):
        save_checkpoint(path, param, opt_state, 8, {}, {})
    monkeypatch.setattr(np, "savez", real_savez)

    p2, o2, step, br1, bnd5 = load_checkpoint(path, param, opt_state)
    assert step == 7 and br1["Recall@1"] == 0.5
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(param))
    # the failed save's tmp file was cleaned up
    assert not list(tmp_path.glob("*.tmp.npz"))
