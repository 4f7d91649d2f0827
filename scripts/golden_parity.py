"""Full-trajectory golden parity vs the reference itself (VERDICT r2 item 2).

Runs the reference's OWN flagship script — ``/root/reference/
mainv2_iter_liscore.py:main()`` on torch CPU, with mteb stubbed by a
RetrievalEvaluator backed by our metric engine (eval/metrics.py implements
the identical trec_eval conventions) — on a tiny shared synthetic dataset,
records the EXACT batch sequence its shuffled DataLoader consumed, then runs
our harness end-to-end (``train_dataset_mf`` with the recorded batches
replayed) on the same npz files with the same hyperparameters. Compares the
complete trajectories:

- per-step train loss curve (print_every=1 on both sides),
- per-eval eval loss / NDCG@5 / Recall@1 series,
- final best-nDCG@5 summary.

This is the strongest end-to-end parity evidence obtainable without real
ViDoRe features: everything from npz loading through loss/optimizer numerics
to metric computation runs through BOTH stacks for hundreds of coupled steps.

    python scripts/golden_parity.py [--steps 400] [--eval_every 100]
        [--out bench_artifacts/golden_parity.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import sys
import tempfile
import types

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = "/root/reference"
sys.path.insert(0, str(REPO))


def install_mteb_stub() -> None:
    """mteb.RetrievalEvaluator backed by our metric engine (same conventions)."""
    from evdr_tpu.eval.metrics import compute_retrieval_metrics

    class _RetrievalEvaluator:
        @staticmethod
        def evaluate(qrels, results, k_values, ignore_identical_ids=False):
            m = compute_retrieval_metrics(
                qrels, results, list(k_values),
                ignore_identical_ids=ignore_identical_ids)
            return m["NDCG"], m["mAP"], m["Recall"], m["Precision"], {}

        @staticmethod
        def evaluate_custom(qrels, results, k_values, metric):
            assert metric == "mrr"
            m = compute_retrieval_metrics(qrels, results, list(k_values))
            return (m["mRR"],)

    mteb_stub = types.ModuleType("mteb")
    eval_mod = types.ModuleType("mteb.evaluation")
    evals_mod = types.ModuleType("mteb.evaluation.evaluators")
    re_mod = types.ModuleType("mteb.evaluation.evaluators.RetrievalEvaluator")
    re_mod.RetrievalEvaluator = _RetrievalEvaluator
    sys.modules.update({
        "mteb": mteb_stub,
        "mteb.evaluation": eval_mod,
        "mteb.evaluation.evaluators": evals_mod,
        "mteb.evaluation.evaluators.RetrievalEvaluator": re_mod,
    })
    # Reference modules imported earlier (e.g. by a test module that installed
    # a minimal scorer-only stub at pytest collection time) have the OLD
    # RetrievalEvaluator bound at their module scope; purge them so the next
    # import re-binds against this full stub.
    for name, mod in list(sys.modules.items()):
        f = getattr(mod, "__file__", None)
        if f and str(f).startswith(REF):
            del sys.modules[name]


def parse_log(path) -> dict:
    """train.log -> {'train': {step: loss}, 'eval': {step: {...}}, 'best': {}}."""
    out = {"train": {}, "eval": {}, "best": None}
    for line in pathlib.Path(path).read_text().splitlines():
        m = re.search(r"\{.*\}", line)
        if not m:
            continue
        try:
            rec = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        if "summary/best_ndcg5" in rec:
            out["best"] = rec["summary/best_ndcg5"]
        elif "step" not in rec:
            continue  # epoch-keyed records (parsed by _parse_epoch_log)
        elif ("train/total loss" in rec or "train/total_loss" in rec
              or "train/loss" in rec):
            # combined-loss mainv2 scripts log 'train/total loss' (hardtoken:
            # 'train/total_loss'); single-loss scripts log 'train/loss'
            out["train"][int(rec["step"])] = float(
                rec.get("train/total loss",
                        rec.get("train/total_loss", rec.get("train/loss"))))
        elif "eval/NDCG@5" in rec:
            out["eval"][int(rec["step"])] = {
                "loss": float(rec.get("eval/eval loss", rec.get("eval/loss", 0.0))),
                "NDCG@5": float(rec["eval/NDCG@5"]),
                "Recall@1": float(rec["eval/Recall@1"]),
            }
    return out


# Family-C single/combined losses beyond the liscore flagship:
# loss -> (reference module, extra reference argv, extra TrainConfig kw).
# Hyperparameters are fixture-sized literals (k <= n_docs); the reference
# scripts accept ONLY their own loss's flags, so extras live here rather
# than in the shared argv (reference parsers: mainv2_iter_*.py:42-49).
_LOSS_SCRIPTS = {
    "listwise": ("mainv2_iter_listwise",
                 ["--k", "6", "--temp", "0.1"], dict(k=6, temp=0.1)),
    # legacy duplicate: differs from mainv2_iter_listwise only in default
    # data paths (overridden here), chunk_p=64, and a no-op detach in eval
    "listwise_legacy": ("mainv2_iters_listwise",
                        ["--k", "6", "--temp", "0.1"], dict(k=6, temp=0.1)),
    "infonce_distill": ("mainv2_iter_distill_infonce",
                        ["--temp", "0.1"], dict(temp=0.1)),
    "score": ("mainv2_iter_score_preserve", [], {}),
    "ranknet": ("mainv2_iter_ranknet", [], {}),
    "lambda": ("mainv2_iter_lambda",
               ["--alpha", "1.0", "--eps", "1e-6"],
               dict(alpha=1.0, eps=1e-6)),
    "ranknce": ("mainv2_iter_ranknce",
                ["--temp", "0.1", "--lambda_weight", "0.5"],
                dict(temp=0.1, lambda_weight=0.5)),
    "lipairwise": ("mainv2_iter_lipairwise",
                   ["--lambda_list", "1.0", "--lambda_pair", "1.0",
                    "--k", "6", "--temp", "0.1"],
                   dict(lambda_list=1.0, lambda_pair=1.0, k=6, temp=0.1)),
    "linfo": ("mainv2_iter_linfo_distill",
              ["--lambda_list", "1.0", "--lambda_info", "1.0", "--k", "6",
               "--list_temp", "0.1", "--info_temp", "0.1"],
              dict(lambda_list=1.0, lambda_info=1.0, k=6, list_temp=0.1,
                   info_temp=0.1)),
    "pairscore": ("mainv2_iter_pairscore",
                  ["--lambda_pair", "1.0", "--lambda_score", "1.0"],
                  dict(lambda_pair=1.0, lambda_score=1.0)),
    # gt-docs script: train pool AND eval-loss set are
    # QueryTensorDataset_gtdocs; the recorder filters eval draws by pool size
    "infonce_sup": ("mainv2_iter_super_infonce", ["--temp", "0.01"],
                    dict(temp=0.01)),
}


def _resolve_target(hp):
    """(ref module, ref extra argv, TrainConfig kw) for hp[loss]/hp[aug]."""
    if hp.get("loss", "liscore") != "liscore":
        assert hp["aug"] == "none", "augs golden-tested on liscore only"
        mod, extra, kw = _LOSS_SCRIPTS[hp["loss"]]
        ours = "listwise" if hp["loss"] == "listwise_legacy" else hp["loss"]
        return mod, extra, dict(kw, loss=ours)
    mod, extra, kw = _SCRIPTS[hp["aug"]]
    liscore_argv = ["--k", str(hp["k"]), "--temp", str(hp["temp"]),
                    "--lambda_list", str(hp["lambda_list"]),
                    "--lambda_score", str(hp["lambda_score"])]
    liscore_kw = dict(loss="liscore", k=hp["k"], temp=hp["temp"],
                      lambda_list=hp["lambda_list"],
                      lambda_score=hp["lambda_score"])
    return mod, liscore_argv + extra, dict(liscore_kw, **kw)


_SCRIPTS = {
    # aug -> (reference module, extra reference argv, extra TrainConfig kw)
    "none": ("mainv2_iter_liscore", [], {}),
    # Family D flagship: deterministic given batch order once
    # virt_noise_std=0 (the only stochastic draw in the script,
    # mainv3_iter_liscore_QA_hardtoken.py:423)
    "hardtoken": ("mainv3_iter_liscore_QA_hardtoken",
                  ["--virt_noise_std", "0", "--lambda_aux", "0.3",
                   "--aux_docs", "2"],
                  dict(aug="hardtoken", virt_noise_std=0.0, lambda_aux=0.3,
                       aux_docs=2)),
    # stochastic Family-D scripts: the reference's random draws are replaced
    # by OUR harness's jax PRNG draws (a pure function of the seed — one step
    # key per training step, the same trick as tests/test_train_step_parity),
    # so both trajectories consume identical randomness.
    "qnoise": ("mainv3_iter_liscore_noisev1",
               ["--q_noise_std", "0.05"],
               dict(aug="qnoise", q_noise_std=0.05)),
    "mixup": ("mainv3_iter_liscore_mixup",
              ["--mixup_alpha", "0.2", "--lambda_mix", "1.0"],
              dict(aug="mixup", mixup_alpha=0.2, lambda_mix=1.0)),
}


def _install_draw_injector(aug, seed):
    """Monkeypatch the reference's random draws (torch.randn_like /
    np.random.beta + torch.randperm) to return OUR harness's jax draws.

    The harness consumes exactly one PRNG key per training step
    (``rngs.next()``, harness.py train loop); qnoise spends it directly on
    ``jax.random.normal(rng, Qb.shape)`` (harness.py:339) and mixup splits it
    into (lam, perm) keys (harness.py:363-365). The reference mirrors this
    1:1: noisev1 calls ``torch.randn_like`` once per step (:297); mixup calls
    ``np.random.beta`` then ``torch.randperm`` once per step (:316-317).
    Returns a restore() callable (None if the aug needs no injection).

    The reference's shuffled DataLoader ALSO calls torch.randperm (its
    RandomSampler, once per epoch) — the mixup patch only intercepts a call
    when a perm key is pending from the immediately preceding beta() call.
    """
    if aug not in ("qnoise", "mixup"):
        return None
    import jax
    import jax.numpy as jnp
    import torch

    from evdr_tpu.utils.prng import PRNGSequence

    rngs = PRNGSequence(seed)

    if aug == "qnoise":
        orig = torch.randn_like
        def fake_randn_like(t, **kw):
            n = np.asarray(jax.random.normal(rngs.next(), tuple(t.shape),
                                             jnp.float32))
            return torch.tensor(n, dtype=t.dtype, device=t.device)
        torch.randn_like = fake_randn_like
        return lambda: setattr(torch, "randn_like", orig)

    orig_beta = np.random.beta
    orig_perm = torch.randperm
    pending = {}

    def fake_beta(a, b, *args, **kw):
        lam_key, perm_key = jax.random.split(rngs.next())
        pending["perm"] = perm_key
        return float(jax.random.beta(lam_key, a, b))

    def fake_randperm(n, *args, **kw):
        if "perm" in pending:
            perm = np.asarray(jax.random.permutation(pending.pop("perm"), n))
            return torch.tensor(perm, dtype=torch.long)
        return orig_perm(n, *args, **kw)

    np.random.beta = fake_beta
    torch.randperm = fake_randperm

    def restore():
        np.random.beta = orig_beta
        torch.randperm = orig_perm
    return restore


def run_reference(root, out_root, hp) -> list:
    """Run the reference main() (flagship or Family-D hardtoken, per
    hp['aug']) on the fixture; returns the recorded per-batch index lists
    its DataLoader consumed."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    install_mteb_stub()
    import importlib

    import Qdatasets.query_tensor_dataset as qds

    mod_name, extra_argv, _ = _resolve_target(hp)
    ref_main = importlib.import_module(mod_name)

    # route the reference's registry at our fixture files (same stems our
    # write_dataset_fixture emits)
    ref_main.DATASETMAP["synth"] = {
        "split_before": "synth_test_dump_all.npz",
        "pseudoQ": "synth_test_query.npz",
        "mf5": "mf5/synth_test.npz",
    }

    recorded: list = []
    orig_getitem = qds.QueryTensorDataset.__getitem__
    orig_getitem_gt = qds.QueryTensorDataset_gtdocs.__getitem__

    def rec_getitem(self, idx):
        recorded.append(int(idx))
        return orig_getitem(self, idx)

    def rec_getitem_gt(self, idx):
        # super_infonce uses gt-docs datasets for BOTH train and eval loss
        # (mainv2_iter_super_infonce.py:80,97); only train draws belong in
        # the replayed stream — filter by pool size
        if len(self) == hp["n_train_queries"]:
            recorded.append(int(idx))
        return orig_getitem_gt(self, idx)

    qds.QueryTensorDataset.__getitem__ = rec_getitem
    qds.QueryTensorDataset_gtdocs.__getitem__ = rec_getitem_gt
    restore_draws = _install_draw_injector(hp["aug"], hp["seed"])
    argv_save = sys.argv
    sys.argv = [mod_name + ".py",
                "--datasets", "synth", "--mfs", "5",
                "--query_root", str(root), "--teacher_root", str(root),
                "--init_root", str(root / "S3E_init"),
                "--out_root", str(out_root), "--name", "golden",
                "--max_steps", str(hp["steps"]),
                "--eval_every", str(hp["eval_every"]),
                "--q_batch", str(hp["q_batch"]), "--lr", str(hp["lr"]),
                "--weight_decay", str(hp["wd"]),
                "--print_every", "1", "--device", "cpu",
                "--seed", str(hp["seed"])] + extra_argv
    try:
        ref_main.main()
    finally:
        sys.argv = argv_save
        qds.QueryTensorDataset.__getitem__ = orig_getitem
        qds.QueryTensorDataset_gtdocs.__getitem__ = orig_getitem_gt
        if restore_draws is not None:
            restore_draws()

    # group the flat per-item record into DataLoader batches (drop_last=False)
    q_batch = hp["q_batch"]
    batches = [np.asarray(recorded[i: i + q_batch], dtype=np.int32)
               for i in range(0, len(recorded), q_batch)]
    return batches


def run_ours(root, out_root, hp, batches) -> None:
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import (
        _precompute_teacher_scores, load_dataset_bundle, train_dataset_mf)
    from evdr_tpu.utils.prng import set_seed

    cfg = TrainConfig(
        datasets=["synth"], query_root=str(root), teacher_root=str(root),
        init_root=str(root / "S3E_init"), mfs=[5], out_root=str(out_root),
        name="golden", max_steps=hp["steps"],
        eval_every=hp["eval_every"], q_batch=hp["q_batch"], lr=hp["lr"],
        weight_decay=hp["wd"],
        print_every=1, seed=hp["seed"], chunk_p=32,
        **_resolve_target(hp)[2]).validate()
    set_seed(cfg.seed)
    bundle = load_dataset_bundle(cfg, "synth", need_pos_idx=(cfg.loss == "infonce_sup"))
    bundle.sc_t_train = _precompute_teacher_scores(
        bundle.Q_train, bundle.qmask_train, bundle.P_teacher_norm,
        bundle.pmask_teacher, chunk_q=256, chunk_p=cfg.chunk_p, impl="xla")
    bundle.sc_t_test = _precompute_teacher_scores(
        bundle.Q_test, bundle.qmask_test, bundle.P_teacher_norm,
        bundle.pmask_teacher, chunk_q=256, chunk_p=cfg.chunk_p, impl="xla")
    train_dataset_mf(cfg, bundle, "synth", 5, batch_stream=iter(batches))


def compare(ref, ours, steps) -> dict:
    """Trajectory deltas; raises AssertionError on divergence."""
    common = sorted(set(ref["train"]) & set(ours["train"]))
    assert len(common) >= steps * 0.95, (len(common), steps)
    tr_ref = np.array([ref["train"][s] for s in common])
    tr_our = np.array([ours["train"][s] for s in common])
    denom = np.maximum(np.abs(tr_ref), 1e-3)
    train_max_rel = float(np.max(np.abs(tr_our - tr_ref) / denom))

    ev_steps = sorted(set(ref["eval"]) & set(ours["eval"]))
    assert ev_steps, "no common eval steps"
    loss_max = max(abs(ref["eval"][s]["loss"] - ours["eval"][s]["loss"])
                   for s in ev_steps)
    nd5_max = max(abs(ref["eval"][s]["NDCG@5"] - ours["eval"][s]["NDCG@5"])
                  for s in ev_steps)
    r1_max = max(abs(ref["eval"][s]["Recall@1"] - ours["eval"][s]["Recall@1"])
                 for s in ev_steps)
    best_delta = abs(ref["best"]["NDCG@5"] - ours["best"]["NDCG@5"])
    return {
        "n_train_steps_compared": len(common),
        "n_evals_compared": len(ev_steps),
        "train_loss_max_rel_diff": train_max_rel,
        "eval_loss_max_abs_diff": float(loss_max),
        "ndcg5_max_abs_diff": float(nd5_max),
        "recall1_max_abs_diff": float(r1_max),
        "best_ndcg5_ref": ref["best"]["NDCG@5"],
        "best_ndcg5_ours": ours["best"]["NDCG@5"],
        "best_ndcg5_abs_diff": float(best_delta),
        "ref_train_first_last": [float(tr_ref[0]), float(tr_ref[-1])],
        "our_train_first_last": [float(tr_our[0]), float(tr_our[-1])],
    }


def run(steps=400, eval_every=100, q_batch=8, n_docs=16, n_train_queries=48,
        dim=32, seed=42, workdir=None, out=None, aug="none",
        loss="liscore") -> dict:
    from evdr_tpu.data.synthetic import write_dataset_fixture

    hp = dict(steps=steps, eval_every=eval_every, q_batch=q_batch, lr=1e-3,
              wd=1e-2, k=6, temp=0.1, lambda_list=1.0, lambda_score=1.0,
              seed=seed, aug=aug, loss=loss, n_train_queries=n_train_queries)
    workdir = pathlib.Path(workdir or tempfile.mkdtemp(prefix="golden_"))
    root = workdir / "data"
    root.mkdir(parents=True, exist_ok=True)
    write_dataset_fixture(root, key="synth", n_docs=n_docs,
                          n_test_queries=12, n_train_queries=n_train_queries,
                          dim=dim, mfs=(5,), seed=seed, init_noise=2.0)

    batches = run_reference(root, workdir / "ref_out", hp)
    assert len(batches) >= steps
    run_ours(root, workdir / "our_out", hp, batches[:steps])

    ref = parse_log(workdir / "ref_out" / "golden" / "mf5" / "synth" / "train.log")
    ours = parse_log(workdir / "our_out" / "golden" / "mf5" / "synth" / "train.log")
    report = compare(ref, ours, steps)
    report["hp"] = hp
    if out:
        pathlib.Path(out).parent.mkdir(parents=True, exist_ok=True)
        pathlib.Path(out).write_text(json.dumps(report, indent=2))
    return report


# =============================================================================
# Family A: mainv1.py (full-batch SPL on a labeled train/test split)
# =============================================================================

def _parse_epoch_log(path, step_equals_epoch=False) -> dict:
    """Epoch-keyed series. mainv1 logs one epoch-keyed record per epoch
    ('train/avg_loss' + eval keys, mainv1.py:356-368, plus an epoch-0 init
    eval); our epoch trainer logs step-keyed records where, with
    full_batch=True, step == epoch (one full-batch step per epoch)."""
    out = {}
    for line in pathlib.Path(path).read_text().splitlines():
        m = re.search(r"\{.*\}", line)
        if not m:
            continue
        try:
            rec = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        ep = rec.get("epoch", rec.get("step") if step_equals_epoch else None)
        if ep is None:
            continue
        row = out.setdefault(int(ep), {"train": float("nan")})
        # our harness logs train and eval on SEPARATE step-keyed lines;
        # mainv1 merges both into one epoch-keyed record
        tr = rec.get("train/avg_loss", rec.get("train/total loss"))
        if tr is not None:
            row["train"] = float(tr)
        if "eval/NDCG@5" in rec:
            row["loss"] = float(rec.get("eval/loss",
                                        rec.get("eval/eval loss", 0.0)))
            row["NDCG@5"] = float(rec["eval/NDCG@5"])
            row["Recall@1"] = float(rec["eval/Recall@1"])
    return {e: r for e, r in out.items() if "NDCG@5" in r}


def run_family_a(epochs=120, n_docs=16, n_queries=48, dim=32, seed=42,
                 workdir=None, out=None) -> dict:
    """Golden trajectory vs /root/reference/mainv1.py (Family A): full-batch
    SPL on a labeled query split — deterministic on both sides (no DataLoader,
    no random draws), so no batch replay is needed."""
    from evdr_tpu.data.registry import register_dataset
    from evdr_tpu.data.synthetic import write_dataset_fixture
    from evdr_tpu.tools.split_data import split_query_npz

    workdir = pathlib.Path(workdir or tempfile.mkdtemp(prefix="goldenA_"))
    root = workdir / "data"
    root.mkdir(parents=True, exist_ok=True)
    write_dataset_fixture(root, key="synth", n_docs=n_docs,
                          n_test_queries=12, n_train_queries=n_queries,
                          dim=dim, mfs=(5,), seed=seed, init_noise=2.0)
    split_query_npz(root / "synth_test_dump_all.npz", root, test_ratio=0.25,
                    shuffle=True, seed=3)

    hp = dict(epochs=epochs, lr=3e-3, wd=0.0, seed=seed)

    # ---- reference run ----
    if REF not in sys.path:
        sys.path.insert(0, REF)
    install_mteb_stub()
    import importlib

    ref_main = importlib.import_module("mainv1")
    ref_main.DATASETMAP["synthsplit"] = {
        "train": "synth_test_train.npz",
        "test": "synth_test_test.npz",
        "mf5": "mf5/synth_test.npz",
    }
    argv_save = sys.argv
    sys.argv = ["mainv1.py", "--datasets", "synthsplit", "--mfs", "5",
                "--data_root", str(root), "--init_root", str(root / "S3E_init"),
                "--out_root", str(workdir / "ref_out"), "--name", "golden",
                "--epochs", str(epochs), "--lr", str(hp["lr"]),
                "--weight_decay", str(hp["wd"]),
                "--save_period", str(epochs + 1),  # skip periodic exports
                "--device", "cpu", "--seed", str(seed)]
    try:
        ref_main.main()
    finally:
        sys.argv = argv_save

    # ---- our run ----
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import run_training

    register_dataset("synthsplit", "synth_test", has_split=True, mfs=(5,))
    cfg = TrainConfig(
        datasets=["synthsplit"], query_root=str(root), teacher_root=str(root),
        init_root=str(root / "S3E_init"), mfs=[5],
        out_root=str(workdir / "our_out"), name="golden", trainer="epoch",
        loss="spl", full_batch=True, use_labeled_split=True,
        epochs=epochs, eval_every=0, max_steps=0, lr=hp["lr"],
        weight_decay=hp["wd"], print_every=1, seed=seed,
        chunk_p=64).validate()
    run_training(cfg)

    ref = _parse_epoch_log(
        workdir / "ref_out" / "golden" / "mf5" / "synthsplit" / "train.log")
    ours = _parse_epoch_log(
        workdir / "our_out" / "golden" / "mf5" / "synthsplit" / "train.log",
        step_equals_epoch=True)
    common = sorted(set(ref) & set(ours))
    assert len(common) >= epochs, (len(common), epochs)
    # epoch 0 (init eval) has no train loss on either side
    tr = [(ref[e]["train"], ours[e]["train"]) for e in common if e > 0]
    tr_ref = np.array([a for a, _ in tr])
    tr_our = np.array([b for _, b in tr])
    report = {
        "family": "A (mainv1 full-batch SPL, labeled split)",
        "n_epochs_compared": len(common),
        "train_loss_max_rel_diff": float(np.max(
            np.abs(tr_our - tr_ref) / np.maximum(np.abs(tr_ref), 1e-6))),
        "eval_loss_max_abs_diff": float(max(
            abs(ref[e]["loss"] - ours[e]["loss"]) for e in common)),
        "ndcg5_max_abs_diff": float(max(
            abs(ref[e]["NDCG@5"] - ours[e]["NDCG@5"]) for e in common)),
        "recall1_max_abs_diff": float(max(
            abs(ref[e]["Recall@1"] - ours[e]["Recall@1"]) for e in common)),
        "final_ndcg5_ref": ref[max(common)]["NDCG@5"],
        "final_ndcg5_ours": ours[max(common)]["NDCG@5"],
        "hp": hp,
    }
    if out:
        pathlib.Path(out).parent.mkdir(parents=True, exist_ok=True)
        pathlib.Path(out).write_text(json.dumps(report, indent=2))
    return report


# =============================================================================
# Family B: mainv2_listwise.py (epoch trainer, shuffled DataLoader)
# =============================================================================

# Family-B (epoch-trainer) scripts: loss -> (module, extra argv, cfg kw)
_EPOCH_SCRIPTS = {
    "listwise": ("mainv2_listwise", ["--k", "6", "--temp", "0.5"],
                 dict(loss="listwise", k=6, temp=0.5)),
    "infonce_distill": ("mainv2_distill_infonce", ["--temp", "0.1"],
                        dict(loss="infonce_distill", temp=0.1)),
    "ranknet": ("mainv2_ranknet", [], dict(loss="ranknet")),
    "infonce_sup": ("mainv2_supervised_infonce", ["--temp", "0.01"],
                    dict(loss="infonce_sup", temp=0.01)),
    # mainv1_pseudoQ is Family A's SPL loss run through the Family-B shape
    # (mini-batched ProxyQ DataLoader, epoch loop) — same runner applies
    "spl": ("mainv1_pseudoQ", [], dict(loss="spl")),
}


def run_family_b(epochs=8, q_batch=8, n_docs=16, n_train_queries=48, dim=32,
                 seed=42, workdir=None, out=None, loss="listwise") -> dict:
    """Golden trajectory vs a Family-B epoch script (default
    /root/reference/mainv2_listwise.py; ``loss`` selects any of the four —
    see _EPOCH_SCRIPTS): per-epoch training over a shuffled DataLoader whose
    exact batch order is recorded and replayed through our epoch trainer.
    The reference logs ONE epoch-keyed record with the epoch's MEAN train
    loss (mainv2_listwise.py:396-408); ours logs per-step losses
    (print_every=1), averaged per epoch here."""
    from evdr_tpu.data.synthetic import write_dataset_fixture

    mod_name, extra_argv, cfg_kw = _EPOCH_SCRIPTS[loss]
    workdir = pathlib.Path(workdir or tempfile.mkdtemp(prefix="goldenB_"))
    root = workdir / "data"
    root.mkdir(parents=True, exist_ok=True)
    write_dataset_fixture(root, key="synth", n_docs=n_docs,
                          n_test_queries=12, n_train_queries=n_train_queries,
                          dim=dim, mfs=(5,), seed=seed, init_noise=2.0)
    hp = dict(epochs=epochs, q_batch=q_batch, lr=1e-3, wd=1e-2,
              seed=seed, loss=loss)

    # ---- reference run (records DataLoader batch order) ----
    if REF not in sys.path:
        sys.path.insert(0, REF)
    install_mteb_stub()
    import importlib

    import Qdatasets.query_tensor_dataset as qds

    ref_main = importlib.import_module(mod_name)
    ref_main.DATASETMAP["synth"] = {
        "split_before": "synth_test_dump_all.npz",
        "pseudoQ": "synth_test_query.npz",
        "mf5": "mf5/synth_test.npz",
    }
    recorded: list = []
    orig_getitem = qds.QueryTensorDataset.__getitem__
    orig_getitem_gt = qds.QueryTensorDataset_gtdocs.__getitem__

    def rec_getitem(self, idx):
        recorded.append(int(idx))
        return orig_getitem(self, idx)

    def rec_getitem_gt(self, idx):
        # The supervised script uses gt-docs datasets for BOTH the train pool
        # and the eval-loss set (mainv2_supervised_infonce.py:201,224); only
        # train draws belong in the replayed batch stream, so filter by pool
        # size (train = n_train_queries, eval = the 12-query test set).
        if len(self) == n_train_queries:
            recorded.append(int(idx))
        return orig_getitem_gt(self, idx)

    qds.QueryTensorDataset.__getitem__ = rec_getitem
    qds.QueryTensorDataset_gtdocs.__getitem__ = rec_getitem_gt
    argv_save = sys.argv
    sys.argv = [mod_name + ".py", "--datasets", "synth", "--mfs", "5",
                "--query_root", str(root), "--teacher_root", str(root),
                "--init_root", str(root / "S3E_init"),
                "--out_root", str(workdir / "ref_out"), "--name", "golden",
                "--epochs", str(epochs), "--q_batch", str(q_batch),
                "--lr", str(hp["lr"]), "--weight_decay", str(hp["wd"]),
                "--print_every", "1", "--device", "cpu",
                "--seed", str(seed)] + extra_argv
    try:
        ref_main.main()
    finally:
        sys.argv = argv_save
        qds.QueryTensorDataset.__getitem__ = orig_getitem
        qds.QueryTensorDataset_gtdocs.__getitem__ = orig_getitem_gt

    batches = [np.asarray(recorded[i: i + q_batch], dtype=np.int32)
               for i in range(0, len(recorded), q_batch)]

    # ---- our run (epoch trainer, replayed batches) ----
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import (
        _precompute_teacher_scores, load_dataset_bundle, train_dataset_mf)
    from evdr_tpu.utils.prng import set_seed

    cfg = TrainConfig(
        datasets=["synth"], query_root=str(root), teacher_root=str(root),
        init_root=str(root / "S3E_init"), mfs=[5],
        out_root=str(workdir / "our_out"), name="golden", trainer="epoch",
        epochs=epochs, eval_every=0, max_steps=0,
        q_batch=q_batch, lr=hp["lr"], weight_decay=hp["wd"],
        print_every=1, seed=seed, chunk_p=32, **cfg_kw).validate()
    set_seed(cfg.seed)
    bundle = load_dataset_bundle(cfg, "synth", need_pos_idx=(cfg.loss == "infonce_sup"))
    bundle.sc_t_train = _precompute_teacher_scores(
        bundle.Q_train, bundle.qmask_train, bundle.P_teacher_norm,
        bundle.pmask_teacher, chunk_q=256, chunk_p=cfg.chunk_p, impl="xla")
    bundle.sc_t_test = _precompute_teacher_scores(
        bundle.Q_test, bundle.qmask_test, bundle.P_teacher_norm,
        bundle.pmask_teacher, chunk_q=256, chunk_p=cfg.chunk_p, impl="xla")
    train_dataset_mf(cfg, bundle, "synth", 5, batch_stream=iter(batches))

    # ---- compare per-epoch ----
    spe = -(-n_train_queries // q_batch)  # steps per epoch (drop_last=False)
    ref_log = parse_log(
        workdir / "ref_out" / "golden" / "mf5" / "synth" / "train.log")
    ref_ep = _parse_epoch_log(
        workdir / "ref_out" / "golden" / "mf5" / "synth" / "train.log")
    our_log = parse_log(
        workdir / "our_out" / "golden" / "mf5" / "synth" / "train.log")

    def our_epoch_mean(e):
        steps = [s for s in our_log["train"] if (e - 1) * spe < s <= e * spe]
        return float(np.mean([our_log["train"][s] for s in steps]))

    epochs_common = sorted(e for e in ref_ep if e > 0)
    assert len(epochs_common) == epochs, (len(epochs_common), epochs)
    tr_ref = np.array([ref_ep[e]["train"] for e in epochs_common])
    tr_our = np.array([our_epoch_mean(e) for e in epochs_common])
    ev = {e: our_log["eval"].get(e * spe) for e in epochs_common}
    assert all(v is not None for v in ev.values()), "missing our eval epochs"
    report = {
        "family": f"B ({_EPOCH_SCRIPTS[loss][0]} epoch trainer)",
        "n_epochs_compared": len(epochs_common),
        "train_loss_max_rel_diff": float(np.max(
            np.abs(tr_our - tr_ref) / np.maximum(np.abs(tr_ref), 1e-6))),
        "eval_loss_max_abs_diff": float(max(
            abs(ref_ep[e]["loss"] - ev[e]["loss"]) for e in epochs_common)),
        "ndcg5_max_abs_diff": float(max(
            abs(ref_ep[e]["NDCG@5"] - ev[e]["NDCG@5"])
            for e in epochs_common)),
        "recall1_max_abs_diff": float(max(
            abs(ref_ep[e]["Recall@1"] - ev[e]["Recall@1"])
            for e in epochs_common)),
        "best_ndcg5_ref": ref_log["best"]["NDCG@5"],
        "best_ndcg5_ours": our_log["best"]["NDCG@5"],
        "best_ndcg5_abs_diff": float(
            abs(ref_log["best"]["NDCG@5"] - our_log["best"]["NDCG@5"])),
        "hp": hp,
    }
    if out:
        pathlib.Path(out).parent.mkdir(parents=True, exist_ok=True)
        pathlib.Path(out).write_text(json.dumps(report, indent=2))
    return report


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--eval_every", type=int, default=100)
    p.add_argument("--q_batch", type=int, default=8)
    p.add_argument("--aug", default="none", choices=sorted(_SCRIPTS),
                   help="golden-trajectory target: the flagship script "
                        "('none' -> mainv2_iter_liscore) or a Family-D "
                        "mainv3 script")
    p.add_argument("--loss", default="liscore",
                   choices=["liscore"] + sorted(_LOSS_SCRIPTS),
                   help="golden-trajectory target loss: each maps to its own "
                        "reference mainv2_iter_* script (liscore = flagship; "
                        "--aug requires liscore)")
    p.add_argument("--family_a", action="store_true",
                   help="instead run the Family-A golden trajectory "
                        "(mainv1.py full-batch SPL; --steps = epochs)")
    p.add_argument("--family_b", default=None, choices=sorted(_EPOCH_SCRIPTS),
                   metavar="LOSS",
                   help="instead run a Family-B (epoch trainer) golden "
                        "trajectory for the given loss (--steps = epochs): "
                        + ", ".join(sorted(_EPOCH_SCRIPTS)))
    p.add_argument("--out", default="bench_artifacts/golden_parity.json")
    p.add_argument("--cpu", action="store_true",
                   help="run our harness side on CPU (the sitecustomize "
                        "preload pins JAX_PLATFORMS=axon, so an env var is "
                        "too late — this flips it before first backend use; "
                        "lets golden runs proceed while the TPU is busy)")
    a = p.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if a.family_a:
        report = run_family_a(epochs=a.steps, out=a.out)
    elif a.family_b:
        report = run_family_b(epochs=min(a.steps, 25), out=a.out,
                              loss=a.family_b)
    else:
        report = run(steps=a.steps, eval_every=a.eval_every,
                     q_batch=a.q_batch, out=a.out, aug=a.aug, loss=a.loss)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
