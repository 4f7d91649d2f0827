"""Quantization-aware distillation quality matrix (VERDICT r3 #6).

Trains reference-scale students (full_matrix.py profiles / budget) three
ways per (dataset, mf) — baseline fp32, --qat int4, --qat pq — then serves
each through the standard RetrievalEngine path at fp32 AND at the matching
storage tier, and reports the nDCG@5 / Recall@1 deltas vs the baseline
student served in fp32:

    posthoc delta = M(base student @ tier) - M(base student @ fp32)
    QAT delta     = M(qat  student @ tier) - M(base student @ fp32)

The QAT claim under test: training against the serving reconstruction
(ops/qat.py straight-through pass) cuts the tier's quality delta to at most
half the post-hoc one at mf 25/50. Extends the reference's score-
preservation objective (criterion.py:74-83) to the serving dtype; the
reference itself has no quantized serving tier.

    python scripts/qat_quality.py [--datasets tatdqa arxivqa] [--mfs 25 50]
        [--tiers int4 pq opq] [--qat_start_fracs 0.5 0.75 0.9]
        [--max_steps 23460] [--out /tmp/evdr_qatq]

Round-5 additions (VERDICT r4 #5): 'opq' rows (the shipped PQ form — QAT
trains against expanded rotated books and serves with them), a
--qat_start_fracs sweep, and per-row STE-engagement evidence (best_step vs
qat_switch_step; the harness's qat_select_post default guarantees
best_step >= switch, so no measured QAT cell can be a pre-STE checkpoint).

Re-runs skip any training cell whose best_ndcg5.npz already exists, so the
script is resumable and the evaluation sweep is cheap to repeat.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "scripts"))

import numpy as np  # noqa: E402

from full_matrix import DATASET_PROFILES  # noqa: E402


def _student_dir(out, name, mf, ds):
    return pathlib.Path(out) / "results" / name / f"mf{mf}" / ds


def _train_missing(a, data_root, out, name, qat, start_frac):
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import run_training

    # PER-CELL resume: one run_training per missing (dataset, mf) cell, so
    # a crashed matrix re-trains only the missing cells instead of
    # re-paying (and overwriting) every finished one
    missing = [(ds, mf) for ds in a.datasets for mf in a.mfs
               if not (_student_dir(out, name, mf, ds)
                       / "best_ndcg5.npz").exists()]
    if not missing:
        print(f"[qatq] {name}: all cells present, skipping train",
              flush=True)
        return
    t0 = time.time()
    for ds, mf in missing:
        cfg = TrainConfig(
            datasets=[ds], query_root=str(data_root),
            teacher_root=str(data_root), init_root=str(data_root / "S3E_init"),
            mfs=[mf], out_root=str(pathlib.Path(out) / "results"),
            name=name, loss=a.loss, temp=0.1, k=40, max_steps=a.max_steps,
            eval_every=a.eval_every, print_every=4096, q_batch=32, lr=1e-3,
            chunk_p=128, steps_per_dispatch=a.steps_per_dispatch, seed=a.seed,
            qat=qat, qat_pq_m=a.pq_m,
            qat_start_frac=(start_frac if qat != "none" else 0.0))
        run_training(cfg)
    print(json.dumps({"trained": name, "qat": qat,
                      "start_frac": start_frac, "cells": len(missing),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


def _metrics_for(npz_path, bundle, dtype, pq_m):
    """Serve the saved student through the engine at ``dtype``; mteb metrics.

    ``dtype='opq'`` = the shipped PQ form: engine dtype='pq' with
    pq_opq=True (rotation learned at build and folded into expanded books).
    QAT students ship the exact (compact OR expanded) books they trained
    against; those override the engine's refit regardless of tier."""
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.eval.evaluator import (CustomRetrievalEvaluator,
                                         scores_to_results)

    z = np.load(npz_path, allow_pickle=True)
    eng = RetrievalEngine(dtype="pq" if dtype == "opq" else dtype,
                          impl="xla", pq_m=pq_m, pq_opq=(dtype == "opq"))
    if dtype in ("pq", "opq") and "qat_books" in z.files:
        # QAT-pq students ship the codebooks they trained (and were
        # best-selected) against — serving with a refit grid would measure
        # a different quantizer than the one training optimized for
        from evdr_tpu.data.packing import l2_normalize, preprocess_docs
        from evdr_tpu.ops.pq import encode_with_books

        P, pmask, _ = preprocess_docs(z["documents"], z["doc_attnmask"],
                                      z["doc_imgmask"])
        Pn = np.asarray(l2_normalize(
            P * pmask[..., None].astype(np.float32)), np.float32)
        books = np.asarray(z["qat_books"], np.float32)
        eng.build_from_pq(encode_with_books(Pn, books, pmask), books, pmask)
    else:
        eng.build_from_ragged(z["documents"], z["doc_attnmask"],
                              z["doc_imgmask"])
    scores = eng.score_all(np.asarray(bundle.Q_test),
                           np.asarray(bundle.qmask_test))
    docid = [str(d) for d in z["docid"].tolist()]
    results = scores_to_results(np.asarray(scores),
                                bundle.qsidx_2_query_test,
                                {str(i): d for i, d in enumerate(docid)})
    m = CustomRetrievalEvaluator().compute_mteb_metrics(
        bundle.relevant_docs_test, results)
    return {"NDCG@5": m["NDCG"]["NDCG@5"], "Recall@1": m["Recall"]["Recall@1"]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", type=str, nargs="+",
                   default=["tatdqa", "arxivqa"])
    p.add_argument("--mfs", type=int, nargs="+", default=[25, 50])
    p.add_argument("--tiers", type=str, nargs="+",
                   default=["int4", "pq", "opq"])
    p.add_argument("--loss", type=str, default="liscore_std",
                   help="flagship recipe (plain liscore collapses at mf25 — "
                        "RESULTS.md matrix section)")
    p.add_argument("--max_steps", type=int, default=23460)
    p.add_argument("--eval_every", type=int, default=4096)
    p.add_argument("--steps_per_dispatch", type=int, default=32)
    p.add_argument("--pq_m", type=int, default=16)
    p.add_argument("--qat_start_fracs", type=float, nargs="+", default=[0.9],
                   help="QAT fine-tune phase sweep: first frac of steps "
                        "train without the STE pass (from-scratch STE "
                        "measurably degraded the student — RESULTS.md "
                        "round-4 study). Multiple values train one student "
                        "per (tier, frac); rows carry start_frac.")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="/tmp/evdr_qatq")
    p.add_argument("--platform", type=str, default="auto",
                   help="'cpu' forces the CPU backend (jax.config.update — "
                        "env vars are too late, jax preloads via "
                        "sitecustomize); 'auto' uses the default (TPU)")
    a = p.parse_args()

    if a.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from evdr_tpu.data.registry import register_dataset
    from evdr_tpu.data.synthetic import write_dataset_fixture
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import load_dataset_bundle
    from evdr_tpu.utils.timing import enable_persistent_cache

    enable_persistent_cache()
    out = pathlib.Path(a.out)
    data_root = out / "data"
    data_root.mkdir(parents=True, exist_ok=True)
    for i, ds in enumerate(a.datasets):
        prof = DATASET_PROFILES[ds]
        if not (data_root / f"{ds}_test_dump_all.npz").exists():
            print(f"[qatq] fixture {ds}", file=sys.stderr, flush=True)
            write_dataset_fixture(
                data_root, key=ds, n_test_queries=128, mfs=tuple(a.mfs),
                seed=a.seed + i, init_noise=2.5, doc_len_range=(40, 90),
                **prof)
        else:
            register_dataset(ds, f"{ds}_test", mfs=tuple(a.mfs))

    def _name(tier, frac):
        # the un-suffixed historic name is ONLY an alias for the exact
        # round-4 default (0.9) — aliasing "the first sweep value" let a
        # rerun with e.g. --qat_start_fracs 0.75 resume a 0.9-trained cell
        # and emit rows labeled with the wrong start_frac
        if frac == 0.9:
            return f"qatq_{tier}"
        return f"qatq_{tier}_sf{int(round(frac * 100)):02d}"

    _train_missing(a, data_root, out, "qatq_base", "none",
                   a.qat_start_fracs[0])
    cells = [(t, f) for t in a.tiers for f in a.qat_start_fracs]
    for tier, frac in cells:
        _train_missing(a, data_root, out, _name(tier, frac), tier, frac)

    # evaluation sweep: bundle loads are per-dataset (mf-independent)
    eval_cfg = TrainConfig(
        datasets=list(a.datasets), query_root=str(data_root),
        teacher_root=str(data_root), init_root=str(data_root / "S3E_init"),
        mfs=list(a.mfs), out_root=str(out / "results"), name="eval")
    rows = []
    for ds in a.datasets:
        bundle = load_dataset_bundle(eval_cfg, ds)
        for mf in a.mfs:
            base_npz = _student_dir(out, "qatq_base", mf, ds) / "best_ndcg5.npz"
            m_base = _metrics_for(base_npz, bundle, "float32", a.pq_m)
            for tier, frac in cells:
                m_posthoc = _metrics_for(base_npz, bundle, tier, a.pq_m)
                qat_npz = (_student_dir(out, _name(tier, frac), mf, ds)
                           / "best_ndcg5.npz")
                m_qat = _metrics_for(qat_npz, bundle, tier, a.pq_m)
                # diagnostic: the QAT student's UNQUANTIZED quality — a
                # large drop here means the STE phase hurt the underlying
                # student, not just failed to help the tier
                m_qat_fp = _metrics_for(qat_npz, bundle, "float32", a.pq_m)
                row = {"dataset": ds, "mf": mf, "tier": tier,
                       "start_frac": frac}
                # STE-engagement evidence: the selected checkpoint's step
                # vs the STE switch. With harness qat_select_post (the
                # default) best_step >= switch ALWAYS holds — recorded so
                # every row is self-certifying (VERDICT r4: round-4 cells
                # silently selected pre-switch checkpoints).
                try:
                    zq = np.load(qat_npz, allow_pickle=True)
                    meta = zq["meta"].item() if "meta" in zq.files else {}
                    row["best_step"] = int(meta.get("step", -1))
                except Exception:
                    row["best_step"] = -1
                row["qat_switch_step"] = int(frac * a.max_steps)
                row["ste_engaged"] = bool(
                    row["best_step"] >= row["qat_switch_step"] >= 0)
                for k in ("NDCG@5", "Recall@1"):
                    row[f"base_fp32_{k}"] = round(m_base[k], 5)
                    row[f"posthoc_delta_{k}"] = round(
                        m_posthoc[k] - m_base[k], 5)
                    row[f"qat_delta_{k}"] = round(m_qat[k] - m_base[k], 5)
                    row[f"qat_fp32_delta_{k}"] = round(
                        m_qat_fp[k] - m_base[k], 5)
                rows.append(row)
                print(json.dumps(row), flush=True)

    # verdict line: QAT must cut every NEGATIVE post-hoc delta at least in
    # half (deltas that are already >= 0 have nothing to halve)
    checked = halved = 0
    for r in rows:
        for k in ("NDCG@5", "Recall@1"):
            ph, qd = r[f"posthoc_delta_{k}"], r[f"qat_delta_{k}"]
            if ph < 0:
                checked += 1
                halved += qd >= ph / 2
    summary = {"metric": "qat_halves_posthoc_delta",
               "value": round(halved / checked, 3) if checked else 1.0,
               "checked": checked, "halved": halved,
               "rows": len(rows), "out": str(out / "qat_quality.json")}
    (out / "qat_quality.json").write_text(json.dumps(
        {"rows": rows, "summary": summary}, indent=1))
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
