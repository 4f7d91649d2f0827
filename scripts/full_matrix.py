"""Reference-scale experiment matrix (VERDICT r1 #6).

One command reproduces the reference's flagship experiment grid on the
calibrated synthetic suite: 10 datasets (mirroring the ViDoRe registry:
utils/mapping.py:1-92) x mfs {5,10,25,50} x the flagship liscore loss at
max_steps=23460 (mainv2_iter_liscore.py defaults), then builds the reporter
xlsx (summary_results.py:174-239 output format) and prints one JSON summary
line per mf.

    python scripts/full_matrix.py [--max_steps 23460] [--mfs 5 10 25 50]
        [--losses liscore] [--out /tmp/evdr_matrix]

Wall-clock guide on the tunneled v5e chip: ~150+ steps/s with K-step
dispatch; a full 40-cell liscore matrix is ~2h.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# per-dataset synthetic profiles mirroring the registry's corpus diversity
# (5 labeled-split + 5 full-dump datasets; doc counts follow the reference's
# ProxyQ page counts — tabfquad 70, tatdqa 277, arxiv/docvqa/infovqa 500,
# shift/ai/energy/gov/health 1000 — and the pseudo-query pool is 50 questions
# per page like ProxyQ (makeQ.py --nq 50). Query pools must scale with the
# corpus: at ~2 queries/page the student memorizes the pool (train listwise
# loss -> 1e-4 while eval listwise stays flat) instead of generalizing.
QUERIES_PER_PAGE = 50
DATASET_PROFILES = {
    "arxivqa": dict(n_docs=500, dim=128, noise=1.0),
    "docvqa": dict(n_docs=500, dim=128, noise=1.2),
    "infovqa": dict(n_docs=500, dim=128, noise=0.8),
    "tabfquad": dict(n_docs=70, dim=128, noise=1.0),
    "tatdqa": dict(n_docs=277, dim=128, noise=1.1),
    "shiftproject": dict(n_docs=1000, dim=128, noise=1.0),
    "syntheticDocQA_ai": dict(n_docs=1000, dim=128, noise=0.9),
    "syntheticDocQA_energy": dict(n_docs=1000, dim=128, noise=1.0),
    "syntheticDocQA_gov": dict(n_docs=1000, dim=128, noise=1.1),
    "syntheticDocQA_health": dict(n_docs=1000, dim=128, noise=1.2),
}
for _prof in DATASET_PROFILES.values():
    _prof["n_train_queries"] = QUERIES_PER_PAGE * _prof["n_docs"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max_steps", type=int, default=23460)
    p.add_argument("--mfs", type=int, nargs="+", default=[5, 10, 25, 50])
    p.add_argument("--losses", type=str, nargs="+", default=["liscore"])
    p.add_argument("--aug", type=str, default="none",
                   help="mainv3 augmentation family: qnoise|mixup|hardtoken")
    p.add_argument("--datasets", type=str, nargs="+",
                   default=list(DATASET_PROFILES))
    p.add_argument("--out", type=str, default="/tmp/evdr_matrix")
    p.add_argument("--steps_per_dispatch", type=int, default=32)
    p.add_argument("--eval_every", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()

    from evdr_tpu.data.synthetic import write_dataset_fixture
    from evdr_tpu.tools.report import write_report
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import run_training
    from evdr_tpu.utils.timing import enable_persistent_cache

    enable_persistent_cache()
    out = pathlib.Path(a.out)
    data_root = out / "data"
    data_root.mkdir(parents=True, exist_ok=True)

    for i, ds in enumerate(a.datasets):
        prof = DATASET_PROFILES[ds]
        if not (data_root / f"{ds}_test_dump_all.npz").exists():
            print(f"[matrix] fixture {ds}", file=sys.stderr, flush=True)
            write_dataset_fixture(
                data_root, key=ds, n_test_queries=128, mfs=tuple(a.mfs),
                seed=a.seed + i, init_noise=2.5, doc_len_range=(40, 90),
                **prof)
        else:  # already on disk: just (re-)register the key
            from evdr_tpu.data.registry import register_dataset

            register_dataset(ds, f"{ds}_test", mfs=tuple(a.mfs))

    t_all = time.time()
    for loss in a.losses:
        name = loss if a.aug == "none" else f"{loss}_{a.aug}"
        cfg = TrainConfig(
            datasets=list(a.datasets), query_root=str(data_root),
            teacher_root=str(data_root), init_root=str(data_root / "S3E_init"),
            mfs=list(a.mfs), out_root=str(out / "results"), name=name,
            loss=loss, aug=a.aug, temp=0.1, k=40, max_steps=a.max_steps,
            eval_every=a.eval_every, print_every=2048, q_batch=32, lr=1e-3,
            chunk_p=128, steps_per_dispatch=a.steps_per_dispatch,
            seed=a.seed)
        t0 = time.time()
        run_training(cfg)
        print(json.dumps({"loss": loss, "wall_s": round(time.time() - t0, 1)}),
              flush=True)

    sheets = write_report(out / "results", out / "matrix.xlsx")
    # reporter layout per sheet: [setting, <ds>_N@5, <ds>_R@1, ..., averages]
    for mf, rows in sorted(sheets.items()):
        header, *data = rows
        print(json.dumps({"sheet": str(mf), "header": header,
                          "rows": data}), flush=True)
    print(json.dumps({"metric": "full_matrix_wall_s",
                      "value": round(time.time() - t_all, 1),
                      "xlsx": str(out / "matrix.xlsx")}), flush=True)


if __name__ == "__main__":
    main()
