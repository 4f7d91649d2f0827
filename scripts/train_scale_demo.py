"""Training-scale demo: distill a corpus 10x the reference's largest.

The reference's biggest training corpora are 1,000 pages
(utils/mapping.py: shift/ai/energy/gov/health). This runs the full flagship
distillation on a 10,000-page synthetic corpus on ONE chip:

    python scripts/train_scale_demo.py [--n_docs 10000] [--mf 10]
        [--queries_per_page 10] [--max_steps 23460]

At this scale the (n_queries x n_docs) teacher-score precompute no longer
pays (10k docs x 100k queries = 4GB of scores), so the teacher is scored
inline per step (--no precompute), exactly like the reference does at any
scale. Prints one JSON line with the final metrics + throughput.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_docs", type=int, default=10_000)
    p.add_argument("--mf", type=int, default=10)
    p.add_argument("--queries_per_page", type=int, default=10)
    p.add_argument("--max_steps", type=int, default=23460)
    p.add_argument("--out", type=str, default="/tmp/evdr_scale")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()

    from evdr_tpu.data.synthetic import write_dataset_fixture
    from evdr_tpu.data.registry import register_dataset
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import run_training
    from evdr_tpu.utils.timing import enable_persistent_cache

    enable_persistent_cache()
    out = pathlib.Path(a.out)
    data_root = out / "data"
    data_root.mkdir(parents=True, exist_ok=True)
    # key encodes every arg that changes the fixture contents, so a re-run
    # with different --mf / --queries_per_page / --seed regenerates instead
    # of silently reusing a mismatched on-disk fixture
    key = f"scale{a.n_docs}x{a.mf}q{a.queries_per_page}s{a.seed}"
    t0 = time.time()
    init_npz = data_root / "S3E_init" / f"mf{a.mf}" / f"{key}_test.npz"
    if not ((data_root / f"{key}_test_dump_all.npz").exists()
            and init_npz.exists()):
        print(f"[scale] generating {a.n_docs}-page fixture", file=sys.stderr,
              flush=True)
        write_dataset_fixture(
            data_root, key=key, n_docs=a.n_docs, n_test_queries=256,
            n_train_queries=a.queries_per_page * a.n_docs, dim=128,
            mfs=(a.mf,), seed=a.seed, init_noise=2.5, doc_len_range=(40, 90))
    else:
        register_dataset(key, f"{key}_test", mfs=(a.mf,))
    t_fix = time.time() - t0

    cfg = TrainConfig(
        datasets=[key], query_root=str(data_root), teacher_root=str(data_root),
        init_root=str(data_root / "S3E_init"), mfs=[a.mf],
        out_root=str(out / "results"), name="scale", loss="liscore_std",
        temp=0.1, k=40, max_steps=a.max_steps, eval_every=4096,
        print_every=8192, q_batch=32, lr=1e-3, chunk_p=256,
        steps_per_dispatch=32, precompute_teacher=False, seed=a.seed)
    t0 = time.time()
    run_training(cfg)
    t_train = time.time() - t0

    log = (out / "results" / "scale" / f"mf{a.mf}" / key / "train.log").read_text()
    last = [l for l in log.splitlines() if "summary/best_ndcg5" in l][-1]
    summary = json.loads(last[last.index("{"):])
    print(json.dumps({
        "metric": "scale_demo", "n_docs": a.n_docs, "mf": a.mf,
        "n_train_queries": a.queries_per_page * a.n_docs,
        "best_ndcg5": summary["summary/best_ndcg5"],
        "fixture_s": round(t_fix, 1), "train_wall_s": round(t_train, 1),
        "steps_per_sec": round(a.max_steps / t_train, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
