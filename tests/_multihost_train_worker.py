"""Worker for tests/test_multihost.py::test_two_process_cli_training.

Drives the REAL training CLI as a 2-process multi-host run (--coordinator
wiring, global 4-device mesh, mesh_docs=4), then runs the same config
unsharded in-process and checks the multi-host train.log reproduces the
unsharded losses/metrics step for step (process 0; followers compare the
returned summaries). Prints TRAIN_OK on success.
"""

import json
import os
import pathlib
import re
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    pid, nproc, coord_addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 2)
    except Exception:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=2")

    import numpy as np

    from evdr_tpu.data.synthetic import write_dataset_fixture
    from evdr_tpu.train.cli import build_argparser, config_from_args, main as cli_main
    from evdr_tpu.train.harness import run_training

    tmp = pathlib.Path(tempfile.mkdtemp(prefix=f"mh_train_{pid}_"))
    root = tmp / "data"
    root.mkdir()
    # identical fixture on every process (each host's copy of the features)
    write_dataset_fixture(root, key="synth", n_docs=21, n_test_queries=8,
                          n_train_queries=32, dim=32, mfs=(5,), seed=0,
                          init_noise=2.0)
    # out_root is SHARED across processes (the documented multi-host
    # contract: process 0 owns the writes, --resume reads the same files) —
    # keyed by the coordinator port so concurrent test runs cannot collide
    out = (pathlib.Path(tempfile.gettempdir())
           / f"mh_train_shared_{coord_addr.rsplit(':', 1)[-1]}" / "out")
    out.mkdir(parents=True, exist_ok=True)

    common = [
        "--datasets", "synth", "--loss", "liscore", "--mfs", "5",
        "--max_steps", "20", "--eval_every", "10", "--print_every", "5",
        "--q_batch", "8", "--k", "6", "--temp", "0.1", "--chunk_p", "8",
        "--query_root", str(root), "--teacher_root", str(root),
        "--init_root", str(root / "S3E_init"),
        "--out_root", str(out),
    ]

    # 1) multi-host run through the real CLI (it wires jax.distributed)
    cli_main(common + ["--name", "mh", "--mesh_docs", "4",
                       "--checkpoint_every", "10",
                       "--coordinator", coord_addr,
                       "--num_processes", str(nproc),
                       "--process_id", str(pid)])

    # 2) multi-host RESUME from the step-20 checkpoint: exercises the
    #    process-uniform resume broadcast and the per-host re-placement of
    #    checkpoint leaves (device_put cannot target remote devices)
    resumed = run_training(config_from_args(build_argparser().parse_args(
        common + ["--name", "mh", "--mesh_docs", "4",
                  "--checkpoint_every", "10", "--resume",
                  "--max_steps", "30"])))["synth/mf5"]
    assert np.isfinite(resumed["summary/best_ndcg5"]["NDCG@5"]), resumed

    # 3) unsharded reference, same config, run in-process (local arrays
    #    only — no collectives, so the processes need not stay in step)
    args = build_argparser().parse_args(common + ["--name", "local"])
    local = run_training(config_from_args(args))["synth/mf5"]
    assert np.isfinite(local["summary/best_ndcg5"]["NDCG@5"])

    if pid != 0:
        print("TRAIN_OK follower", flush=True)
        return

    ckpt = out / "mh" / "mf5" / "synth" / "ckpt.npz"
    assert ckpt.exists(), "multi-host checkpoint not written by process 0"

    def series(name, key):
        log = (out / name / "mf5" / "synth" / "train.log").read_text()
        recs = [json.loads(m.group(0)) for m in re.finditer(r"\{.*\}", log)]
        return {r["step"]: r[key] for r in recs if key in r and "step" in r}

    # the resume leg actually continued training past the checkpoint
    mh_train = series("mh", "train/total loss")
    assert {25, 30} <= set(mh_train), sorted(mh_train)

    for key in ("train/total loss", "eval/eval loss", "eval/NDCG@5",
                "eval/Recall@1"):
        a, b = series("local", key), series("mh", key)
        # the mh log additionally carries the resume continuation
        # (steps > 20 and a re-eval of the restored step-20 state, which
        # must equal the original step-20 record it overwrites here)
        assert a and set(a) <= set(b), (key, sorted(a), sorted(b))
        for step in a:
            np.testing.assert_allclose(b[step], a[step], rtol=2e-4,
                                       atol=2e-5,
                                       err_msg=f"{key} @ step {step}")
    print("TRAIN_OK frontend", flush=True)


if __name__ == "__main__":
    main()
