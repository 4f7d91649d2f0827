"""Two-process global-mesh validation of the doc-sharded serving path.

Spawns 2 OS processes (2 virtual CPU devices each -> a 4-device global
mesh) wired by ``jax.distributed``; collectives cross REAL process
boundaries (Gloo). Each process assembles the global index from only its
locally-owned doc rows (parallel/multihost.py) and runs the same shard_map
programs the in-process mesh tests cover — the closest multi-chip/pod
validation obtainable without pod hardware.
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).with_name("_multihost_worker.py")
SERVE_WORKER = Path(__file__).with_name("_multihost_serve_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(script: Path, marker: str, nproc: int = 2,
                 timeout: int = 300) -> None:
    import tempfile

    port = _free_port()
    # per-worker output FILES, not pipes: a worker blocked writing to a full
    # pipe while its peer spins in a collective turns a real failure into a
    # diagnostic-free timeout (pipes only drain sequentially below)
    logs = [tempfile.NamedTemporaryFile("w+", suffix=f"_w{i}.log",
                                        delete=False) for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(nproc),
             f"localhost:{port}"],
            stdout=logs[i], stderr=subprocess.STDOUT,
            cwd=str(script.parent.parent),
        )
        for i in range(nproc)
    ]
    try:
        for p in procs:
            p.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        for q in procs:
            q.kill()
        raise
    finally:
        outs = []
        for f in logs:
            f.flush()
            outs.append(Path(f.name).read_text(errors="replace"))
            f.close()
            Path(f.name).unlink(missing_ok=True)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert marker in out, f"worker {i} missing {marker}:\n{out}"


@pytest.mark.slow
def test_two_process_sharded_serving():
    _run_workers(WORKER, "MULTIHOST_OK")


@pytest.mark.slow
def test_two_process_http_serving():
    """Process 0 answers real HTTP searches; process 1 mirrors each SPMD
    dispatch through MultihostSearchCoordinator.follow()."""
    _run_workers(SERVE_WORKER, "SERVE_OK")


@pytest.mark.slow
def test_two_process_cli_training():
    """The real training CLI as a 2-process multi-host run (mesh_docs=4 over
    a global 4-device mesh) must reproduce the unsharded run's losses and
    metrics step for step; artifacts written by process 0 only."""
    _run_workers(Path(__file__).with_name("_multihost_train_worker.py"),
                 "TRAIN_OK", timeout=600)
