"""Worker for tests/test_multihost.py::test_two_process_http_serving.

Process 0 serves HTTP over the global doc-sharded engine and answers real
POST /search requests (each search broadcast to the followers before the
SPMD dispatch); process 1 mirrors searches in the coordinator's follow
loop. Prints SERVE_OK on success.
"""

import json
import os
import pathlib
import sys
import threading
import urllib.request

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

    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.parallel.multihost import (
        MultihostSearchCoordinator,
        global_doc_mesh,
        init_multihost,
    )
    from evdr_tpu.tools.serve_http import make_server

    init_multihost(coord_addr, nproc, pid)

    rng = np.random.default_rng(11)
    N, LP, LQ, D, K = 21, 6, 5, 16, 3

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    P = unit(rng.normal(size=(N, LP, D))).astype(np.float32)
    pmask = rng.random((N, LP)) > 0.2
    Q = unit(rng.normal(size=(2, LQ, D))).astype(np.float32)

    mesh = global_doc_mesh()
    eng = RetrievalEngine(mesh=mesh, dtype="float32", impl="xla")
    eng.build(P, pmask, docids=[f"d{i}" for i in range(N)])
    coord = MultihostSearchCoordinator(eng)

    if pid != 0:
        coord.follow()
        print("SERVE_OK follower drained", flush=True)
        return

    import tempfile

    save_td = tempfile.mkdtemp(prefix="evdr_mh_save_")
    srv = make_server(coord, host="127.0.0.1", port=0, save_dir=save_td)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()

    body = json.dumps({"queries": Q.tolist(), "k": K}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/search", data=body,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())

    ref = maxsim_numpy(Q, P, np.ones((2, LQ), bool), pmask)
    order = np.argsort(-ref, axis=1, kind="stable")[:, :K]
    expect = [[f"d{j}" for j in row] for row in order]
    assert out["docids"] == expect, (out["docids"], expect)
    np.testing.assert_allclose(np.asarray(out["scores"]),
                               np.take_along_axis(ref, order, axis=1),
                               rtol=2e-5, atol=2e-5)

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
        hz = json.loads(r.read())
    assert hz["n_docs"] == N, hz

    # --- incremental mutations broadcast through the coordinator --------
    # /add -> the new doc is findable; /delete -> gone again; /save ->
    # the collective snapshot writes a loadable packed file. The follower
    # mirrors every mutation in follow() — a desynced follower would hang
    # the next broadcast and fail the whole worker on timeout.
    def post(path, obj):
        rq = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(rq, timeout=120) as rr:
            return json.loads(rr.read())

    new_doc = unit(rng.normal(size=(LP, D))).astype(np.float32)
    res = post("/add", {"documents": [new_doc.tolist()],
                        "docids": ["added0"]})
    assert res == {"added": 1, "n_docs": N + 1}, res
    sres = post("/search", {"queries": [new_doc.tolist()], "k": 2})
    assert sres["docids"][0][0] == "added0", sres["docids"]
    dres = post("/delete", {"docids": ["added0", "d3"]})
    assert dres == {"deleted": 2, "n_docs": N - 1}, dres
    sres2 = post("/search", {"queries": [new_doc.tolist()], "k": 2})
    assert sres2["docids"][0][0] != "added0", sres2["docids"]

    import shutil

    sv = post("/save", {"path": "inc.npz"})
    assert sv["n_docs"] == N - 1, sv
    with np.load(sv["saved"], allow_pickle=False) as z:
        assert z["pmask"].shape[0] == N - 1
        assert "added0" not in z["docid"].tolist()
    shutil.rmtree(save_td, ignore_errors=True)

    coord.stop()
    srv.shutdown()
    print("SERVE_OK frontend", flush=True)


if __name__ == "__main__":
    main()
