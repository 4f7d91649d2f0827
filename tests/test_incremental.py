"""Incremental index updates: engine.add / engine.delete + HTTP endpoints.

New docs serve from a device-side tail index merged exactly into every
search; deletions are tombstones filtered at the merge. The reference repo
rebuilds indexes offline only — this is a beyond-reference serving feature.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from evdr_tpu.engine import RetrievalEngine
from evdr_tpu.ops.maxsim import maxsim_numpy
from evdr_tpu.parallel.mesh import make_mesh


def _unit(x):
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


def _corpus(rng, n, lp=6, d=64):
    protos = _unit(rng.normal(size=(8, d)))
    pick = rng.integers(0, 8, size=(n, lp))
    P = _unit(protos[pick] + 0.15 * rng.normal(size=(n, lp, d))).astype(
        np.float32)
    pmask = rng.random((n, lp)) > 0.15
    return P, pmask


def _queries(rng, P, pmask, nq=10, lq=4):
    src = rng.integers(0, P.shape[0], size=nq)
    Q = _unit(P[src, :lq] + 0.05 * rng.normal(size=(nq, lq, P.shape[2]))
              ).astype(np.float32)
    qm = np.ones((nq, lq), bool)
    return Q, qm


def test_add_matches_fresh_build_exactly(rng):
    """bf16/int8/int4 tiers: per-doc storage transforms are corpus-
    independent, so an incremental engine must return EXACTLY what a fresh
    engine built on the concatenated corpus returns."""
    d = 64
    P1, pm1 = _corpus(rng, 30, d=d)
    P2, pm2 = _corpus(rng, 11, d=d)
    Pa = np.concatenate([P1, np.pad(P2, ((0, 0), (0, 0), (0, 0)))])
    pma = np.concatenate([pm1, pm2])
    Q, qm = _queries(rng, Pa, pma, nq=12)
    for dtype in ("bfloat16", "int8", "int4"):
        inc = RetrievalEngine(dtype=dtype, impl="xla", mesh=make_mesh(1))
        inc.build(P1, pm1)
        assert inc.add(P2, pm2) == 11
        assert inc.n_docs == 41
        fresh = RetrievalEngine(dtype=dtype, impl="xla", mesh=make_mesh(1))
        fresh.build(Pa, pma)
        vi, ii = inc.search_dense(Q, qm, k=5)
        vf, jf = fresh.search_dense(Q, qm, k=5)
        np.testing.assert_array_equal(ii, jf, err_msg=dtype)
        np.testing.assert_allclose(vi, vf, rtol=1e-5, atol=1e-5,
                                   err_msg=dtype)


def test_add_twice_with_different_lp_and_ids(rng):
    """Sequential adds with different token counts pad into one tail;
    custom docids surface through ids_for/search."""
    P1, pm1 = _corpus(rng, 20, lp=6)
    eng = RetrievalEngine(dtype="bfloat16", impl="xla", mesh=make_mesh(1),
                          normalize=True)
    eng.build(P1, pm1, docids=[f"m{i}" for i in range(20)])
    Pa, pma = _corpus(rng, 4, lp=3)
    Pb, pmb = _corpus(rng, 5, lp=9)
    eng.add(Pa, pma, docids=[f"a{i}" for i in range(4)])
    eng.add(Pb, pmb, docids=[f"b{i}" for i in range(5)])
    assert eng.n_docs == 29
    # a query that IS an added doc's tokens finds it top-1 by its id
    Q = Pb[2:3, :3].copy()
    qm = np.ones((1, 3), bool)
    ids, _ = eng.search(list(Q), k=3)
    assert ids[0][0] == "b2"


def test_delete_tombstones_and_merge(rng):
    P, pm = _corpus(rng, 25)
    Q, qm = _queries(rng, P, pm, nq=8)
    eng = RetrievalEngine(dtype="bfloat16", impl="xla", mesh=make_mesh(1))
    eng.build(P, pm)
    v0, i0 = eng.search_dense(Q, qm, k=4)
    victim = int(i0[0, 0])
    assert eng.delete([str(victim)]) == 1
    assert eng.delete([str(victim), "no-such-doc"]) == 0  # idempotent
    assert eng.n_docs == 24
    v1, i1 = eng.search_dense(Q, qm, k=4)
    assert victim not in set(i1.flatten().tolist())
    # query 0's new top-1 is its old #2; other queries unaffected unless
    # they also ranked the victim
    assert i1[0, 0] == i0[0, 1]
    # score_all: tombstoned column is -inf
    sc = eng.score_all(Q, qm)
    assert np.all(np.isneginf(sc[:, victim]))
    # deleting a tail doc works too
    eng.add(P[:3], pm[:3], docids=["t0", "t1", "t2"])
    assert eng.delete(["t1"]) == 1
    _, i2 = eng.search_dense(Q, qm, k=6)
    assert 25 + 1 not in set(i2.flatten().tolist())


def test_add_pq_and_opq_tail_scores_equal_decode_oracle(rng):
    """PQ tails encode against the EXISTING codebooks (compact and
    expanded OPQ); merged scores must equal float MaxSim over the decoded
    main+tail codes."""
    from evdr_tpu.ops.pq import decode_pq

    d = 64
    P1, pm1 = _corpus(rng, 30, d=d)
    P2, pm2 = _corpus(rng, 9, d=d)
    Q, qm = _queries(rng, np.concatenate([P1, P2]),
                     np.concatenate([pm1, pm2]), nq=10)
    for opq in (False, True):
        eng = RetrievalEngine(dtype="pq", impl="xla", pq_opq=opq,
                              mesh=make_mesh(1))
        eng.build(P1, pm1)
        eng.add(P2, pm2)
        assert eng.n_docs == 39
        vals, idx = eng.search_dense(Q, qm, k=5)
        books = np.asarray(eng.index.books)
        rec_main = decode_pq(np.asarray(eng.index.P)[:30], books,
                             expanded=opq)
        rec_tail = decode_pq(np.asarray(eng.tail.P)[:9], books,
                             expanded=opq)
        ref_m = maxsim_numpy(Q, rec_main, qm,
                             np.asarray(eng.index.pmask)[:30])
        ref_t = maxsim_numpy(Q, rec_tail, qm,
                             np.asarray(eng.tail.pmask)[:9])
        ref = np.concatenate([ref_m, ref_t], axis=1)
        order = np.argsort(-ref, axis=1, kind="stable")[:, :5]
        np.testing.assert_allclose(
            vals, np.take_along_axis(ref, order, 1), rtol=2e-4, atol=2e-4)


def test_add_with_pruned_engine(rng):
    """Pruned engines score the tail exactly alongside the pruned main
    search — added docs are findable through n_candidates searches."""
    P1, pm1 = _corpus(rng, 40)
    eng = RetrievalEngine(dtype="bfloat16", impl="xla", prune_centroids=2,
                          mesh=make_mesh(1))
    eng.build(P1, pm1)
    P2, pm2 = _corpus(rng, 6)
    eng.add(P2, pm2, docids=[f"new{i}" for i in range(6)])
    Q = P2[4:5, :4].copy()
    qm = np.ones((1, 4), bool)
    vals, idx = eng.search_dense(Q, qm, k=3, n_candidates=8)
    ids = eng.ids_for(idx)
    assert ids[0][0] == "new4"


def test_add_existing_docid_is_upsert(rng):
    """Re-adding a live docid supersedes the old row: searches return the
    NEW content under that id, delete() removes it completely, and the
    doc count never double-counts."""
    P, pm = _corpus(rng, 10, d=32)
    eng = RetrievalEngine(dtype="bfloat16", impl="xla", mesh=make_mesh(1))
    eng.build(P, pm, docids=[f"d{i}" for i in range(10)])
    # replacement content: far from the original d3
    newP, newpm = _corpus(rng, 1, d=32)
    assert eng.add(newP, newpm, docids=["d3"]) == 1
    assert eng.n_docs == 10  # replaced, not duplicated
    # query = the NEW content finds d3 (the tail copy), and the OLD d3
    # row is gone: a query equal to the old content must not return d3
    Qn = newP[0:1, :3]
    ids, _ = eng.search(list(Qn), k=3)
    assert ids[0][0] == "d3"
    Qold = P[3:4, :3]
    ids_old, _ = eng.search(list(Qold), k=10)
    assert ids_old[0].count("d3") <= 1  # only the tail copy can appear
    assert eng.delete(["d3"]) == 1
    assert eng.n_docs == 9
    ids2, _ = eng.search(list(Qn), k=9)
    assert "d3" not in ids2[0]


def test_auto_ids_never_collide_after_compact(rng):
    """The reviewer's repro: positional ids survive compaction's
    renumbering, so a fresh counter from n_docs could collide. Auto ids
    must skip live id strings."""
    P, pm = _corpus(rng, 12)
    eng = RetrievalEngine(dtype="bfloat16", impl="xla", mesh=make_mesh(1))
    eng.build(P, pm)
    eng.delete(["0", "5"])
    eng.compact()               # ids '1'..'4','6'..'11' survive, n_docs=10
    eng.add(P[:1], pm[:1])      # auto id must NOT be '10' (alive already)
    new_id = eng._tail_ids[0]
    lut_before = {str(i) for row in
                  eng.ids_for(np.arange(10)[:, None]) for i in row}
    assert new_id not in lut_before - {new_id}
    assert eng.delete([new_id]) == 1
    assert eng.n_docs == 10     # the original '10' still serves


def test_compact_failure_restores_state(rng, monkeypatch):
    """A failed compact (device OOM, tunnel error) must leave the engine
    EXACTLY as it was — tombstones still filtering, tail still serving."""
    P, pm = _corpus(rng, 15)
    eng = RetrievalEngine(dtype="bfloat16", impl="xla", mesh=make_mesh(1))
    eng.build(P, pm)
    eng.add(P[:2], pm[:2], docids=["x0", "x1"])
    eng.delete(["3"])
    Q, qm = _queries(rng, P, pm, nq=5)
    v0, i0 = eng.search_dense(Q, qm, k=4)

    def boom(*a, **kw):
        raise RuntimeError("synthetic rebuild failure")

    monkeypatch.setattr(eng, "_compact_build", boom)
    try:
        eng.compact()
        assert False, "expected the synthetic failure to propagate"
    except RuntimeError:
        pass
    assert eng.tail is not None and eng._tombstones == {3}
    assert eng.n_docs == 16
    v1, i1 = eng.search_dense(Q, qm, k=4)
    np.testing.assert_array_equal(i1, i0)


def test_delete_never_recompiles_the_search_program(rng):
    """Tombstones ride a dynamic alive-mask argument on the single-device
    path: consecutive deletes must hit the SAME compiled program."""
    import jax

    P, pm = _corpus(rng, 30)
    eng = RetrievalEngine(dtype="bfloat16", impl="xla", mesh=make_mesh(1))
    eng.build(P, pm)
    Q, qm = _queries(rng, P, pm, nq=4)
    eng.delete(["1"])
    from evdr_tpu.parallel import topk as topk_mod

    with jax.log_compiles(False):
        eng.search_dense(Q, qm, k=3)  # compile once
        sizes0 = topk_mod._single_device_merged_topk._cache_size()
        for d in ("2", "7", "9"):
            eng.delete([d])
            eng.search_dense(Q, qm, k=3)
        assert topk_mod._single_device_merged_topk._cache_size() == sizes0


# slow: full compact e2e (~6s); compact_rebuilds_pruning_summaries,
# compact_failure_restores_state and compact_positional_ids stay fast
@pytest.mark.slow
def test_compact_preserves_results_and_ids(rng):
    """compact() folds tail + drops tombstones: post-compact searches must
    return the same (id, score) results as the incremental engine did, for
    every storage tier — including int4's odd-Lp repack path."""
    d = 64
    P1, pm1 = _corpus(rng, 24, lp=5, d=d)   # odd Lp: int4 repack engages
    P2, pm2 = _corpus(rng, 7, lp=8, d=d)
    Q, qm = _queries(rng, P1, pm1, nq=9)
    for dtype, kw in (("bfloat16", {}), ("int8", {}), ("int4", {}),
                      ("pq", {}), ("pq", {"pq_opq": True})):
        eng = RetrievalEngine(dtype=dtype, impl="xla", mesh=make_mesh(1),
                              **kw)
        eng.build(P1, pm1, docids=[f"m{i}" for i in range(24)])
        eng.add(P2, pm2, docids=[f"t{i}" for i in range(7)])
        eng.delete(["m3", "t2"])
        v0, i0 = eng.search_dense(Q, qm, k=6)
        ids0 = eng.ids_for(i0)
        assert eng.tail is not None and eng._tombstones
        eng.compact()
        assert eng.tail is None and not eng._tombstones
        assert eng.n_docs == 29
        v1, i1 = eng.search_dense(Q, qm, k=6)
        ids1 = eng.ids_for(i1)
        tag = f"{dtype}{kw}"
        assert ids1 == ids0, (tag, ids0[0], ids1[0])
        np.testing.assert_allclose(v1, v0, rtol=1e-4, atol=1e-4,
                                   err_msg=tag)
        # compacting an already-compact engine is a no-op
        assert eng.compact() is eng


def test_compact_positional_ids_survive(rng):
    """Indexes built WITHOUT docids hand out positional id strings;
    compaction renumbers rows but must keep returning the ORIGINAL ids."""
    P, pm = _corpus(rng, 12)
    eng = RetrievalEngine(dtype="bfloat16", impl="xla", mesh=make_mesh(1))
    eng.build(P, pm)
    eng.delete(["0", "5"])
    Q, qm = _queries(rng, P, pm, nq=6)
    ids0 = eng.ids_for(eng.search_dense(Q, qm, k=4)[1])
    eng.compact()
    ids1 = eng.ids_for(eng.search_dense(Q, qm, k=4)[1])
    assert ids1 == ids0
    assert "0" not in {i for row in ids1 for i in row}


def test_compact_rebuilds_pruning_summaries(rng):
    """Pruned engines keep n_candidates working after compaction (the
    summaries are rebuilt from the stored reconstructions)."""
    P1, pm1 = _corpus(rng, 40)
    eng = RetrievalEngine(dtype="int8", impl="xla", prune_centroids=2,
                          mesh=make_mesh(1))
    eng.build(P1, pm1)
    P2, pm2 = _corpus(rng, 6)
    eng.add(P2, pm2, docids=[f"n{i}" for i in range(6)])
    eng.compact()
    assert eng.summary is not None
    Q = P2[1:2, :4].copy()
    qm = np.ones((1, 4), bool)
    _, idx = eng.search_dense(Q, qm, k=3, n_candidates=10)
    assert eng.ids_for(idx)[0][0] == "n1"


# slow: 8-device merge path (~4s); single-device incremental tests
# stay fast and the driver dryrun exercises the mesh engine each round
@pytest.mark.slow
def test_incremental_on_multi_device_mesh(rng):
    """add/delete on an 8-device doc-sharded engine (the host-merge path
    with bucketed over-fetch): results equal the single-device engine's,
    for exact AND pruned searches."""
    import jax

    P1, pm1 = _corpus(rng, 33)
    P2, pm2 = _corpus(rng, 7)
    Q, qm = _queries(rng, np.concatenate([P1, P2]),
                     np.concatenate([pm1, pm2]), nq=10)

    def drive(mesh):
        eng = RetrievalEngine(dtype="bfloat16", impl="xla", mesh=mesh)
        eng.build(P1, pm1, docids=[f"m{i}" for i in range(33)])
        eng.add(P2, pm2, docids=[f"t{i}" for i in range(7)])
        eng.delete(["m5", "t3"])
        v, i = eng.search_dense(Q, qm, k=6)
        return v, eng.ids_for(i)

    v1, ids1 = drive(make_mesh(1))
    v8, ids8 = drive(make_mesh(len(jax.devices())))
    assert ids8 == ids1
    np.testing.assert_allclose(v8, v1, rtol=1e-5, atol=1e-5)

    # pruned engine on the mesh: added docs findable, deleted ones gone
    engp = RetrievalEngine(dtype="bfloat16", impl="xla", prune_centroids=2,
                           mesh=make_mesh(len(jax.devices())))
    engp.build(P1, pm1, docids=[f"m{i}" for i in range(33)])
    engp.add(P2, pm2, docids=[f"t{i}" for i in range(7)])
    engp.delete(["t2"])
    Qx = P2[5:6, :4].copy()
    qmx = np.ones((1, 4), bool)
    _, ip = engp.search_dense(Qx, qmx, k=3, n_candidates=12)
    idsp = engp.ids_for(ip)
    assert idsp[0][0] == "t5"
    assert "t2" not in {x for row in idsp for x in row}


# slow: threaded HTTP stress (~3s); the deterministic add/delete/HTTP
# tests cover the same surfaces in the fast loop
@pytest.mark.slow
def test_concurrent_search_add_delete_stress(rng):
    """Randomized interleaving of searches, adds and deletes from many
    threads through the HTTP surface: no deadlocks, no 5xx, and the final
    corpus state is exactly (initial + adds - deletes)."""
    P, pm = _corpus(rng, 20, d=32)
    eng = RetrievalEngine(dtype="bfloat16", impl="xla", mesh=make_mesh(1))
    eng.build(P, pm, docids=[f"base{i}" for i in range(20)])
    from evdr_tpu.tools.serve_http import make_server

    srv = make_server(eng, port=0, batch_wait_ms=2.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    errors = []

    def post(path, obj):
        req = urllib.request.Request(
            base + path, data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())

    def worker(wid):
        try:
            wrng = np.random.default_rng(wid)
            for op in range(6):
                roll = wrng.random()
                if roll < 0.5:
                    q = _unit(wrng.normal(size=(3, 32))).astype(np.float32)
                    res = post("/search", {"queries": [q.tolist()], "k": 3})
                    assert len(res["docids"][0]) == 3
                elif roll < 0.8:
                    d = _unit(wrng.normal(size=(4, 32))).astype(np.float32)
                    post("/add", {"documents": [d.tolist()],
                                  "docids": [f"w{wid}_{op}"]})
                else:
                    # delete a base doc (idempotent across threads)
                    post("/delete", {"docids":
                                     [f"base{int(wrng.integers(5))}"]})
        except Exception as e:  # noqa: BLE001
            errors.append(f"w{wid}: {type(e).__name__}: {e}")

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "stress worker deadlocked"
    assert not errors, errors
    # invariant: alive count == 20 + unique adds - unique base deletes
    n_added = len(eng._tail_ids)
    n_deleted = len(eng._tombstones)
    assert eng.n_docs == 20 + n_added - n_deleted
    # a final search still answers correctly after the churn
    q = P[10:11, :3].copy()
    ids, _ = eng.search(list(q), k=5)
    assert len(ids[0]) == 5
    srv.shutdown()
    srv.server_close()


# slow: all-tier roundtrip (~4s); the pq roundtrip + /save endpoint
# tests keep the persistence path in the fast loop
@pytest.mark.slow
def test_save_npz_roundtrips_every_tier(rng, tmp_path):
    """save_npz persists the logical corpus (tail merged, tombstones
    dropped); from_npz on a same-dtype engine reproduces the incremental
    engine's results exactly, id-for-id."""
    d = 64
    P1, pm1 = _corpus(rng, 22, lp=5, d=d)
    P2, pm2 = _corpus(rng, 6, lp=8, d=d)
    Q, qm = _queries(rng, P1, pm1, nq=8)
    for dtype, kw in (("bfloat16", {}), ("float32", {}), ("int8", {}),
                      ("int4", {}), ("pq", {}), ("pq", {"pq_opq": True})):
        eng = RetrievalEngine(dtype=dtype, impl="xla", mesh=make_mesh(1),
                              **kw)
        eng.build(P1, pm1, docids=[f"m{i}" for i in range(22)])
        eng.add(P2, pm2, docids=[f"t{i}" for i in range(6)])
        eng.delete(["m2", "t5"])
        v0, i0 = eng.search_dense(Q, qm, k=5)
        ids0 = eng.ids_for(i0)
        path = tmp_path / f"saved_{dtype}_{bool(kw)}.npz"
        eng.save_npz(path)
        eng2 = RetrievalEngine.from_npz(path, dtype=dtype, impl="xla",
                                        mesh=make_mesh(1), **kw)
        assert eng2.n_docs == 26
        v1, i1 = eng2.search_dense(Q, qm, k=5)
        ids1 = eng2.ids_for(i1)
        tag = f"{dtype}{kw}"
        assert ids1 == ids0, (tag, ids0[0], ids1[0])
        np.testing.assert_allclose(v1, v0, rtol=1e-4, atol=1e-4,
                                   err_msg=tag)


def test_http_save_endpoint(rng, tmp_path):
    """POST /save writes only *.npz files directly under the configured
    --save_dir; free paths (traversal) are rejected and the endpoint is
    disabled entirely without the flag."""
    import urllib.error

    P, pm = _corpus(rng, 10, d=32)
    eng = RetrievalEngine(dtype="int8", impl="xla", mesh=make_mesh(1))
    eng.build(P, pm)
    from evdr_tpu.tools.serve_http import make_server

    srv = make_server(eng, port=0, save_dir=tmp_path)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    def post_save(name):
        body = json.dumps({"path": name}).encode()
        req = urllib.request.Request(base + "/save", data=body,
                                     headers={"Content-Type":
                                              "application/json"})
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    try:
        res = post_save("snap.npz")
        assert res["n_docs"] == 10
        assert res["saved"] == str(tmp_path / "snap.npz")
        eng2 = RetrievalEngine.from_npz(tmp_path / "snap.npz",
                                        dtype="int8", impl="xla",
                                        mesh=make_mesh(1))
        assert eng2.n_docs == 10
        # traversal / free paths / wrong extension -> 400
        for bad in ("../evil.npz", "/etc/evil.npz", "sub/nested.npz",
                    "snap.txt"):
            try:
                post_save(bad)
                assert False, f"expected 400 for {bad!r}"
            except urllib.error.HTTPError as e:
                assert e.code == 400, (bad, e.code)
    finally:
        srv.shutdown()
        srv.server_close()

    # without --save_dir the endpoint is disabled (403)
    srv2 = make_server(eng, port=0)
    threading.Thread(target=srv2.serve_forever, daemon=True).start()
    base2 = f"http://127.0.0.1:{srv2.server_address[1]}"
    try:
        req = urllib.request.Request(
            f"{base2}/save", data=json.dumps({"path": "x.npz"}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            assert False, "expected 403"
        except urllib.error.HTTPError as e:
            assert e.code == 403
    finally:
        srv2.shutdown()
        srv2.server_close()


def test_pq_pruned_engine_roundtrips_through_save(rng, tmp_path):
    """The PLAID-combo engine (dtype='pq' + prune_centroids) has a
    durability path: from_npz rebuilds summaries from the decoded
    reconstructions instead of refusing the PQ file."""
    P, pm = _corpus(rng, 30, d=64)
    eng = RetrievalEngine(dtype="pq", impl="xla", prune_centroids=2,
                          mesh=make_mesh(1))
    eng.build(P, pm)
    Q, qm = _queries(rng, P, pm, nq=6)
    v0, i0 = eng.search_dense(Q, qm, k=4, n_candidates=30)
    eng.save_npz(tmp_path / "plaid.npz")
    eng2 = RetrievalEngine.from_npz(tmp_path / "plaid.npz", dtype="pq",
                                    impl="xla", prune_centroids=2,
                                    mesh=make_mesh(1))
    assert eng2.summary is not None
    # all-candidates pruned search equals the exact PQ search either way
    v1, i1 = eng2.search_dense(Q, qm, k=4, n_candidates=30)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_allclose(v1, v0, rtol=2e-4, atol=2e-4)


def test_http_add_and_delete_endpoints(rng):
    P, pm = _corpus(rng, 15, d=32)
    eng = RetrievalEngine(dtype="float32", impl="xla", mesh=make_mesh(1))
    eng.build(P, pm, docids=[f"d{i}" for i in range(15)])
    from evdr_tpu.tools.serve_http import make_server

    srv = make_server(eng, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        new_doc = _unit(rng.normal(size=(4, 32))).astype(np.float32)
        body = json.dumps({"documents": [new_doc.tolist()],
                           "docids": ["added0"]}).encode()
        req = urllib.request.Request(base + "/add", data=body,
                                     headers={"Content-Type":
                                              "application/json"})
        with urllib.request.urlopen(req) as r:
            res = json.loads(r.read())
        assert res == {"added": 1, "n_docs": 16}

        sbody = json.dumps({"queries": [new_doc.tolist()], "k": 2}).encode()
        sreq = urllib.request.Request(base + "/search", data=sbody,
                                      headers={"Content-Type":
                                               "application/json"})
        with urllib.request.urlopen(sreq) as r:
            sres = json.loads(r.read())
        assert sres["docids"][0][0] == "added0"

        dbody = json.dumps({"docids": ["added0"]}).encode()
        dreq = urllib.request.Request(base + "/delete", data=dbody,
                                      headers={"Content-Type":
                                               "application/json"})
        with urllib.request.urlopen(dreq) as r:
            dres = json.loads(r.read())
        assert dres == {"deleted": 1, "n_docs": 15}
        with urllib.request.urlopen(sreq) as r:
            sres2 = json.loads(r.read())
        assert sres2["docids"][0][0] != "added0"
    finally:
        srv.shutdown()
        srv.server_close()


def test_add_rejects_malformed_batch_and_engine_stays_usable(rng):
    """A wrong-dim/wrong-shape add() must raise AT add() time, not poison
    the lazy tail: the old eager build surfaced such errors inside add(),
    but with deferred consolidation an accepted bad batch would wedge
    every later search/compact/save permanently (via evdr-serve: one bad
    POST /add = an unrecoverable remote 500-forever)."""
    d = 32
    P1, pm1 = _corpus(rng, 12, d=d)
    eng = RetrievalEngine(dtype="float32", impl="xla", mesh=make_mesh(1))
    eng.build(P1, pm1)
    Q, qm = _queries(rng, P1, pm1, nq=4)
    ok_vals, ok_idx = eng.search_dense(Q, qm, k=3)

    bad_d = rng.normal(size=(2, 5, d // 2)).astype(np.float32)
    with pytest.raises(ValueError, match="add\\(\\) embeddings"):
        eng.add(bad_d, np.ones((2, 5), bool))
    with pytest.raises(ValueError, match="add\\(\\) embeddings"):
        eng.add(rng.normal(size=(2, 5 * d)).astype(np.float32),
                np.ones((2, 5), bool))                    # ndim != 3
    with pytest.raises(ValueError, match="pmask shape"):
        eng.add(rng.normal(size=(2, 5, d)).astype(np.float32),
                np.ones((2, 4), bool))

    # nothing was mutated: the engine still serves identical results and
    # a good add still works
    assert eng.n_docs == 12
    v2, i2 = eng.search_dense(Q, qm, k=3)
    np.testing.assert_array_equal(ok_idx, i2)
    P2, pm2 = _corpus(rng, 3, d=d)
    assert eng.add(P2, pm2) == 3
    eng.search_dense(Q, qm, k=3)
    assert eng.n_docs == 15
