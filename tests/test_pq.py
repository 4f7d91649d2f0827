"""Product-quantized index: training/encode/score parity and quality."""

import numpy as np
import pytest

from evdr_tpu.ops.maxsim import maxsim_numpy
from evdr_tpu.ops.pq import decode_pq, encode_pq, maxsim_pq_xla, train_pq


def _corpus(rng, n=40, lp=6, lq=5, nq=12, d=64):
    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    # clustered tokens (PQ presumes structure): a few shared prototypes
    # plus small noise, like real patch embeddings
    protos = unit(rng.normal(size=(8, d)))
    pick = rng.integers(0, 8, size=(n, lp))
    P = unit(protos[pick] + 0.15 * rng.normal(size=(n, lp, d))).astype(
        np.float32)
    pmask = rng.random((n, lp)) > 0.15
    pmask[3] = False  # fully-masked doc: exact-0 score semantics
    # queries = noisy copies of doc tokens -> ground-truth top-1 is known
    src = rng.integers(0, n, size=nq)
    Q = np.stack([P[s, :lq] for s in src])
    Q = unit(Q + 0.05 * rng.normal(size=Q.shape)).astype(np.float32)
    qmask = rng.random((nq, lq)) > 0.1
    return P, pmask, Q, qmask, src


def test_pq_scoring_equals_reconstruction_oracle(rng):
    P, pmask, Q, qmask, _ = _corpus(rng)
    books = train_pq(P, pmask, m=16, iters=6, seed=0)
    codes = encode_pq(P, books, pmask)
    assert codes.dtype == np.uint8 and codes.shape == (*P.shape[:2], 16)
    ref = maxsim_numpy(Q, decode_pq(codes, books), qmask, pmask)
    got = np.asarray(maxsim_pq_xla(Q, codes, qmask, pmask, books, chunk_p=8))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    # fully-masked doc scores exactly 0 (reference all-invalid semantics)
    np.testing.assert_array_equal(got[:, 3], 0.0)


def test_pq_chunking_invariant(rng):
    P, pmask, Q, qmask, _ = _corpus(rng, n=23)
    books = train_pq(P, pmask, m=8, iters=4, seed=1)
    codes = encode_pq(P, books, pmask)
    a = np.asarray(maxsim_pq_xla(Q, codes, qmask, pmask, books, chunk_p=23))
    b = np.asarray(maxsim_pq_xla(Q, codes, qmask, pmask, books, chunk_p=5))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_pq_retrieval_quality(rng):
    """Clustered corpus + near-duplicate queries: PQ at 8 subspaces must
    keep top-1 retrieval (scores are lossy, ranks of near-dups are not)."""
    P, pmask, Q, qmask, src = _corpus(rng, n=60, nq=24)
    exact = maxsim_numpy(Q, P, qmask, pmask)
    books = train_pq(P, pmask, m=16, iters=8, seed=0)
    codes = encode_pq(P, books, pmask)
    got = np.asarray(maxsim_pq_xla(Q, codes, qmask, pmask, books))
    agree = float(np.mean(np.argmax(got, 1) == np.argmax(exact, 1)))
    assert agree >= 0.85, agree


def test_pq_train_validates(rng):
    P = rng.normal(size=(4, 3, 30)).astype(np.float32)
    with pytest.raises(ValueError):
        train_pq(P, m=16)  # 30 % 16 != 0
    with pytest.raises(ValueError):
        train_pq(np.zeros((2, 2, 32), np.float32),
                 pmask=np.zeros((2, 2), bool), m=8)  # no valid tokens


def test_pq_engine_exact_and_sharded(rng, tmp_path):
    """dtype='pq' through the public engine: single-device and the 8-device
    mesh must agree with scoring the reconstructed index, and a --dtype pq
    packed file must round-trip through from_npz."""
    import jax

    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.parallel.mesh import make_mesh

    P, pmask, Q, qmask, _ = _corpus(rng, n=41)
    eng = RetrievalEngine(dtype="pq", impl="xla", pq_m=16,
                          mesh=make_mesh(1))
    eng.build(P, pmask, docids=[f"d{i}" for i in range(41)])
    vals, idx = eng.search_dense(Q, qmask, k=5)
    # oracle: reconstruct the engine's own (normalized) index
    Pn = P * pmask[..., None]
    Pn = Pn / (np.linalg.norm(Pn, axis=-1, keepdims=True) + 1e-12)
    books = np.asarray(eng.index.books)
    rec = decode_pq(np.asarray(eng.index.P)[:41], books)
    ref = maxsim_numpy(Q, rec, qmask, pmask)
    order = np.argsort(-ref, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(idx, order)
    np.testing.assert_allclose(vals, np.take_along_axis(ref, order, 1),
                               rtol=2e-5, atol=2e-5)

    # 8-device doc-sharded mesh: identical results
    eng8 = RetrievalEngine(dtype="pq", impl="xla", pq_m=16,
                           mesh=make_mesh(len(jax.devices())))
    eng8.build(P, pmask, docids=[f"d{i}" for i in range(41)])
    v8, i8 = eng8.search_dense(Q, qmask, k=5)
    # PQ training is seeded identically -> same codes -> same scores
    np.testing.assert_allclose(v8, vals, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(i8, idx)

    # packed --dtype pq file -> from_npz round trip
    from evdr_tpu.tools.convert_packed import convert_payload_to_packed

    packed = convert_payload_to_packed(
        {"documents": _as_ragged(P, pmask),
         "docid": [f"d{i}" for i in range(41)]},
        dtype="pq", normalize=True, pq_m=16)
    np.savez(tmp_path / "pq.npz", **packed)
    engf = RetrievalEngine.from_npz(tmp_path / "pq.npz", dtype="pq",
                                    impl="xla", mesh=make_mesh(1))
    fv, fi = engf.search_dense(Q, qmask, k=5)
    assert fi.shape == (Q.shape[0], 5)
    # quality floor: packed-file PQ top-1 agrees with the exact fp32 search
    exact = maxsim_numpy(Q, Pn, qmask, pmask)
    agree = float(np.mean(fi[:, 0] == np.argmax(exact, 1)))
    assert agree >= 0.8, agree


def test_pq_with_pruning(rng):
    """The PLAID combination: float summaries prune, PQ candidates rerank.
    With every doc as a candidate the result equals the exact PQ search."""
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.parallel.mesh import make_mesh

    P, pmask, Q, qmask, _ = _corpus(rng, n=41)
    exact = RetrievalEngine(dtype="pq", impl="xla", mesh=make_mesh(1))
    exact.build(P, pmask)
    ev, ei = exact.search_dense(Q, qmask, k=5)

    eng = RetrievalEngine(dtype="pq", impl="xla", prune_centroids=2,
                          mesh=make_mesh(1))
    eng.build(P, pmask)
    pv, pi = eng.search_dense(Q, qmask, k=5, n_candidates=41)
    np.testing.assert_array_equal(pi, ei)
    np.testing.assert_allclose(pv, ev, rtol=2e-5, atol=2e-5)

    # pruned-for-real (a fraction of the corpus) keeps top-1
    pv1, pi1 = eng.search_dense(Q, qmask, k=1, n_candidates=8)
    agree = float(np.mean(pi1[:, 0] == ei[:, 0]))
    assert agree >= 0.8, agree


@pytest.mark.parametrize("sdt", ["int8", "int4"])
def test_pq_pruned_quantized_summaries(rng, sdt, tmp_path):
    """``summary_dtype`` stores the stage-1 summary index quantized (for
    PQ+pruned capacity builds the default bf16 summaries dominate total
    bytes). Stage 2 is untouched, so with every doc as a candidate the
    search still equals the exact PQ search; real pruning keeps top-1; the
    setting survives the save_npz/from_npz round trip."""
    import jax.numpy as jnp

    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.parallel.mesh import make_mesh

    P, pmask, Q, qmask, _ = _corpus(rng, n=41)
    exact = RetrievalEngine(dtype="pq", impl="xla", mesh=make_mesh(1))
    exact.build(P, pmask)
    ev, ei = exact.search_dense(Q, qmask, k=5)

    eng = RetrievalEngine(dtype="pq", impl="xla", prune_centroids=2,
                          summary_dtype=sdt, mesh=make_mesh(1))
    eng.build(P, pmask)
    assert eng.summary.P.dtype == (jnp.int8 if sdt == "int8" else jnp.uint8)
    assert eng.summary.scales is not None
    pv, pi = eng.search_dense(Q, qmask, k=5, n_candidates=41)
    np.testing.assert_array_equal(pi, ei)
    np.testing.assert_allclose(pv, ev, rtol=2e-5, atol=2e-5)
    pv1, pi1 = eng.search_dense(Q, qmask, k=1, n_candidates=8)
    agree = float(np.mean(pi1[:, 0] == ei[:, 0]))
    assert agree >= 0.8, agree

    path = tmp_path / "pqsum.npz"
    eng.save_npz(path)
    eng2 = RetrievalEngine.from_npz(path, dtype="pq", impl="xla",
                                    prune_centroids=2, summary_dtype=sdt,
                                    mesh=make_mesh(1))
    assert eng2.summary.P.dtype == eng.summary.P.dtype
    rv, ri = eng2.search_dense(Q, qmask, k=5, n_candidates=41)
    np.testing.assert_array_equal(ri, ei)


@pytest.mark.parametrize("expanded", [False, True])
def test_pq_rerank_onehot_decode_parity(rng, expanded):
    """pq_decode='onehot' (one-hot x codebook MXU dots) reproduces the
    take-based candidate decode exactly: the one-hot dot has a single
    nonzero per row and the zero terms add exactly in f32."""
    from evdr_tpu.ops.pq import expand_books, train_opq
    from evdr_tpu.ops.pruned import rerank_candidates

    P, pmask, Q, qmask, _ = _corpus(rng, n=30)
    if expanded:
        obooks, rot = train_opq(P, pmask, m=8)
        books = expand_books(obooks, rot)
        codes = encode_pq(P, obooks, pmask, rot=rot)
    else:
        books = train_pq(P, pmask, m=8)
        codes = encode_pq(P, books, pmask)
    cand = rng.integers(0, 30, size=(Q.shape[0], 9))

    v1, i1 = rerank_candidates(Q, qmask, codes, pmask, cand, k=3,
                               books=books)
    v2, i2 = rerank_candidates(Q, qmask, codes, pmask, cand, k=3,
                               books=books, pq_decode="onehot")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_chunked_pq_summary_builder(rng):
    """build_summary_tokens_from_pq == decode-then-build when the chunk
    covers the corpus (identical seeds per 16384-stride); small chunks
    still yield normalized, occupancy-consistent summaries."""
    from evdr_tpu.ops.pruned import (build_summary_tokens,
                                     build_summary_tokens_from_pq)

    P, pmask, _, _, _ = _corpus(rng, n=23)
    books = train_pq(P, pmask, m=8)
    codes = encode_pq(P, books, pmask)

    S1, m1 = build_summary_tokens(decode_pq(codes, books), pmask,
                                  k_centroids=2)
    S2, m2 = build_summary_tokens_from_pq(codes, books, pmask,
                                          k_centroids=2)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_allclose(S1, S2, rtol=1e-6, atol=1e-6)

    S3, m3 = build_summary_tokens_from_pq(codes, books, pmask,
                                          k_centroids=2, chunk_pages=7)
    assert S3.shape == S1.shape and m3.shape == m1.shape
    nrm = np.linalg.norm(S3, axis=-1)
    assert np.all((np.abs(nrm - 1.0) < 1e-5) | (nrm == 0.0))
    assert np.all((nrm > 0) == m3)


def test_pq_auto_rows_policy():
    """Serving shapes get ONE q-block (decode re-runs per q-block — the
    chip-measured +47%); long docs keep the 4096 default; the 8192 VMEM
    legality cap holds."""
    from evdr_tpu.ops.pallas_maxsim import _pick_tiles, _pq_auto_rows

    # config-5-like: 256 queries x 32 tokens at Lp=16 -> full batch, one
    # q-block (the old default 4096 split it into two)
    rows = _pq_auto_rows(256, 32, 16)
    assert rows == 8192
    qb, lq_pad, _, _ = _pick_tiles(32, 16, rows, 1536, nq=256)
    assert qb * lq_pad >= 256 * 32  # n_qb == 1
    # small batches keep the floor (qb clamps to nq anyway)
    assert _pq_auto_rows(64, 32, 16) == 4096
    # beyond the measured-legal QBL: capped
    assert _pq_auto_rows(1024, 32, 16) == 8192
    # long docs amortize the decode identically (longdoc sweep: 114.6 vs
    # 77.4 TFLOP/s at Lp=768)
    assert _pq_auto_rows(256, 32, 768) == 8192


def test_summary_dtype_validated():
    from evdr_tpu.engine import RetrievalEngine

    with pytest.raises(ValueError, match="summary_dtype"):
        RetrievalEngine(dtype="pq", summary_dtype="pq")


def _as_ragged(P, pmask):
    """Dense padded (N, Lp, D) + mask -> the interchange object-array form."""
    out = np.empty(P.shape[0], dtype=object)
    for i in range(P.shape[0]):
        rows = P[i][pmask[i]]
        if rows.shape[0] == 0:
            rows = np.zeros((1, P.shape[2]), np.float32)
        out[i] = rows
    return out


def test_opq_scoring_matches_expanded_reconstruction(rng):
    """Expanded OPQ books score exactly like the float MaxSim over the
    sum-decoded reconstruction, and identically to scoring ROTATED queries
    against the compact rotated-space books (the rotation-invariance
    identity the fold-in relies on)."""
    from evdr_tpu.ops.pq import expand_books, train_opq

    P, pmask, Q, qmask, _ = _corpus(rng)
    books, rot = train_opq(P, pmask, m=16, iters=6, opq_iters=3, seed=0)
    # rotation is orthogonal
    np.testing.assert_allclose(rot @ rot.T, np.eye(rot.shape[0]),
                               rtol=0, atol=1e-5)
    codes = encode_pq(P, books, pmask, rot=rot)
    exp = expand_books(books, rot)
    assert exp.shape == (16, 256, P.shape[2])
    got = np.asarray(maxsim_pq_xla(Q, codes, qmask, pmask, exp, chunk_p=8))
    # oracle 1: float MaxSim over the expanded (sum) reconstruction
    ref = maxsim_numpy(Q, decode_pq(codes, exp, expanded=True), qmask, pmask)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # oracle 2: rotated queries against the compact rotated-space books
    Qr = (Q.reshape(-1, Q.shape[-1]) @ rot.T).reshape(Q.shape)
    ref2 = np.asarray(maxsim_pq_xla(Qr, codes, qmask, pmask, books,
                                    chunk_p=8))
    np.testing.assert_allclose(got, ref2, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(got[:, 3], 0.0)  # all-invalid doc -> 0


def test_opq_reduces_reconstruction_error_on_correlated_tokens(rng):
    """On tokens with strong CROSS-subspace correlation (a random linear
    mix of a low-dim latent), the learned rotation must cut quantization
    error vs plain PQ at identical bytes."""
    from evdr_tpu.ops.pq import expand_books, train_opq, train_pq

    d, m = 64, 16
    latent = rng.normal(size=(1200, 12)).astype(np.float32)
    mix = rng.normal(size=(12, d)).astype(np.float32)
    X = (latent @ mix + 0.05 * rng.normal(size=(1200, d))).astype(np.float32)
    X /= np.linalg.norm(X, axis=-1, keepdims=True)
    P = X.reshape(120, 10, d)
    pmask = np.ones((120, 10), bool)

    books_pq = train_pq(P, pmask, m=m, iters=6, seed=0)
    err_pq = np.mean((decode_pq(encode_pq(P, books_pq, pmask), books_pq)
                      - P) ** 2)
    books_o, rot = train_opq(P, pmask, m=m, iters=6, opq_iters=4, seed=0)
    codes_o = encode_pq(P, books_o, pmask, rot=rot)
    rec_o = decode_pq(codes_o, expand_books(books_o, rot), expanded=True)
    err_opq = np.mean((rec_o - P) ** 2)
    assert err_opq < 0.9 * err_pq, (err_opq, err_pq)


def test_opq_engine_pruning_and_packed_roundtrip(rng, tmp_path):
    """pq_opq=True through the public engine (exact + pruned rerank with
    expanded books), and a --pq_opq packed file through from_npz with both
    a PQ engine and a float engine (the sum-decode path)."""
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.ops.pq import books_expanded
    from evdr_tpu.parallel.mesh import make_mesh
    from evdr_tpu.tools.convert_packed import convert_payload_to_packed

    P, pmask, Q, qmask, _ = _corpus(rng, n=41)
    eng = RetrievalEngine(dtype="pq", impl="xla", pq_opq=True,
                          mesh=make_mesh(1))
    eng.build(P, pmask)
    assert books_expanded(np.asarray(eng.index.books), P.shape[2])
    vals, idx = eng.search_dense(Q, qmask, k=5)
    rec = decode_pq(np.asarray(eng.index.P)[:41],
                    np.asarray(eng.index.books), expanded=True)
    ref = maxsim_numpy(Q, rec, qmask, pmask)
    order = np.argsort(-ref, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(idx, order)
    np.testing.assert_allclose(vals, np.take_along_axis(ref, order, 1),
                               rtol=2e-4, atol=2e-4)

    # pruned rerank over expanded books: all-candidates == exact PQ search
    engp = RetrievalEngine(dtype="pq", impl="xla", pq_opq=True,
                           prune_centroids=2, mesh=make_mesh(1))
    engp.build(P, pmask)
    pv, pi = engp.search_dense(Q, qmask, k=5, n_candidates=41)
    np.testing.assert_array_equal(pi, idx)
    np.testing.assert_allclose(pv, vals, rtol=2e-4, atol=2e-4)

    packed = convert_payload_to_packed(
        {"documents": _as_ragged(P, pmask)}, dtype="pq", normalize=True,
        pq_opq=True)
    assert bool(packed["P_pq_expanded"])
    np.savez(tmp_path / "opq.npz", **packed)
    engf = RetrievalEngine.from_npz(tmp_path / "opq.npz", dtype="pq",
                                    impl="xla", mesh=make_mesh(1))
    fv, fi = engf.search_dense(Q, qmask, k=5)
    # identical training seeds -> identical codes/books -> same results as
    # an in-memory build from the same normalized tokens
    Pn = P * pmask[..., None]
    Pn = (Pn / (np.linalg.norm(Pn, axis=-1, keepdims=True) + 1e-12)).astype(
        np.float32)
    engm = RetrievalEngine(dtype="pq", impl="xla", pq_opq=True,
                           normalize=False, mesh=make_mesh(1))
    engm.build(Pn, pmask)
    mv, mi = engm.search_dense(Q, qmask, k=5)
    np.testing.assert_array_equal(fi, mi)
    np.testing.assert_allclose(fv, mv, rtol=2e-4, atol=2e-4)

    # float engine over the same OPQ file: decode path honors the expanded
    # flag, so scores match the PQ engine's (same reconstructions)
    engd = RetrievalEngine.from_npz(tmp_path / "opq.npz", dtype="float32",
                                    impl="xla", mesh=make_mesh(1))
    dv, di = engd.search_dense(Q, qmask, k=5)
    np.testing.assert_array_equal(di, fi)
    np.testing.assert_allclose(dv, fv, rtol=2e-4, atol=2e-4)


def test_encode_pq_device_matches_host_encoder(rng):
    """The accelerator encoder assigns the same nearest centroids as the
    host encoder (up to genuine distance ties, improbable on random
    floats); disagreements, if any, must be equal-distance."""
    from evdr_tpu.ops.pq import encode_pq_device, train_opq

    P, pmask, _, _, _ = _corpus(rng, n=50)
    books = train_pq(P, pmask, m=8, iters=6, seed=0)
    host = encode_pq(P, books, pmask)
    dev = encode_pq_device(P, books, pmask, chunk_tokens=64)  # multi-chunk
    agree = float(np.mean(host == dev))
    assert agree >= 0.999, agree
    if not np.array_equal(host, dev):
        # any tie must reconstruct to the same distance
        dh = np.linalg.norm(decode_pq(host, books) - P, axis=-1)
        dd = np.linalg.norm(decode_pq(dev, books) - P, axis=-1)
        np.testing.assert_allclose(dh, dd, rtol=1e-4, atol=1e-5)

    # with an OPQ rotation threaded through
    books_o, rot = train_opq(P, pmask, m=8, iters=4, opq_iters=2, seed=0)
    host_o = encode_pq(P, books_o, pmask, rot=rot)
    dev_o = encode_pq_device(P, books_o, pmask, rot=rot)
    assert float(np.mean(host_o == dev_o)) >= 0.999


@pytest.mark.slow
def test_opq_beats_pq_retrieval_on_correlated_corpus(rng):
    """The OPQ retrieval win, not just the MSE win: correlated tokens +
    noisy queries (near-tie regime) at the aggressive m=8 tier — the
    rotation must recover substantially more exact-top-1s than plain PQ
    (measured 34.4% vs 7.4% at 4k docs; this is a smaller pinned-seed
    version)."""
    from evdr_tpu.ops.pq import expand_books, train_opq

    d, m, n, lp = 64, 8, 800, 6
    lat = rng.normal(size=(n * lp, 12)).astype(np.float32)
    mix = rng.normal(size=(12, d)).astype(np.float32)
    X = lat @ mix + 0.05 * rng.normal(size=(n * lp, d)).astype(np.float32)
    X /= np.linalg.norm(X, axis=-1, keepdims=True)
    P = X.reshape(n, lp, d).astype(np.float32)
    pm = np.ones((n, lp), bool)
    nq, lq = 96, 3
    src = rng.integers(0, n, size=nq)
    Q = P[src, :lq] + 0.45 * rng.normal(size=(nq, lq, d)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=-1, keepdims=True)
    qm = np.ones((nq, lq), bool)
    top1 = np.argmax(maxsim_numpy(Q, P, qm, pm), axis=1)

    bp = train_pq(P, pm, m=m, iters=8, seed=0)
    sc_pq = np.asarray(maxsim_pq_xla(Q, encode_pq(P, bp, pm), qm, pm, bp,
                                     chunk_p=256))
    bo, rot = train_opq(P, pm, m=m, iters=8, opq_iters=6, seed=0)
    sc_o = np.asarray(maxsim_pq_xla(Q, encode_pq(P, bo, pm, rot=rot), qm,
                                    pm, expand_books(bo, rot), chunk_p=256))
    acc_pq = float(np.mean(np.argmax(sc_pq, 1) == top1))
    acc_o = float(np.mean(np.argmax(sc_o, 1) == top1))
    assert acc_o > acc_pq + 0.1, (acc_pq, acc_o)


def test_serve_warm_dim_for_both_book_layouts(rng):
    """evdr-serve's warm-up derives the query dim with no query in hand:
    compact books -> M * (D/M), expanded OPQ books -> D directly. A wrong
    dim would warm (and cache) a shape no real request ever hits."""
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.parallel.mesh import make_mesh
    from evdr_tpu.tools.serve_http import warm_query_dim

    P, pmask, _, _, _ = _corpus(rng, n=20)
    d = P.shape[2]
    for opq in (False, True):
        eng = RetrievalEngine(dtype="pq", impl="xla", pq_opq=opq,
                              mesh=make_mesh(1))
        eng.build(P, pmask)
        assert warm_query_dim(eng) == d, (opq, warm_query_dim(eng))
    engf = RetrievalEngine(dtype="bfloat16", impl="xla", mesh=make_mesh(1))
    engf.build(P, pmask)
    assert warm_query_dim(engf) == d


def test_pq_tiny_corpus_fewer_tokens_than_centroids(rng):
    """n*lp < K: codebooks degrade to the token set itself; encode/decode
    must round-trip those tokens exactly."""
    P = rng.normal(size=(3, 4, 16)).astype(np.float32)
    pmask = np.ones((3, 4), bool)
    books = train_pq(P, pmask, m=4, k=256, iters=2, seed=0)
    codes = encode_pq(P, books, pmask)
    np.testing.assert_allclose(decode_pq(codes, books), P, rtol=1e-5,
                               atol=1e-6)


# ---------------------------------------------------------------------------
# fused Pallas PQ kernel (decode-in-VMEM): interpret-mode parity vs the
# reconstruction oracle. The XLA LUT path above stays the portable
# fallback; the kernel is the serving path (chip: the LUT path measured
# 17.4 q/s vs 2,561 for the fused bf16 tier — bench_artifacts/tpuq/
# bench_pq2.out).
# ---------------------------------------------------------------------------

def _pq_kernel(Q, codes, qmask, pmask, books, **kw):
    import jax.numpy as jnp

    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_pq

    return np.asarray(maxsim_pallas_pq(
        jnp.asarray(Q), jnp.asarray(codes), jnp.asarray(qmask),
        jnp.asarray(pmask), jnp.asarray(books),
        compute_dtype=jnp.float32, interpret=True, **kw))


def test_pq_kernel_parity_compact_books(rng):
    P, pmask, Q, qmask, _ = _corpus(rng, d=128)
    books = train_pq(P, pmask, m=16, iters=6, seed=0)
    codes = encode_pq(P, books, pmask)
    ref = maxsim_numpy(Q, decode_pq(codes, books), qmask, pmask)
    got = _pq_kernel(Q, codes, qmask, pmask, books, book_quant=False)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got[:, 3], 0.0)  # fully-masked doc


def test_pq_kernel_parity_expanded_opq_books(rng):
    from evdr_tpu.ops.pq import expand_books, train_opq

    P, pmask, Q, qmask, _ = _corpus(rng, d=128)
    obooks, rot = train_opq(P, pmask, m=16, iters=4, opq_iters=3, seed=0)
    codes = encode_pq(P, obooks, pmask, rot=rot)
    ebooks = expand_books(obooks, rot)
    ref = maxsim_numpy(Q, decode_pq(codes, ebooks, expanded=True), qmask,
                       pmask)
    got = _pq_kernel(Q, codes, qmask, pmask, ebooks, book_quant=False)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pq_kernel_book_quant_matches_host_quantized_oracle(rng):
    """book_quant=True scores == the oracle computed on HOST-quantized
    books (same global-scale int8 formula), exactly up to f32 rounding."""
    P, pmask, Q, qmask, _ = _corpus(rng, d=128)
    books = train_pq(P, pmask, m=16, iters=6, seed=0)
    codes = encode_pq(P, books, pmask)
    # embed compact books full-width, quantize with the kernel's formula
    m, k, ds = books.shape
    E = np.zeros((m, k, m * ds), np.float32)
    for j in range(m):
        E[j, :, j * ds:(j + 1) * ds] = books[j]
    s = float(np.max(np.abs(E))) / 127.0
    E_hat = np.clip(np.round(E / s), -127, 127) * s
    ref = maxsim_numpy(Q, decode_pq(codes, E_hat.astype(np.float32),
                                    expanded=True), qmask, pmask)
    got = _pq_kernel(Q, codes, qmask, pmask, books, book_quant=True)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pqfull_kernel_int8_queries_compact_books(rng):
    """pqfull with compact books runs the exact int8 x int8 path: parity
    vs a host oracle with the same query/book quantization."""
    import jax.numpy as jnp

    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_pqfull

    P, pmask, Q, qmask, _ = _corpus(rng, d=128)
    books = train_pq(P, pmask, m=16, iters=6, seed=0)
    codes = encode_pq(P, books, pmask)
    m, k, ds = books.shape
    E = np.zeros((m, k, m * ds), np.float32)
    for j in range(m):
        E[j, :, j * ds:(j + 1) * ds] = books[j]
    s = float(np.max(np.abs(E))) / 127.0
    E_i8 = np.clip(np.round(E / s), -127, 127).astype(np.int8)
    # host-quantized queries (maxsim_pallas_int8full's formula)
    amax = np.max(np.abs(Q), axis=-1)
    sq = amax / 127.0
    safe = np.where(sq > 0, sq, 1.0)
    Q_i8 = np.clip(np.round(Q / safe[..., None]), -127, 127)
    dec = decode_pq(codes, E_i8.astype(np.float32), expanded=True)
    sim = np.einsum("qld,ndp->qlnp", Q_i8,
                    np.swapaxes(dec, 1, 2))            # integer-exact in f64
    sim = np.where(pmask[None, None], sim, -1e30)
    mx = sim.max(-1) * pmask.any(-1)[None, None]
    ref = ((mx * (qmask * sq * s)[:, :, None]).sum(1)).astype(np.float32)
    got = np.asarray(maxsim_pallas_pqfull(
        jnp.asarray(Q), jnp.asarray(codes), jnp.asarray(qmask),
        jnp.asarray(pmask), jnp.asarray(books),
        compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pq_kernel_multiple_lp_tiles_and_qblocks(rng):
    """Grid accumulation across lp tiles + >1 q-blocks: tiny target tiles
    force n_lp > 1 and n_qb > 1; scores must not depend on the tiling."""
    P, pmask, Q, qmask, _ = _corpus(rng, n=37, lp=33, lq=7, nq=24, d=128)
    books = train_pq(P, pmask, m=8, iters=4, seed=2)
    codes = encode_pq(P, books, pmask)
    ref = maxsim_numpy(Q, decode_pq(codes, books), qmask, pmask)
    got = _pq_kernel(Q, codes, qmask, pmask, books, book_quant=False,
                     target_rows=16, target_cols=32)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pq_kernel_epilogue_variants_agree(rng):
    """tokmajor (qb%128==0, db%8==0 at these tiles) == sublane == auto."""
    P, pmask, Q, qmask, _ = _corpus(rng, n=40, lp=6, lq=4, nq=128, d=128)
    books = train_pq(P, pmask, m=16, iters=4, seed=3)
    codes = encode_pq(P, books, pmask)
    outs = [
        _pq_kernel(Q, codes, qmask, pmask, books, book_quant=False,
                   epilogue=e)
        for e in ("auto", "sublane", "tokmajor")
    ]
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], rtol=1e-6, atol=1e-6)


def test_pq_kernel_small_k_books(rng):
    """K < 256 codebooks (k_pad=128 path)."""
    P, pmask, Q, qmask, _ = _corpus(rng, d=128)
    books = train_pq(P, pmask, m=16, k=64, iters=4, seed=4)
    codes = encode_pq(P, books, pmask)
    assert books.shape[1] == 64
    ref = maxsim_numpy(Q, decode_pq(codes, books), qmask, pmask)
    got = _pq_kernel(Q, codes, qmask, pmask, books, book_quant=False)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pq_clamp_engages_at_chip_oom_geometries():
    """The PQ kernel's VMEM clamp is Q-BLOCK-INDEPENDENT: three chip probes
    at cols=db*tlp=3072 scope-OOM'd at 23.3-23.8M for qbl in {1024, 2048,
    4096} (within 2% of each other — the alloc is per-column decode
    transients, not a rows*qbl sim plane), so the cap must engage for
    every qbl. bench_artifacts/tpuq/{verify_r5b,bench_pq3,pqk_headline}.out.
    """
    from evdr_tpu.ops.pallas_maxsim import _PQ_COLS_MAX, _clamp_pq_tiles

    # headline shape: lp=768 -> tlp=768, db=4 (cols=3072)
    db, tlp = _clamp_pq_tiles(4, 768, 256, 128)
    assert db * tlp <= _PQ_COLS_MAX
    assert tlp % 16 == 0 and tlp >= 16
    # small-lp serving shape: lp=16 -> tlp=16, db=192 (cols=3072)
    db, tlp = _clamp_pq_tiles(192, 16, 256, 128)
    assert db * tlp <= _PQ_COLS_MAX
    assert db % 8 == 0  # tokmajor stays legal
    # already-legal tiles pass through untouched
    assert _clamp_pq_tiles(8, 128, 256, 128) == (8, 128)
    # wider token dims shrink the cap proportionally (budget measured at
    # D=128); K cannot exceed 256 (uint8 codes)
    db, tlp = _clamp_pq_tiles(8, 128, 256, 256)
    assert db * tlp <= _PQ_COLS_MAX * 128 // 256
