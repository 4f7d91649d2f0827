"""Quantization-aware distillation (ops/qat.py) numerics + wiring tests.

The contract under test: each ``qdq_*`` reproduces the numpy SERVING
quantizer round trip bit-for-bit (training scores the true serving grid,
not an approximation), the straight-through estimator passes identity
gradients, masked (all-zero) tokens stay exactly zero under every tier,
and ``--qat`` threads through the train harness end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdr_tpu.data.packing import l2_normalize
from evdr_tpu.ops.int4 import dequantize_int4, quantize_tokens_int4
from evdr_tpu.ops.pq import decode_pq, encode_with_books, train_pq
from evdr_tpu.ops.qat import qat_apply, qdq_int4, qdq_int8, qdq_pq, ste
from evdr_tpu.ops.quantize import dequantize_int8, quantize_tokens_int8


def _student(seed=0, n=6, lp=7, d=16):
    """Normalized masked student tokens, the exact form qat_apply sees."""
    rng = np.random.default_rng(seed)
    P = rng.normal(size=(n, lp, d)).astype(np.float32)
    pmask = rng.random((n, lp)) > 0.25
    pmask[0, :] = True
    pmask[1, :] = False          # fully-masked doc: every tier must keep 0
    Ps = np.asarray(l2_normalize(P * pmask[..., None].astype(np.float32)))
    return Ps, pmask


def test_qdq_int8_matches_serving_grid():
    Ps, pmask = _student(seed=1)
    codes, scales = quantize_tokens_int8(Ps, pmask)
    ref = dequantize_int8(codes, scales)
    got = np.asarray(qdq_int8(jnp.asarray(Ps)))
    # bit-for-bit: same f32 divide/round-half-even/clip/multiply chain
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("lp", [6, 7])  # even + odd (pad nibble) widths
def test_qdq_int4_matches_serving_grid(lp):
    Ps, pmask = _student(seed=2, lp=lp)
    packed, scales = quantize_tokens_int4(Ps, pmask)
    ref = dequantize_int4(packed, scales)
    got = np.asarray(qdq_int4(jnp.asarray(Ps)))
    np.testing.assert_array_equal(got, ref)


def test_qdq_pq_matches_serving_reconstruction():
    Ps, pmask = _student(seed=3, n=24, lp=8, d=16)
    books = train_pq(Ps, pmask, m=4, k=8, iters=6, seed=0)
    codes = encode_with_books(Ps, books, pmask)
    ref = decode_pq(codes, books)
    ref[~pmask] = 0.0  # serving scores mask these; qdq sees all-zero tokens
    got = np.array(qdq_pq(jnp.asarray(Ps), jnp.asarray(books)))
    got[~pmask] = 0.0
    # assignments use the same ||c||^2 - 2<x,c> expansion; reconstructions
    # are gathered centroids, so agreement is (near-)exact — tolerance only
    # covers einsum-vs-matmul accumulation order at argmin ties
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


def test_ste_gradient_is_identity():
    Ps, _ = _student(seed=4)
    w = jnp.asarray(np.random.default_rng(5).normal(size=Ps.shape),
                    dtype=jnp.float32)

    g = jax.grad(lambda x: jnp.sum(qat_apply(x, "int8") * w))(jnp.asarray(Ps))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    # forward value really is the quantized form (not the identity)
    f = qat_apply(jnp.asarray(Ps), "int8")
    np.testing.assert_array_equal(np.asarray(f),
                                  np.asarray(qdq_int8(jnp.asarray(Ps))))


@pytest.mark.parametrize("tier", ["int8", "int4", "pq"])
def test_masked_tokens_reconstruct_to_zero(tier):
    Ps, pmask = _student(seed=6, n=16, lp=8, d=16)
    books = (jnp.asarray(train_pq(Ps, pmask, m=4, k=8, iters=4, seed=0))
             if tier == "pq" else None)
    out = np.asarray(qat_apply(jnp.asarray(Ps), tier, books))
    assert np.all(out[~pmask] == 0.0)


def test_qat_apply_none_is_identity_and_unknown_raises():
    Ps, _ = _student(seed=7)
    x = jnp.asarray(Ps)
    assert qat_apply(x, "none") is x
    with pytest.raises(ValueError):
        qat_apply(x, "int3")
    with pytest.raises(ValueError):
        qat_apply(x, "pq")  # no books


def test_config_rejects_pq_qat_on_mesh():
    from evdr_tpu.train.config import TrainConfig

    with pytest.raises(ValueError):
        TrainConfig(datasets=["synth"], qat="pq", mesh_docs=2).validate()
    TrainConfig(datasets=["synth"], qat="int4", mesh_docs=2).validate()


# --- harness wiring ---------------------------------------------------------

@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    from evdr_tpu.data.synthetic import write_dataset_fixture

    root = tmp_path_factory.mktemp("qatdata")
    write_dataset_fixture(root, key="synth", n_docs=12, n_test_queries=10,
                          n_train_queries=48, dim=32, mfs=(5,), seed=0,
                          init_noise=2.5)
    return root


@pytest.mark.parametrize("tier", ["int8", "int4", "pq"])
def test_training_with_qat_runs(fixture_root, tmp_path, tier):
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import run_training

    cfg = TrainConfig(
        datasets=["synth"], query_root=str(fixture_root),
        teacher_root=str(fixture_root),
        init_root=str(fixture_root / "S3E_init"),
        mfs=[5], out_root=str(tmp_path / "results"), name=f"qat_{tier}",
        max_steps=4, eval_every=4, print_every=4, q_batch=8, loss="liscore",
        k=6, temp=0.1, chunk_p=8, qat=tier)
    results = run_training(cfg)
    best = results["synth/mf5"]["summary/best_ndcg5"]
    assert np.isfinite(best["NDCG@5"])


def test_qdq_pq_live_allzero_token_matches_serving_encoder():
    """A LIVE token whose embedding is exactly zero must reconstruct to the
    nearest centroid to 0 (what the pmask-driven serving encoder does), not
    be forced to 0 like a masked token — qdq_pq takes pmask for this; the
    value-based x!=0 fallback cannot tell the two cases apart."""
    Ps, pmask = _student(seed=3)
    Ps = Ps.copy()
    Ps[0, 2, :] = 0.0            # live (pmask True) but all-zero embedding
    assert pmask[0, 2]
    books = train_pq(Ps, pmask, m=4, k=8, seed=0)

    rec = np.asarray(qdq_pq(jnp.asarray(Ps), jnp.asarray(books),
                            pmask=jnp.asarray(pmask)))
    # serving path: encode with pmask, decode
    codes = encode_with_books(Ps, books, pmask)
    want = decode_pq(codes, books)
    np.testing.assert_allclose(rec[0, 2], want[0, 2], rtol=1e-6, atol=1e-6)
    # masked tokens still exactly zero under the pmask-driven path
    assert np.all(rec[~pmask] == 0.0)
    # the nearest centroid to 0 is generically nonzero: the test must not
    # pass vacuously
    assert np.any(rec[0, 2] != 0.0)


def test_from_npz_serves_qat_pq_student_with_saved_books(tmp_path):
    """engine.from_npz(dtype='pq') on a QAT npz must quantize with the
    SAVED qat_books (the grid training optimized for), not a refit —
    scores must equal building from those books directly."""
    from evdr_tpu.data.npz_io import save_compressed_npz, tokens_to_object
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.ops.pq import encode_with_books

    Ps, pmask = _student(seed=5, n=8, lp=6, d=16)
    books = train_pq(Ps, pmask, m=4, k=8, seed=1)
    path = tmp_path / "qat_student.npz"
    save_compressed_npz(
        path, docid=np.array([str(i) for i in range(8)], object),
        documents_obj=tokens_to_object(Ps, pmask),
        doc_attnmask_obj=None, doc_imgmask_obj=None, meta={},
        extra={"qat_books": books})

    eng = RetrievalEngine.from_npz(path, dtype="pq", impl="xla")
    np.testing.assert_allclose(np.asarray(eng.index.books), books,
                               rtol=1e-6, atol=1e-6)

    want_eng = RetrievalEngine(dtype="pq", impl="xla")
    want_eng.build_from_pq(encode_with_books(Ps, books, pmask), books, pmask)
    rng = np.random.default_rng(0)
    Q = rng.normal(size=(3, 4, 16)).astype(np.float32)
    qm = np.ones((3, 4), bool)
    got_v, got_i = eng.search_dense(Q, qm, k=4)
    want_v, want_i = want_eng.search_dense(Q, qm, k=4)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_v, want_v, rtol=1e-5, atol=1e-5)


def test_qat_start_frac_phase1_matches_plain_run(fixture_root, tmp_path):
    """--qat_start_frac f: the first f*max_steps are EXACTLY a qat='none'
    trajectory under the same seed (quantization noise from step 0
    measurably degrades the student — round-4 RESULTS study); the STE pass
    engages only after the switch."""
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import run_training

    base = dict(datasets=["synth"], query_root=str(fixture_root),
                teacher_root=str(fixture_root),
                init_root=str(fixture_root / "S3E_init"),
                mfs=[5], out_root=str(tmp_path / "results"),
                max_steps=8, eval_every=4, save_period=4, print_every=0,
                q_batch=8, loss="liscore", k=6, temp=0.1, chunk_p=8, seed=3)
    run_training(TrainConfig(**base, name="plain"))
    run_training(TrainConfig(**base, name="ft", qat="int8",
                             qat_start_frac=0.5))

    def _student(name, step):
        p = (tmp_path / "results" / name / "mf5" / "synth"
             / f"compressed_ep{step}.npz")
        z = np.load(p, allow_pickle=True)
        return np.concatenate(  # ragged per-doc token counts
            [np.asarray(d, np.float32).reshape(-1) for d in z["documents"]])

    # at the switch (step 4 = 0.5*8): identical params
    np.testing.assert_array_equal(_student("ft", 4), _student("plain", 4))
    # after the switch the STE step has engaged: trajectories diverge
    assert not np.array_equal(_student("ft", 8), _student("plain", 8))


def test_qat_start_frac_validation():
    from evdr_tpu.train.config import TrainConfig

    with pytest.raises(ValueError):
        TrainConfig(datasets=["x"], qat_start_frac=1.0).validate()
    with pytest.raises(ValueError):
        TrainConfig(datasets=["x"], qat_start_frac=-0.1).validate()
    TrainConfig(datasets=["x"], qat="int8", qat_start_frac=0.9).validate()


def test_qdq_pq_expanded_opq_books_matches_serving_reconstruction():
    """qat='opq' trains against EXPANDED rotated books (the shipped PQ
    form): qdq_pq's full-D assignment + sum-decode must reproduce the
    serving encoder/decoder on the same books."""
    from evdr_tpu.ops.pq import expand_books, train_opq

    Ps, pmask = _student(seed=8, n=24, lp=8, d=16)
    obooks, rot = train_opq(Ps, pmask, m=4, k=8, iters=4, opq_iters=2,
                            seed=0)
    ebooks = expand_books(obooks, rot)
    codes = encode_with_books(Ps, ebooks, pmask)
    ref = decode_pq(codes, ebooks, expanded=True)
    ref[~pmask] = 0.0
    got = np.array(qdq_pq(jnp.asarray(Ps), jnp.asarray(ebooks)))
    got[~pmask] = 0.0
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


def test_training_with_qat_opq_runs(fixture_root, tmp_path):
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import run_training

    cfg = TrainConfig(
        datasets=["synth"], query_root=str(fixture_root),
        teacher_root=str(fixture_root),
        init_root=str(fixture_root / "S3E_init"),
        mfs=[5], out_root=str(tmp_path / "results"), name="qat_opq",
        max_steps=4, eval_every=4, print_every=4, q_batch=8, loss="liscore",
        k=6, temp=0.1, chunk_p=8, qat="opq", qat_pq_m=4)
    results = run_training(cfg)
    best = results["synth/mf5"]["summary/best_ndcg5"]
    assert np.isfinite(best["NDCG@5"])


def test_fit_qat_books_layouts():
    """qat='pq' fits compact (M, K, D/M) books; qat='opq' fits the shipped
    EXPANDED (M, K, D) rotated form (what qat_apply trains against and the
    best npz exports as qat_books)."""
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import _fit_qat_books

    Ps, pmask = _student(seed=9, n=24, lp=8, d=16)
    cfg_pq = TrainConfig(datasets=["x"], qat="pq", qat_pq_m=4)
    cfg_opq = TrainConfig(datasets=["x"], qat="opq", qat_pq_m=4)
    b_pq = np.asarray(_fit_qat_books(cfg_pq, Ps, pmask))
    b_opq = np.asarray(_fit_qat_books(cfg_opq, Ps, pmask))
    assert b_pq.shape == (4, 256, 4)
    assert b_opq.shape == (4, 256, 16)


def test_qat_select_post_restricts_best_window(fixture_root, tmp_path):
    """With a QAT fine-tune phase, best-checkpoint selection only sees
    post-STE-switch evals (default qat_select_post): VERDICT r4 found
    matrix cells whose 'QAT' artifact predated the switch — those measured
    post-hoc quantization twice. Here evals run at steps 0/4/8 with the
    switch at 6: the selected best MUST be step 8 regardless of metrics."""
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import run_training

    base = dict(
        datasets=["synth"], query_root=str(fixture_root),
        teacher_root=str(fixture_root),
        init_root=str(fixture_root / "S3E_init"),
        mfs=[5], out_root=str(tmp_path / "results"),
        max_steps=8, eval_every=4, print_every=8, q_batch=8, loss="liscore",
        k=6, temp=0.1, chunk_p=8, qat="int8", qat_start_frac=0.75)
    results = run_training(TrainConfig(**base, name="selpost"))
    best = results["synth/mf5"]["summary/best_ndcg5"]
    assert best["step"] == 8, best
    # BOUNDARY: with the switch exactly on an eval step (start_frac=0.5 ->
    # switch=4), the step-4 checkpoint trained ZERO STE steps (the dispatch
    # AT the switch still runs phase 1) and must stay outside the window
    results = run_training(TrainConfig(
        **{**base, "qat_start_frac": 0.5}, name="selb"))
    best = results["synth/mf5"]["summary/best_ndcg5"]
    assert best["step"] == 8, best
    # legacy window (qat_select_post=False): step 0/4 evals are eligible
    results = run_training(TrainConfig(**base, name="selall",
                                       qat_select_post=False))
    best = results["synth/mf5"]["summary/best_ndcg5"]
    assert best["step"] in (0, 4, 8), best
