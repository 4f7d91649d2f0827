"""Fused Pallas backward parity vs the XLA-oracle VJP (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdr_tpu.data.packing import l2_normalize, preprocess_docs, preprocess_queries
from evdr_tpu.data.synthetic import make_synthetic_corpus
from evdr_tpu.ops.maxsim import maxsim_numpy, maxsim_xla
from evdr_tpu.ops.pallas_maxsim_bwd import maxsim_pallas_bwd, maxsim_pallas_fwd_train


def _inputs(seed=0, n_docs=7, n_queries=5, dim=32, **kw):
    c = make_synthetic_corpus(n_docs=n_docs, n_queries=n_queries, dim=dim,
                              seed=seed, **kw)
    P, pmask, _ = preprocess_docs(c["documents"], c["doc_attnmask"], c["doc_imgmask"])
    Q, qmask = preprocess_queries(c["query"], c["query_attnmask"])
    Pn = np.asarray(l2_normalize(P * pmask[..., None].astype(np.float32)))
    return (jnp.asarray(Q), jnp.asarray(Pn), jnp.asarray(qmask), jnp.asarray(pmask))


def test_fwd_train_scores_match_oracle():
    Q, P, qmask, pmask = _inputs(seed=1, n_docs=9, n_queries=6)
    want = maxsim_numpy(np.asarray(Q), np.asarray(P), np.asarray(qmask),
                        np.asarray(pmask))
    got, M = maxsim_pallas_fwd_train(Q, P, qmask, pmask, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    assert np.isfinite(np.asarray(M)).all() or True  # M may hold NEG_INIT fills


@pytest.mark.parametrize("seed", [0, pytest.param(3, marks=pytest.mark.slow)])
def test_fused_bwd_matches_xla_vjp(seed):
    Q, P, qmask, pmask = _inputs(seed=seed, n_docs=8, n_queries=5, dim=32)
    rng = np.random.default_rng(seed)
    g = jnp.asarray(rng.normal(size=(Q.shape[0], P.shape[0])).astype(np.float32))

    _, vjp = jax.vjp(lambda q, p: maxsim_xla(q, p, qmask, pmask, chunk_p=4), Q, P)
    dq_want, dp_want = vjp(g)

    _, M = maxsim_pallas_fwd_train(Q, P, qmask, pmask, jnp.float32, True)
    dq, dp = maxsim_pallas_bwd(Q, P, qmask, pmask, M, g, jnp.float32, True)

    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_want),
                               rtol=1e-4, atol=1e-4)


def test_fused_bwd_with_fully_masked_doc():
    Q, P, qmask, pmask = _inputs(seed=5, n_docs=6, n_queries=4)
    pmask = np.asarray(pmask).copy()
    pmask[2] = False
    pmask = jnp.asarray(pmask)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(Q.shape[0], P.shape[0])).astype(np.float32))

    _, vjp = jax.vjp(lambda q, p: maxsim_xla(q, p, qmask, pmask, chunk_p=4), Q, P)
    dq_want, dp_want = vjp(g)
    _, M = maxsim_pallas_fwd_train(Q, P, qmask, pmask, jnp.float32, True)
    dq, dp = maxsim_pallas_bwd(Q, P, qmask, pmask, M, g, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_want),
                               rtol=1e-4, atol=1e-4)
    # the fully-masked doc receives zero gradient
    assert np.abs(np.asarray(dp)[2]).max() == 0.0


def test_fused_bwd_multiple_query_blocks():
    """n_qb > 1 (full-batch regime): dP partials are written to per-q-block
    output slices and reduced outside the kernel — a (j, l)-keyed dP block
    revisited per i would see stale window contents on real hardware (Pallas
    only supports consecutive-visit accumulation)."""
    # lq_pad=16 -> qb=64 in the bwd's 1024-row tiling; 72 queries -> n_qb=2
    Q, P, qmask, pmask = _inputs(seed=7, n_docs=6, n_queries=72, dim=32)
    # guard against silent de-engagement: recompute the bwd's own tiling and
    # require a MULTI-q-block grid (a changed target_rows default could
    # otherwise turn this into a single-block test that passes vacuously)
    from evdr_tpu.ops.pallas_maxsim import _pick_tiles, _round_up
    qb, _, _, _ = _pick_tiles(Q.shape[1], P.shape[1], 1024, 1024,
                              nq=Q.shape[0])
    assert _round_up(Q.shape[0], qb) // qb >= 2, f"single q-block (qb={qb})"
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(size=(Q.shape[0], P.shape[0])).astype(np.float32))

    _, vjp = jax.vjp(lambda q, p: maxsim_xla(q, p, qmask, pmask, chunk_p=4), Q, P)
    dq_want, dp_want = vjp(g)
    _, M = maxsim_pallas_fwd_train(Q, P, qmask, pmask, jnp.float32, True)
    dq, dp = maxsim_pallas_bwd(Q, P, qmask, pmask, M, g, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_want),
                               rtol=1e-4, atol=1e-4)


def test_custom_vjp_end_to_end_interpret():
    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas

    Q, P, qmask, pmask = _inputs(seed=7, n_docs=5, n_queries=4)

    def loss_pallas(p):
        return jnp.sum(maxsim_pallas(Q, p, qmask, pmask, jnp.float32, True) ** 2)

    def loss_xla(p):
        return jnp.sum(maxsim_xla(Q, p, qmask, pmask) ** 2)

    g1 = jax.grad(loss_pallas)(P)
    g2 = jax.grad(loss_xla)(P)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("shape", [
    (1, 1, 1, 1, 8),        # degenerate minima
    (3, 5, 2, 17, 48),      # nothing divides any tile
    # the larger grids (~3s each, interpret mode) run in full mode only
    pytest.param((9, 33, 11, 129, 128),   # just past tile boundaries
                 marks=pytest.mark.slow),
    pytest.param((17, 8, 130, 16, 64),    # docs > doc-block
                 marks=pytest.mark.slow),
])
def test_fwd_bwd_shape_sweep_interpret(shape):
    nq, lq, nd, lp, d = shape
    rng = np.random.default_rng(hash(shape) % 2**31)
    Q = rng.normal(size=(nq, lq, d)).astype(np.float32)
    P = rng.normal(size=(nd, lp, d)).astype(np.float32)
    qmask = rng.random((nq, lq)) > 0.25
    pmask = rng.random((nd, lp)) > 0.25
    want = maxsim_numpy(Q, P, qmask, pmask)
    got, M = maxsim_pallas_fwd_train(jnp.asarray(Q), jnp.asarray(P),
                                     jnp.asarray(qmask), jnp.asarray(pmask),
                                     jnp.float32, True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    g = jnp.asarray(rng.normal(size=(nq, nd)).astype(np.float32))
    _, vjp = jax.vjp(lambda q, p: maxsim_xla(q, p, jnp.asarray(qmask),
                                             jnp.asarray(pmask), chunk_p=8),
                     jnp.asarray(Q), jnp.asarray(P))
    dq_want, dp_want = vjp(g)
    dq, dp = maxsim_pallas_bwd(jnp.asarray(Q), jnp.asarray(P), jnp.asarray(qmask),
                               jnp.asarray(pmask), M, g, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_want), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_want), rtol=1e-4,
                               atol=1e-4)


def test_bwd_query_chunking_matches_unchunked(monkeypatch):
    """Above _MAX_QB_BLOCKS q-blocks the backward chunks the query axis
    outside the kernel (bounds the per-q-block dP partials buffer, ADVICE
    r2); chunked == unchunked exactly (dP sums over q-blocks, dQ rows are
    independent). Long queries (lq=120 -> qb=8) make 20 queries span 3
    q-blocks so the chunk loop genuinely runs."""
    import evdr_tpu.ops.pallas_maxsim_bwd as bwd_mod
    from evdr_tpu.ops.pallas_maxsim import _pick_tiles

    rng = np.random.default_rng(2)
    nq, lq, nd, lp, d = 20, 120, 5, 9, 32
    Q = jnp.asarray(rng.normal(size=(nq, lq, d)).astype(np.float32))
    P = jnp.asarray(rng.normal(size=(nd, lp, d)).astype(np.float32))
    qmask = jnp.asarray(rng.random((nq, lq)) > 0.2)
    pmask = jnp.asarray(rng.random((nd, lp)) > 0.2)
    qb = _pick_tiles(lq, lp, 1024, 1024)[0]
    assert nq > 2 * qb, "fixture must span >2 q-blocks"

    g = jnp.asarray(rng.normal(size=(nq, nd)).astype(np.float32))
    _, M = maxsim_pallas_fwd_train(Q, P, qmask, pmask, jnp.float32, True)
    dq_ref, dp_ref = bwd_mod._maxsim_pallas_bwd_impl(
        Q, P, qmask, pmask, M, g, jnp.float32, True)

    monkeypatch.setattr(bwd_mod, "_MAX_QB_BLOCKS", 1)
    dq, dp = maxsim_pallas_bwd(Q, P, qmask, pmask, M, g, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_ref),
                               rtol=1e-6, atol=1e-6)
