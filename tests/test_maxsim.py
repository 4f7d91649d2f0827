import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdr_tpu.data.packing import preprocess_docs, preprocess_queries, l2_normalize
from evdr_tpu.data.synthetic import make_synthetic_corpus
from evdr_tpu.ops.maxsim import maxsim_numpy, maxsim_xla, score_multi_vector, score_single_vector
from evdr_tpu.ops.pallas_maxsim import maxsim_pallas


def _inputs(seed=0, n_docs=7, n_queries=5, dim=16, **kw):
    corpus = make_synthetic_corpus(n_docs=n_docs, n_queries=n_queries, dim=dim,
                                   seed=seed, **kw)
    P, pmask, _ = preprocess_docs(corpus["documents"], corpus["doc_attnmask"],
                                  corpus["doc_imgmask"])
    Q, qmask = preprocess_queries(corpus["query"], corpus["query_attnmask"])
    Pn = np.asarray(l2_normalize(P * pmask[..., None].astype(np.float32)))
    return Q, Pn, qmask, pmask


def test_numpy_oracle_masks():
    # hand-built case: 1 query x 2 tokens (2nd invalid), 2 docs
    Q = np.zeros((1, 2, 4), np.float32)
    Q[0, 0] = [1, 0, 0, 0]
    Q[0, 1] = [0, 1, 0, 0]
    P = np.zeros((2, 3, 4), np.float32)
    P[0, 0] = [1, 0, 0, 0]      # sim 1 with q-token 0
    P[0, 1] = [0.5, 0, 0, 0]
    P[0, 2] = [9, 0, 0, 0]      # invalid — must not win the max
    P[1, 0] = [0.3, 0, 0, 0]
    qmask = np.array([[True, False]])
    pmask = np.array([[True, True, False], [True, False, False]])
    sc = maxsim_numpy(Q, P, qmask, pmask)
    np.testing.assert_allclose(sc, [[1.0, 0.3]], atol=1e-6)


def test_all_invalid_doc_scores_zero():
    Q = np.ones((2, 3, 4), np.float32)
    P = np.ones((3, 2, 4), np.float32)
    qmask = np.ones((2, 3), bool)
    pmask = np.array([[True, True], [False, False], [True, False]])
    sc = maxsim_numpy(Q, P, qmask, pmask)
    np.testing.assert_allclose(sc[:, 1], 0.0)
    assert (sc[:, 0] > 0).all()


def test_xla_matches_numpy_oracle():
    Q, P, qmask, pmask = _inputs(seed=0)
    want = maxsim_numpy(Q, P, qmask, pmask)
    for chunk in (2, 3, 128):
        got = np.asarray(maxsim_xla(jnp.asarray(Q), jnp.asarray(P),
                                    jnp.asarray(qmask), jnp.asarray(pmask),
                                    chunk_p=chunk))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_interpret_matches_oracle():
    Q, P, qmask, pmask = _inputs(seed=1, n_docs=9, n_queries=6, dim=32)
    want = maxsim_numpy(Q, P, qmask, pmask)
    got = np.asarray(maxsim_pallas(jnp.asarray(Q), jnp.asarray(P),
                                   jnp.asarray(qmask), jnp.asarray(pmask),
                                   jnp.float32, True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_interpret_ragged_shapes():
    # shapes that do not divide tiles: lq=5, lp=37, d=48
    rng = np.random.default_rng(3)
    Q = rng.normal(size=(3, 5, 48)).astype(np.float32)
    P = rng.normal(size=(4, 37, 48)).astype(np.float32)
    qmask = rng.random((3, 5)) > 0.3
    pmask = rng.random((4, 37)) > 0.3
    pmask[2, :] = False  # one fully-invalid doc
    want = maxsim_numpy(Q, P, qmask, pmask)
    got = np.asarray(maxsim_pallas(jnp.asarray(Q), jnp.asarray(P),
                                   jnp.asarray(qmask), jnp.asarray(pmask),
                                   jnp.float32, True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_padding_is_inert():
    # padding Lq/Lp/N axes with masked-out junk must not change scores
    Q, P, qmask, pmask = _inputs(seed=2)
    want = maxsim_numpy(Q, P, qmask, pmask)
    Qp = np.pad(Q, ((0, 0), (0, 7), (0, 0)), constant_values=3.3)
    qp = np.pad(qmask, ((0, 0), (0, 7)))
    Pp = np.pad(P, ((0, 2), (0, 11), (0, 0)), constant_values=-2.2)
    pp = np.pad(pmask, ((0, 2), (0, 11)))
    got = np.asarray(maxsim_xla(jnp.asarray(Qp), jnp.asarray(Pp),
                                jnp.asarray(qp), jnp.asarray(pp), chunk_p=4))
    np.testing.assert_allclose(got[:, :P.shape[0]], want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[:, P.shape[0]:], 0.0, atol=1e-6)


def test_gradients_flow_and_match_torch_semantics():
    # grad wrt student P: max routes gradient to argmax token only
    Q, P, qmask, pmask = _inputs(seed=4, n_docs=5, n_queries=3)

    def loss_fn(p):
        sc = maxsim_xla(jnp.asarray(Q), p, jnp.asarray(qmask), jnp.asarray(pmask),
                        chunk_p=2)
        return jnp.sum(sc ** 2)

    g = jax.grad(loss_fn)(jnp.asarray(P))
    assert np.isfinite(np.asarray(g)).all()
    # invalid tokens receive zero gradient
    assert np.abs(np.asarray(g)[~pmask]).max() == 0.0

    import torch
    Pt = torch.tensor(P, requires_grad=True)
    Qt = torch.tensor(Q)
    sim = torch.einsum("qnd,cmd->qcnm", Qt, Pt)
    sim = sim.masked_fill(~torch.tensor(pmask)[None, :, None, :], -1e4)
    mx = sim.max(dim=-1).values
    mx = mx * torch.tensor(pmask.any(1))[None, :, None].float()
    mx = mx * torch.tensor(qmask)[:, None, :].float()
    sc = mx.sum(-1)
    (sc ** 2).sum().backward()
    np.testing.assert_allclose(np.asarray(g), Pt.grad.numpy(), rtol=1e-4, atol=1e-4)


def test_pallas_custom_vjp_matches_xla_grad():
    Q, P, qmask, pmask = _inputs(seed=5, n_docs=4, n_queries=3, dim=32)

    def loss_pallas(p):
        return jnp.sum(maxsim_pallas(jnp.asarray(Q), p, jnp.asarray(qmask),
                                     jnp.asarray(pmask), jnp.float32, True) ** 2)

    def loss_xla(p):
        return jnp.sum(maxsim_xla(jnp.asarray(Q), p, jnp.asarray(qmask),
                                  jnp.asarray(pmask)) ** 2)

    g1 = jax.grad(loss_pallas)(jnp.asarray(P))
    g2 = jax.grad(loss_xla)(jnp.asarray(P))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_score_multi_vector_list_api(rng):
    qs = [rng.normal(size=(int(rng.integers(3, 8)), 16)).astype(np.float32)
          for _ in range(5)]
    ps = [rng.normal(size=(int(rng.integers(4, 12)), 16)).astype(np.float32)
          for _ in range(6)]
    got = score_multi_vector(qs, ps, batch_size=2, impl="xla")
    # brute force reference: unmasked einsum/max/sum with zero padding
    import torch
    want = np.zeros((5, 6), np.float32)
    for i, q in enumerate(qs):
        for j, p in enumerate(ps):
            s = torch.einsum("nd,md->nm", torch.tensor(q), torch.tensor(p))
            # zero pad tokens participate: emulate by clamping max at >= 0?
            # No: reference pads within batches; single-pair has no padding,
            # but padded batch max includes 0 rows -> max(sim, 0 col) when
            # batch lengths differ. Emulate the padded-batch semantics:
            lmax_p = max(pp.shape[0] for pp in ps[(j // 2) * 2:(j // 2) * 2 + 2])
            pad_cols = lmax_p - p.shape[0]
            if pad_cols:
                s = torch.cat([s, torch.zeros(s.shape[0], pad_cols)], dim=1)
            want[i, j] = s.max(dim=1).values.sum().item()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_score_single_vector(rng):
    qs = [rng.normal(size=16).astype(np.float32) for _ in range(3)]
    ps = [rng.normal(size=16).astype(np.float32) for _ in range(4)]
    got = score_single_vector(qs, ps)
    want = np.stack(qs) @ np.stack(ps).T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("epilogue", ["f32", "f32d", "reduce", "sublane", "bf16"])
def test_pallas_epilogue_variants_match_oracle(rng, epilogue):
    """All Lq-sum epilogues (selector matmul f32/HIGHEST, f32/DEFAULT, bf16,
    pure-VPU reduce) produce oracle scores in interpret mode; the fast
    variants exist because at small Lp the f32-HIGHEST epilogue was measured
    to cap the whole kernel (config-5 root cause, RESULTS.md)."""
    import jax.numpy as jnp

    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.ops.pallas_maxsim import _maxsim_pallas_fwd
    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int8full
    from evdr_tpu.ops.quantize import quantize_tokens_int8

    nq, lq, nd, lp, d = 5, 4, 9, 16, 32
    Q = rng.normal(size=(nq, lq, d)).astype(np.float32)
    P = rng.normal(size=(nd, lp, d)).astype(np.float32)
    qm = rng.random((nq, lq)) > 0.2
    pm = rng.random((nd, lp)) > 0.2
    want = maxsim_numpy(Q, P, qm, pm)

    got = np.asarray(_maxsim_pallas_fwd(
        jnp.asarray(Q), jnp.asarray(P), jnp.asarray(qm), jnp.asarray(pm),
        compute_dtype=jnp.float32, interpret=True, epilogue=epilogue))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    codes, scales = quantize_tokens_int8(P * pm[..., None], pm)
    got8 = np.asarray(maxsim_pallas_int8full(
        jnp.asarray(Q), jnp.asarray(codes), jnp.asarray(scales),
        jnp.asarray(qm), jnp.asarray(pm), interpret=True, epilogue=epilogue))
    np.testing.assert_allclose(got8, want, rtol=0.05, atol=0.05)


@pytest.mark.parametrize("epilogue", ["tokmajor", "tokmajor_nt", "tokchain",
                                      "tokpre", "auto", "tokfuse",
                                      "tokfuse4", "tokfuse64"])
def test_pallas_tokmajor_epilogues_match_oracle(rng, epilogue):
    """Token-major epilogues (lane-sliced Lq-sum; the measured winners at the
    config-5 shape — RESULTS.md round-3 epilogue study) are exact. Needs
    qb % 128 == 0 to engage, so nq >= 128 here; smaller query batches fall
    back to 'sublane' (covered above)."""
    import jax.numpy as jnp

    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.ops.pallas_maxsim import _maxsim_pallas_fwd
    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int8
    from evdr_tpu.ops.quantize import dequantize_int8, quantize_tokens_int8

    from evdr_tpu.ops.pallas_maxsim import _pick_tiles, _resolve_epilogue

    nq, lq, nd, lp, d = 128, 4, 20, 16, 32
    # guard against silent fallback: the default tiling at this shape MUST
    # satisfy the token-major gate, or this test would vacuously re-run the
    # sublane path (it did at nq=130: qb clamped to 136, 136 % 128 != 0)
    qb, _, db, _ = _pick_tiles(lq, lp, 4096, 3072, nq=nq)
    resolved, _ = _resolve_epilogue(epilogue, qb, db)
    assert resolved == ("tokmajor" if epilogue == "auto" else epilogue), (
        f"tiling (qb={qb}, db={db}) demotes {epilogue!r} to {resolved!r}")
    Q = rng.normal(size=(nq, lq, d)).astype(np.float32)
    P = rng.normal(size=(nd, lp, d)).astype(np.float32)
    qm = rng.random((nq, lq)) > 0.2
    pm = rng.random((nd, lp)) > 0.2
    pm[3] = False   # all-invalid doc -> score 0
    qm[7] = False   # all-masked query -> score 0
    want = maxsim_numpy(Q, P, qm, pm)

    got = np.asarray(_maxsim_pallas_fwd(
        jnp.asarray(Q), jnp.asarray(P), jnp.asarray(qm), jnp.asarray(pm),
        compute_dtype=jnp.float32, interpret=True, epilogue=epilogue))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    codes, scales = quantize_tokens_int8(P * pm[..., None], pm)
    want8 = maxsim_numpy(Q, dequantize_int8(codes, scales), qm, pm)
    got8 = np.asarray(maxsim_pallas_int8(
        jnp.asarray(Q), jnp.asarray(codes), jnp.asarray(scales),
        jnp.asarray(qm), jnp.asarray(pm), compute_dtype=jnp.float32,
        interpret=True, epilogue=epilogue))
    np.testing.assert_allclose(got8, want8, rtol=1e-4, atol=1e-4)


def _fuzz_trials(full: int) -> int:
    """Fast loop runs a PREFIX of the same derandomized trial sequence
    (rng fixture is seeded); test_shape_fuzz_full_sweeps (slow) re-runs
    all three fuzzes at the full counts."""
    import os

    return full if os.environ.get("EVDR_FULL_FUZZ") else max(3, full // 3)


def test_pallas_shape_fuzz_matches_oracle(rng):
    """Randomized shape/mask sweep: the fused kernel (fp32, interpret) must
    match the numpy oracle across awkward shapes — single-token queries/docs,
    non-multiple-of-tile sizes, heavy masking, whole docs invalid."""
    import jax.numpy as jnp

    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.ops.pallas_maxsim import _maxsim_pallas_fwd

    for trial in range(_fuzz_trials(12)):
        nq = int(rng.integers(1, 9))
        lq = int(rng.integers(1, 13))
        nd = int(rng.integers(1, 23))
        lp = int(rng.integers(1, 37))
        d = int(rng.choice([16, 32, 128]))
        Q = rng.normal(size=(nq, lq, d)).astype(np.float32)
        P = rng.normal(size=(nd, lp, d)).astype(np.float32)
        qm = rng.random((nq, lq)) > rng.uniform(0.0, 0.6)
        pm = rng.random((nd, lp)) > rng.uniform(0.0, 0.6)
        if nd > 2:
            pm[int(rng.integers(nd))] = False  # a fully-invalid doc
        want = maxsim_numpy(Q, P, qm, pm)
        got = np.asarray(_maxsim_pallas_fwd(
            jnp.asarray(Q), jnp.asarray(P), jnp.asarray(qm), jnp.asarray(pm),
            compute_dtype=jnp.float32, interpret=True,
            target_rows=int(rng.choice([64, 256, 2048])),
            target_cols=int(rng.choice([64, 256])),
            max_tlp=[None, 16, 32][trial % 3]))
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-4,
            err_msg=f"trial {trial}: nq={nq} lq={lq} nd={nd} lp={lp} d={d}")


def test_pallas_int8_shape_fuzz_matches_oracle(rng):
    """Randomized shape/mask sweep for the int8-index kernel (bf16-dot path
    run at fp32 here): exercises the auto-epilogue gates (token-major needs
    qb%128==0 and db%8==0; everything else must fall back cleanly) across
    awkward shapes, including nq >= 128 where token-major engages."""
    import jax.numpy as jnp

    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int8
    from evdr_tpu.ops.quantize import dequantize_int8, quantize_tokens_int8

    for trial in range(_fuzz_trials(8)):
        nq = int(rng.choice([1, 7, 130, 256]))
        lq = int(rng.integers(1, 13))
        nd = int(rng.integers(1, 23))
        lp = int(rng.integers(1, 37))
        d = int(rng.choice([16, 32, 128]))
        Q = rng.normal(size=(nq, lq, d)).astype(np.float32)
        P = rng.normal(size=(nd, lp, d)).astype(np.float32)
        qm = rng.random((nq, lq)) > rng.uniform(0.0, 0.6)
        pm = rng.random((nd, lp)) > rng.uniform(0.0, 0.6)
        if nd > 2:
            pm[int(rng.integers(nd))] = False
        codes, scales = quantize_tokens_int8(P * pm[..., None], pm)
        want = maxsim_numpy(Q, dequantize_int8(codes, scales), qm, pm)
        got = np.asarray(maxsim_pallas_int8(
            jnp.asarray(Q), jnp.asarray(codes), jnp.asarray(scales),
            jnp.asarray(qm), jnp.asarray(pm), compute_dtype=jnp.float32,
            interpret=True,
            target_rows=int(rng.choice([256, 4096])),
            target_cols=int(rng.choice([64, 3072])),
            max_tlp=[None, 16, 32, None][trial % 4]))
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-4,
            err_msg=f"trial {trial}: nq={nq} lq={lq} nd={nd} lp={lp} d={d}")


def test_pallas_int4_shape_fuzz_matches_oracle(rng):
    """Randomized shape/mask sweep for the packed-int4 kernel: awkward
    shapes stress the token-pair packing (odd Lp, tiny tiles), the
    even/odd scale-sentinel planes, and the shared auto-epilogue gates."""
    import jax.numpy as jnp

    from evdr_tpu.ops.int4 import dequantize_int4, quantize_tokens_int4
    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int4

    for trial in range(_fuzz_trials(8)):
        nq = int(rng.choice([1, 7, 130, 256]))
        lq = int(rng.integers(1, 13))
        nd = int(rng.integers(1, 23))
        lp = int(rng.integers(1, 37))
        d = int(rng.choice([16, 32, 128]))
        Q = rng.normal(size=(nq, lq, d)).astype(np.float32)
        P = rng.normal(size=(nd, lp, d)).astype(np.float32)
        qm = rng.random((nq, lq)) > rng.uniform(0.0, 0.6)
        pm = rng.random((nd, lp)) > rng.uniform(0.0, 0.6)
        if nd > 2:
            pm[int(rng.integers(nd))] = False
        packed, scales = quantize_tokens_int4(P * pm[..., None], pm)
        want = maxsim_numpy(Q, dequantize_int4(packed, scales), qm, pm)
        got = np.asarray(maxsim_pallas_int4(
            jnp.asarray(Q), jnp.asarray(packed), jnp.asarray(scales),
            jnp.asarray(qm), jnp.asarray(pm), compute_dtype=jnp.float32,
            interpret=True,
            target_rows=int(rng.choice([256, 2048, 4096])),
            target_cols=int(rng.choice([64, 3072])),
            max_tlp=[None, 16, 32, None][trial % 4]))
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-4,
            err_msg=f"trial {trial}: nq={nq} lq={lq} nd={nd} lp={lp} d={d}")


@pytest.mark.parametrize("n_docs,lp,cols", [
    # deferred is a measured-and-REJECTED variant (RESULTS.md) kept for
    # parity; the fast loop keeps the single-doc-block case, the
    # multi-block grids run under -m "slow or not slow"
    (3, 16, 128),
    pytest.param(9, 16, 128, marks=pytest.mark.slow),
    pytest.param(40, 64, 512, marks=pytest.mark.slow)])
def test_pallas_int8_deferred_epilogue_matches(rng, n_docs, lp, cols):
    """The deferred-epilogue kernel (block j's Lq-sum emitted during block
    j+1's matmul, one extra doc grid column) must produce identical scores
    to the in-step epilogue, across multi-doc-block and single-doc-block
    grids. The deferred grid needs qb % 128 == 0 and db % 8 == 0 to engage
    (it silently demotes otherwise — the old nq=5 version of this test
    compared the normal path against itself)."""
    import jax.numpy as jnp

    from evdr_tpu.ops.pallas_maxsim import (_pick_tiles, _resolve_epilogue,
                                            maxsim_pallas_int8,
                                            maxsim_pallas_int8full)
    from evdr_tpu.ops.quantize import quantize_tokens_int8

    nq, lq, d, rows = 128, 4, 32, 1024
    qb, _, db, _ = _pick_tiles(lq, lp, rows, cols, nq=nq)
    _, engaged = _resolve_epilogue("auto", qb, db, deferred=True)
    assert engaged, f"tiling (qb={qb}, db={db}) silently demotes deferred"
    Q = rng.normal(size=(nq, lq, d)).astype(np.float32)
    P = rng.normal(size=(n_docs, lp, d)).astype(np.float32)
    qm = rng.random((nq, lq)) > 0.2
    pm = rng.random((n_docs, lp)) > 0.2
    codes, scales = quantize_tokens_int8(P * pm[..., None], pm)
    args = (jnp.asarray(Q), jnp.asarray(codes), jnp.asarray(scales),
            jnp.asarray(qm), jnp.asarray(pm))

    for fn in (maxsim_pallas_int8full, maxsim_pallas_int8):
        base = np.asarray(fn(*args, interpret=True, target_rows=rows,
                             target_cols=cols))
        got = np.asarray(fn(*args, interpret=True, target_rows=rows,
                            target_cols=cols, deferred=True))
        # rtol only: the bf16-dot path's XLA program differs, so interpret
        # mode may reassociate the contraction (~1e-7 rel noise)
        np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-5)


def test_pick_tiles_clamps_query_block_to_nq():
    """A large target_rows tile must not pad the query axis past the padded
    query count: at nq=64/lq=32, an unclamped r4096 tile picked qb=128 and
    doubled the MXU work (config-5b exact measured 1,033 -> 621 q/s)."""
    from evdr_tpu.ops.pallas_maxsim import _pick_tiles

    qb, lq_pad, _, _ = _pick_tiles(32, 16, target_rows=4096, target_cols=3072,
                                   nq=64)
    assert qb == 64
    # nq not a multiple of 8: clamp rounds up, never below 8
    qb, _, _, _ = _pick_tiles(32, 16, target_rows=4096, target_cols=3072, nq=5)
    assert qb == 8
    # plenty of queries: the target_rows choice is untouched
    qb, _, _, _ = _pick_tiles(32, 16, target_rows=4096, target_cols=3072,
                              nq=256)
    assert qb == 128
    # nq omitted (bwd-compat callers): unclamped
    qb, _, _, _ = _pick_tiles(32, 16, target_rows=4096, target_cols=3072)
    assert qb == 128


def test_auto_rows_policy_and_serving_batch_parity():
    """target_rows=None covers the whole query batch in ONE q-block (floor
    4096, cap 8192) — chip-adopted from i8f/bf16/i8x_sweep_smalllp (int8full
    170.1 vs 120.8 TFLOP/s for the old rows=2048 serving tile). Parity must
    hold at the qbl=8192 tiling the serving paths now pick by default."""
    from evdr_tpu.ops.pallas_maxsim import _auto_rows

    assert _auto_rows(8, 32) == 4096    # floor: small batches keep old tiles
    assert _auto_rows(256, 32) == 8192  # serving batch: exactly one q-block
    assert _auto_rows(1024, 32) == 8192  # cap: measured VMEM-legality bound
    assert _auto_rows(100, 32) == 4096  # 104*32 = 3328 -> floor
    assert _auto_rows(200, 32) == 6400  # round_up(200,8)*32

    rng = np.random.default_rng(11)
    Q = rng.normal(size=(256, 32, 64)).astype(np.float32)
    P = rng.normal(size=(16, 16, 64)).astype(np.float32)
    qm = rng.random((256, 32)) > 0.1
    pm = rng.random((16, 16)) > 0.1
    want = maxsim_numpy(Q, P, qm, pm)
    got = np.asarray(maxsim_pallas(jnp.asarray(Q), jnp.asarray(P),
                                   jnp.asarray(qm), jnp.asarray(pm),
                                   jnp.float32, True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_shape_fuzz_full_sweeps(monkeypatch):
    """Full-count fuzz sweeps (the fast loop runs a prefix of the same
    derandomized sequences — see _fuzz_trials)."""
    monkeypatch.setenv("EVDR_FULL_FUZZ", "1")
    test_pallas_shape_fuzz_matches_oracle(np.random.default_rng(0))
    test_pallas_int8_shape_fuzz_matches_oracle(np.random.default_rng(0))
    test_pallas_int4_shape_fuzz_matches_oracle(np.random.default_rng(0))
