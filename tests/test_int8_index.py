"""int8-quantized index: quantizer, kernel parity, serving paths, quality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdr_tpu.ops.maxsim import maxsim_xla
from evdr_tpu.ops.quantize import dequantize_int8, quantize_tokens_int8


def _mk(seed=0, nd=17, lp=21, nq=5, lq=7, d=32):
    rng = np.random.default_rng(seed)

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    P = unit(rng.normal(size=(nd, lp, d))).astype(np.float32)
    pm = rng.random((nd, lp)) > 0.15
    pm[3] = False  # fully-masked doc
    P = P * pm[..., None]
    Q = unit(rng.normal(size=(nq, lq, d))).astype(np.float32)
    qm = rng.random((nq, lq)) > 0.15
    return Q, qm, P, pm


def test_quantize_roundtrip_error_bounded():
    Q, qm, P, pm = _mk()
    codes, scale = quantize_tokens_int8(P, pm)
    assert codes.dtype == np.int8
    Pd = dequantize_int8(codes, scale)
    # per-token max abs error <= scale/2 (round-to-nearest)
    err = np.abs(Pd - P).max(axis=-1)
    assert np.all(err <= scale / 2 + 1e-7)
    # masked tokens fully zeroed
    assert np.all(codes[~pm] == 0) and np.all(scale[~pm] == 0)


def test_int8_kernel_matches_dequantized_oracle():
    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int8

    Q, qm, P, pm = _mk(seed=1)
    codes, scale = quantize_tokens_int8(P, pm)
    want = np.asarray(maxsim_xla(
        jnp.asarray(Q), jnp.asarray(dequantize_int8(codes, scale)),
        jnp.asarray(qm), jnp.asarray(pm)))
    got = np.asarray(maxsim_pallas_int8(
        jnp.asarray(Q), jnp.asarray(codes), jnp.asarray(scale),
        jnp.asarray(qm), jnp.asarray(pm), compute_dtype=jnp.float32,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # fully-masked doc scores exactly 0
    assert np.all(got[:, 3] == 0.0)


def test_int8_zero_valid_token_scores_zero_not_masked():
    """A valid all-zero token must participate with sim 0 (not be masked)."""
    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int8

    Q, qm, P, pm = _mk(seed=2, nd=4, lp=3)
    P[1] = 0.0           # doc 1: all tokens zero but VALID
    pm[1] = True
    qm[:] = True
    codes, scale = quantize_tokens_int8(P, pm)
    got = np.asarray(maxsim_pallas_int8(
        jnp.asarray(Q), jnp.asarray(codes), jnp.asarray(scale),
        jnp.asarray(qm), jnp.asarray(pm), compute_dtype=jnp.float32,
        interpret=True))
    want = np.asarray(maxsim_xla(
        jnp.asarray(Q), jnp.asarray(P), jnp.asarray(qm), jnp.asarray(pm)))
    np.testing.assert_allclose(got[:, 1], want[:, 1], atol=1e-6)


def test_sharded_int8_serving_paths():
    from evdr_tpu.parallel import (build_sharded_index, make_mesh, replicate,
                                   sharded_maxsim, sharded_topk)

    Q, qm, P, pm = _mk(seed=3, nd=33)
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        idx8 = build_sharded_index(P, pm, mesh, dtype="int8")
        assert idx8.scales is not None and idx8.P.dtype == jnp.int8
        Qd = replicate(jnp.asarray(Q), mesh)
        qmd = replicate(jnp.asarray(qm), mesh)
        got = np.asarray(sharded_maxsim(Qd, qmd, idx8))
        codes, scale = quantize_tokens_int8(P, pm)
        want = np.asarray(maxsim_xla(
            jnp.asarray(Q), jnp.asarray(dequantize_int8(codes, scale)),
            jnp.asarray(qm), jnp.asarray(pm)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        v, i = sharded_topk(Qd, qmd, idx8, k=5)
        for q in range(Q.shape[0]):
            np.testing.assert_allclose(np.asarray(v[q]),
                                       np.sort(want[q])[::-1][:5],
                                       rtol=1e-5, atol=1e-5)


def test_engine_int8_quality_close_to_fp32():
    from evdr_tpu.data.packing import preprocess_queries
    from evdr_tpu.data.synthetic import make_synthetic_corpus
    from evdr_tpu.engine import RetrievalEngine

    c = make_synthetic_corpus(n_docs=40, n_queries=16, dim=64, seed=9)
    Q, qm = preprocess_queries(c["query"], c["query_attnmask"])

    def top1(dtype):
        eng = RetrievalEngine(dtype=dtype, impl="xla")
        eng.build_from_ragged(c["documents"], c["doc_attnmask"],
                              c["doc_imgmask"], docids=c["docid"])
        _, idx = eng.search_dense(Q, qm, k=1)
        return np.asarray(idx)[:, 0]

    t_fp32, t_int8 = top1(None), top1("int8")
    agree = float(np.mean(t_fp32 == t_int8))
    assert agree >= 0.9, agree


def test_int8full_kernel_matches_double_quantized_oracle():
    """Full-int8 (queries AND index) kernel vs the dequantized numpy oracle."""
    import jax.numpy as jnp

    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int8full

    Q, qm, P, pm = _mk(seed=4)
    codes, scale = quantize_tokens_int8(P, pm)
    # oracle: quantize queries exactly as the kernel does, dequantize both
    amax = np.abs(Q).max(axis=-1)
    sq = amax / 127.0
    safe = np.where(sq > 0, sq, 1.0)
    Q_i8 = np.clip(np.round(Q / safe[..., None]), -127, 127)
    Qd = Q_i8 * sq[..., None]
    want = np.asarray(maxsim_xla(
        jnp.asarray(Qd.astype(np.float32)),
        jnp.asarray(dequantize_int8(codes, scale)),
        jnp.asarray(qm), jnp.asarray(pm)))
    got = np.asarray(maxsim_pallas_int8full(
        jnp.asarray(Q), jnp.asarray(codes), jnp.asarray(scale),
        jnp.asarray(qm), jnp.asarray(pm), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert np.all(got[:, 3] == 0.0)  # fully-masked doc


def test_int8full_ranking_quality():
    """Double int8 rounding must not disturb top-1 on a realistic corpus."""
    import jax.numpy as jnp

    from evdr_tpu.data.packing import preprocess_docs, preprocess_queries
    from evdr_tpu.data.synthetic import make_synthetic_corpus
    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int8full

    c = make_synthetic_corpus(n_docs=48, n_queries=24, dim=64, seed=11,
                              noise=1.5)
    P, pm, _ = preprocess_docs(c["documents"], c["doc_attnmask"],
                               c["doc_imgmask"])
    from evdr_tpu.data.packing import l2_normalize
    Pn = np.asarray(l2_normalize(P * pm[..., None].astype(np.float32)))
    Q, qm = preprocess_queries(c["query"], c["query_attnmask"])
    exact = np.asarray(maxsim_xla(jnp.asarray(Q), jnp.asarray(Pn),
                                  jnp.asarray(qm), jnp.asarray(pm)))
    codes, scale = quantize_tokens_int8(Pn, pm)
    got = np.asarray(maxsim_pallas_int8full(
        jnp.asarray(Q), jnp.asarray(codes), jnp.asarray(scale),
        jnp.asarray(qm), jnp.asarray(pm), interpret=True))
    agree = np.mean(np.argmax(got, 1) == np.argmax(exact, 1))
    assert agree >= 0.95, agree


def test_packed_mmap_and_direct_codes(tmp_path):
    """--normalize packed files: (a) f32 mmap load returns memmap views whose
    scores match the eager load; (b) int8 + mmap consumes codes DIRECTLY
    (no dequantize/requantize) and matches the eager engine's top-1."""
    import jax.numpy as jnp

    from evdr_tpu.data.packing import preprocess_queries
    from evdr_tpu.data.synthetic import make_synthetic_corpus
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.tools.convert_packed import (
        convert_payload_to_packed, load_packed_payload)

    c = make_synthetic_corpus(n_docs=20, n_queries=8, dim=32, seed=3)
    Q, qmask = preprocess_queries(c["query"], c["query_attnmask"])

    for dtype in ("float32", "int8"):
        packed = convert_payload_to_packed(c, dtype=dtype, normalize=True)
        pth = tmp_path / f"norm_{dtype}.packed.npz"
        np.savez(pth, **packed)

        pl = load_packed_payload(pth, mmap_docs=True)
        if dtype == "float32":
            assert isinstance(pl["P_pad"], np.memmap)
            assert isinstance(pl["pmask"], np.memmap)
        else:
            assert isinstance(pl["P_codes"], np.memmap)
            assert "P_pad" not in pl  # mmap mode: no eager dequantize

        eng_m = RetrievalEngine.from_npz(
            pth, mmap=True, dtype=("int8" if dtype == "int8" else None),
            impl="xla")
        eng_e = RetrievalEngine.from_npz(
            pth, dtype=("int8" if dtype == "int8" else None), impl="xla")
        v_m, i_m = eng_m.search_dense(Q, qmask, k=5)
        v_e, i_e = eng_e.search_dense(Q, qmask, k=5)
        np.testing.assert_array_equal(np.asarray(i_m)[:, 0],
                                      np.asarray(i_e)[:, 0])
        np.testing.assert_allclose(np.asarray(v_m), np.asarray(v_e),
                                   rtol=5e-3, atol=5e-3)


def test_streamed_shard_build_matches_plain():
    """_shard_docs_streamed produces the same sharded index contents as the
    one-shot device_put path (8-device mesh, padded trailing shard)."""
    import jax
    from evdr_tpu.parallel import build_sharded_index, make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    P = rng.normal(size=(21, 6, 16)).astype(np.float32)
    pm = rng.random((21, 6)) > 0.2
    a = build_sharded_index(P, pm, mesh)
    b = build_sharded_index(P, pm, mesh, streaming=True)
    assert a.n_pad == b.n_pad
    np.testing.assert_array_equal(np.asarray(a.P), np.asarray(b.P))
    np.testing.assert_array_equal(np.asarray(a.pmask), np.asarray(b.pmask))


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_streamed_shard_build_transforms_per_shard(dtype):
    """streaming=True with a dtype transform must match the one-shot path
    bit-for-bit WITHOUT a full host materialization: the cast runs per shard
    and int8 quantization (per-token scales, doc-independent) shard-locally."""
    from evdr_tpu.parallel import build_sharded_index, make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    P = rng.normal(size=(21, 6, 16)).astype(np.float32)
    pm = rng.random((21, 6)) > 0.2
    a = build_sharded_index(P, pm, mesh, dtype=dtype)
    b = build_sharded_index(P, pm, mesh, dtype=dtype, streaming=True)
    assert a.P.dtype == b.P.dtype
    np.testing.assert_array_equal(np.asarray(a.P), np.asarray(b.P))
    if dtype == "int8":
        np.testing.assert_array_equal(np.asarray(a.scales),
                                      np.asarray(b.scales))


def test_from_npz_does_not_mutate_engine_normalize(tmp_path):
    """Loading a pre-normalized packed file must not flip the engine's
    normalize default: a LATER build() with raw embeddings on the same
    engine has to L2-normalize them (the old in-place mutation silently
    indexed raw vectors unnormalized)."""
    from evdr_tpu.data.packing import l2_normalize, preprocess_queries
    from evdr_tpu.data.synthetic import make_synthetic_corpus
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.tools.convert_packed import convert_payload_to_packed

    c = make_synthetic_corpus(n_docs=20, n_queries=8, dim=32, seed=5)
    Q, qmask = preprocess_queries(c["query"], c["query_attnmask"])
    packed = convert_payload_to_packed(c, dtype="float32", normalize=True)
    pth = tmp_path / "norm.packed.npz"
    np.savez(pth, **packed)

    eng = RetrievalEngine.from_npz(pth, impl="xla")
    assert eng.normalize is True  # engine default untouched by the load
    v_loaded, i_loaded = eng.search_dense(Q, qmask, k=3)

    # rebuild the SAME engine from raw (unnormalized) embeddings scaled by
    # 7x: only a build that still normalizes reproduces the same ranking
    raw = np.asarray(packed["P_pad"], np.float32) * 7.0
    pm = np.asarray(packed["pmask"], bool)
    eng.build(raw, pm)
    v_raw, i_raw = eng.search_dense(Q, qmask, k=3)
    np.testing.assert_array_equal(np.asarray(i_raw), np.asarray(i_loaded))
    np.testing.assert_allclose(np.asarray(v_raw), np.asarray(v_loaded),
                               rtol=1e-4, atol=1e-4)


def test_int8full_long_doc_policy_gates_on_padding_waste():
    """The max_tlp=384 split (tokmajor unlock, 169.9 TFLOP/s at Lp=768)
    must only engage when the 384-padded lp stays within ~10% of natural
    padding: _maxsim_int8_impl pads lp UP to a tlp multiple, so Lp=512
    under the split would pad to 768 (1.5x MXU work) — a net loss."""
    from evdr_tpu.ops.pallas_maxsim import _int8full_auto_max_tlp

    # the probed win: Lp=768 at the headline tiling -> split engages
    assert _int8full_auto_max_tlp(256, 32, 768, 4096, 3072) == 384
    # padding-waste cases: 512 -> 768 (1.5x), 400 -> 768 (1.9x): skip
    assert _int8full_auto_max_tlp(256, 32, 512, 4096, 3072) is None
    assert _int8full_auto_max_tlp(256, 32, 400, 4096, 3072) is None
    # small lp never triggers (tlp_n <= 384 already)
    assert _int8full_auto_max_tlp(256, 32, 16, 4096, 3072) is None
    # qb not lane-aligned (nq < 128 clamps qb): tokmajor illegal -> skip
    assert _int8full_auto_max_tlp(64, 32, 768, 4096, 3072) is None
