"""Packed-int4 index tier: pack/unpack, scoring parity, engine paths."""

import numpy as np
import pytest

from evdr_tpu.ops.int4 import (dequantize_int4, maxsim_int4_xla,
                               quantize_tokens_int4, unpack_int4)
from evdr_tpu.ops.maxsim import maxsim_numpy


def _corpus(rng, n=40, lp=6, lq=5, nq=12, d=64):
    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    protos = unit(rng.normal(size=(8, d)))
    pick = rng.integers(0, 8, size=(n, lp))
    P = unit(protos[pick] + 0.15 * rng.normal(size=(n, lp, d))).astype(
        np.float32)
    pmask = rng.random((n, lp)) > 0.15
    pmask[3] = False  # fully-masked doc: exact-0 score semantics
    src = rng.integers(0, n, size=nq)
    Q = np.stack([P[s, :lq] for s in src])
    Q = unit(Q + 0.05 * rng.normal(size=Q.shape)).astype(np.float32)
    qmask = rng.random((nq, lq)) > 0.1
    return P, pmask, Q, qmask, src


def test_int4_pack_unpack_roundtrip(rng):
    """Packing is lossless over the code grid: unpack(pack(q)) == q for
    every code in [-7, 7], and dequantization error is bounded by half a
    quantization step per dim."""
    P = rng.normal(size=(20, 5, 32)).astype(np.float32)
    pmask = rng.random((20, 5)) > 0.2
    packed, scale = quantize_tokens_int4(P, pmask)
    # token-pair layout: odd Lp=5 packs into 3 byte-rows of full-D lanes
    assert packed.dtype == np.uint8 and packed.shape == (20, 3, 32)
    codes = unpack_int4(packed, lp=5)
    assert codes.min() >= -7 and codes.max() <= 7
    # reference codes computed directly
    amax = np.max(np.abs(P), axis=-1)
    safe = np.where(amax > 0, amax / 7.0, 1.0)
    want = np.clip(np.rint(P / safe[..., None]), -7, 7).astype(np.int8)
    want = np.where(pmask[..., None], want, 0)
    np.testing.assert_array_equal(codes, want)
    # dequant error bound: half a step = scale/2 per dim on valid tokens
    rec = dequantize_int4(packed, scale)
    err = np.abs(rec - P * pmask[..., None])
    bound = (scale / 2.0 + 1e-6)[..., None]
    assert np.all(err <= bound + (~pmask[..., None]) * 1e9)
    # masked tokens decode to exact zero
    assert np.all(rec[~pmask] == 0.0)


def test_int4_all_negative_token(rng):
    """Sign extension: tokens with only negative values survive the nibble
    round trip (high-bit codes are the regression surface)."""
    P = -np.abs(rng.normal(size=(4, 3, 8)).astype(np.float32)) - 0.1
    packed, scale = quantize_tokens_int4(P)
    rec = dequantize_int4(packed, scale)
    assert np.all(rec <= 0.0)
    assert np.max(np.abs(rec - P)) <= float(np.max(scale)) / 2 + 1e-6


def test_int4_scoring_equals_dequant_oracle(rng):
    P, pmask, Q, qmask, _ = _corpus(rng)
    packed, scale = quantize_tokens_int4(P, pmask)
    ref = maxsim_numpy(Q, dequantize_int4(packed, scale), qmask, pmask)
    got = np.asarray(maxsim_int4_xla(Q, packed, scale, qmask, pmask,
                                     chunk_p=8))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(got[:, 3], 0.0)  # all-invalid doc -> 0
    # chunking invariance
    got1 = np.asarray(maxsim_int4_xla(Q, packed, scale, qmask, pmask,
                                      chunk_p=40))
    np.testing.assert_allclose(got, got1, rtol=1e-6, atol=1e-6)


def test_int4_retrieval_quality(rng):
    """4 bits/dim + per-token scale on clustered tokens: top-1 matches the
    fp32 exact search (the int8 tier measures 0.000 delta; int4 must stay
    near it on structured data)."""
    P, pmask, Q, qmask, _ = _corpus(rng, n=60, nq=24)
    exact = maxsim_numpy(Q, P, qmask, pmask)
    packed, scale = quantize_tokens_int4(P, pmask)
    got = np.asarray(maxsim_int4_xla(Q, packed, scale, qmask, pmask))
    agree = float(np.mean(np.argmax(got, 1) == np.argmax(exact, 1)))
    assert agree >= 0.9, agree


def test_int4_engine_exact_sharded_pruned_and_packed(rng, tmp_path):
    """dtype='int4' through the public engine: single-device, 8-device
    mesh, pruned rerank (all-candidates == exact), --dtype int4 packed file
    through from_npz (direct-code path), and a float engine over the same
    file (dequant path)."""
    import jax

    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.parallel.mesh import make_mesh
    from evdr_tpu.tools.convert_packed import (convert_payload_to_packed,
                                               load_packed_payload)

    P, pmask, Q, qmask, _ = _corpus(rng, n=41)
    eng = RetrievalEngine(dtype="int4", impl="xla", mesh=make_mesh(1))
    eng.build(P, pmask, docids=[f"d{i}" for i in range(41)])
    assert eng.index.P.dtype == np.uint8
    assert eng.index.P.shape[1] == (P.shape[1] + 1) // 2  # token pairs
    assert eng.index.P.shape[-1] == P.shape[2]            # full-D lanes
    vals, idx = eng.search_dense(Q, qmask, k=5)
    # oracle: dequantized reconstruction of the engine's own index
    rec = dequantize_int4(np.asarray(eng.index.P)[:41],
                          np.asarray(eng.index.scales)[:41])
    ref = maxsim_numpy(Q, rec, qmask, np.asarray(eng.index.pmask)[:41])
    order = np.argsort(-ref, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(idx, order)
    np.testing.assert_allclose(vals, np.take_along_axis(ref, order, 1),
                               rtol=2e-5, atol=2e-5)

    # 8-device doc-sharded mesh: identical results
    eng8 = RetrievalEngine(dtype="int4", impl="xla",
                           mesh=make_mesh(len(jax.devices())))
    eng8.build(P, pmask)
    v8, i8 = eng8.search_dense(Q, qmask, k=5)
    np.testing.assert_array_equal(i8, idx)
    np.testing.assert_allclose(v8, vals, rtol=2e-5, atol=2e-5)

    # pruned two-stage with every doc as candidate == exact int4 search
    engp = RetrievalEngine(dtype="int4", impl="xla", prune_centroids=2,
                           mesh=make_mesh(1))
    engp.build(P, pmask)
    pv, pi = engp.search_dense(Q, qmask, k=5, n_candidates=41)
    np.testing.assert_array_equal(pi, idx)
    np.testing.assert_allclose(pv, vals, rtol=2e-5, atol=2e-5)

    # packed --dtype int4 --normalize file -> direct-code serving
    packed = convert_payload_to_packed(
        {"documents": _as_ragged(P, pmask),
         "docid": [f"d{i}" for i in range(41)]},
        dtype="int4", normalize=True)
    assert packed["P_codes4"].shape[-1] == P.shape[2]
    np.savez(tmp_path / "i4.npz", **packed)
    engf = RetrievalEngine.from_npz(tmp_path / "i4.npz", dtype="int4",
                                    impl="xla", mesh=make_mesh(1))
    assert engf.index.P.dtype == np.uint8  # codes consumed directly
    fv, fi = engf.search_dense(Q, qmask, k=5)
    # same normalized tokens -> same codes -> same results as an in-memory
    # build from the normalized embeddings
    Pn = P * pmask[..., None]
    Pn = (Pn / (np.linalg.norm(Pn, axis=-1, keepdims=True) + 1e-12)).astype(
        np.float32)
    engm = RetrievalEngine(dtype="int4", impl="xla", normalize=False,
                           mesh=make_mesh(1))
    engm.build(Pn, pmask)
    mv, mi = engm.search_dense(Q, qmask, k=5)
    np.testing.assert_array_equal(fi, mi)
    np.testing.assert_allclose(fv, mv, rtol=2e-5, atol=2e-5)

    # eager load reconstructs P_pad for float consumers
    payload = load_packed_payload(tmp_path / "i4.npz")
    np.testing.assert_allclose(
        payload["P_pad"],
        dequantize_int4(packed["P_codes4"], packed["P_scale"]),
        rtol=0, atol=0)

    # float engine over the int4 file scores the same reconstructions
    engd = RetrievalEngine.from_npz(tmp_path / "i4.npz", dtype="float32",
                                    impl="xla", mesh=make_mesh(1))
    dv, di = engd.search_dense(Q, qmask, k=5)
    np.testing.assert_array_equal(di, fi)
    np.testing.assert_allclose(dv, fv, rtol=2e-5, atol=2e-5)


def test_int4_multihost_build_from_packed_codes(rng):
    """build_multihost_index with PRE-PACKED int4 codes: pmask/scales keep
    full Lp while codes store ceil(Lp/2) token-pair rows (regression: the
    global shapes once used the packed row count for all three)."""
    from evdr_tpu.parallel.mesh import make_mesh
    from evdr_tpu.parallel.multihost import build_multihost_index
    from evdr_tpu.parallel.topk import sharded_topk

    P, pmask, Q, qmask, _ = _corpus(rng, n=21, lp=5, lq=4)
    packed, scale = quantize_tokens_int4(P, pmask)
    mesh = make_mesh(4)
    idx = build_multihost_index(packed, pmask, mesh, scales=scale,
                                pad_docs_to=2)
    assert idx.P.shape[1] == 3 and idx.pmask.shape[1] == 5
    import jax.numpy as jnp

    from evdr_tpu.parallel.mesh import replicate

    v, i = sharded_topk(replicate(jnp.asarray(Q), mesh),
                        replicate(jnp.asarray(qmask), mesh), idx, k=3)
    ref = maxsim_numpy(Q, dequantize_int4(packed, scale), qmask, pmask)
    order = np.argsort(-ref, axis=1, kind="stable")[:, :3]
    np.testing.assert_array_equal(np.asarray(i), order)

    # float input + dtype='int4': per-slice quantization packs the rows
    idx_q = build_multihost_index(P, pmask, mesh, dtype="int4",
                                  pad_docs_to=2)
    assert idx_q.P.shape[1] == 3 and idx_q.scales is not None
    vq, iq = sharded_topk(replicate(jnp.asarray(Q), mesh),
                          replicate(jnp.asarray(qmask), mesh), idx_q, k=3)
    np.testing.assert_array_equal(np.asarray(iq), order)


def test_int4_from_npz_mmap_over_float_file_degrades_eagerly(rng, tmp_path):
    """An int4 engine over a normalized FLOAT packed file with mmap=True
    must fall back to an eager quantizing build, not die on the streaming
    guard (regression: evdr-serve --multihost --dtype int4 over a float
    index crashed at startup)."""
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.parallel.mesh import make_mesh
    from evdr_tpu.tools.convert_packed import convert_payload_to_packed

    P, pmask, Q, qmask, _ = _corpus(rng, n=17)
    packed = convert_payload_to_packed(
        {"documents": _as_ragged(P, pmask)}, dtype="float32", normalize=True)
    np.savez(tmp_path / "f32.npz", **packed)
    eng = RetrievalEngine.from_npz(tmp_path / "f32.npz", dtype="int4",
                                   impl="xla", mmap=True, mesh=make_mesh(1))
    assert eng.index.P.dtype == np.uint8  # quantized eagerly
    v, i = eng.search_dense(Q, qmask, k=3)
    assert i.shape == (Q.shape[0], 3)


def test_int4_serve_warm_dim(rng):
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.parallel.mesh import make_mesh
    from evdr_tpu.tools.serve_http import warm_query_dim

    P, pmask, _, _, _ = _corpus(rng, n=20)
    eng = RetrievalEngine(dtype="int4", impl="xla", mesh=make_mesh(1))
    eng.build(P, pmask)
    assert warm_query_dim(eng) == P.shape[2]


def test_int4_odd_lp_pad_token_is_inert(rng):
    """Odd Lp packs a zero token into the last byte's high nibble; it must
    never influence scores (scale 0 + pmask absent)."""
    P, pmask, Q, qmask, _ = _corpus(rng, n=15, lp=7)
    packed, scale = quantize_tokens_int4(P, pmask)
    assert packed.shape == (15, 4, P.shape[2])
    ref = maxsim_numpy(Q, dequantize_int4(packed, scale), qmask, pmask)
    got = np.asarray(maxsim_int4_xla(Q, packed, scale, qmask, pmask,
                                     chunk_p=6))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_int4_pallas_kernel_matches_dequantized_oracle(rng):
    """Interpret-mode kernel parity vs the dequantized-fp32 oracle on a
    masked ragged corpus (sublane epilogue at this small tiling)."""
    import jax.numpy as jnp

    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int4

    P, pmask, Q, qmask, _ = _corpus(rng, d=128)
    packed, scale = quantize_tokens_int4(P, pmask)
    want = maxsim_numpy(Q, dequantize_int4(packed, scale), qmask, pmask)
    got = np.asarray(maxsim_pallas_int4(
        jnp.asarray(Q), jnp.asarray(packed), jnp.asarray(scale),
        jnp.asarray(qmask), jnp.asarray(pmask),
        compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert np.all(got[:, 3] == 0.0)  # fully-masked doc -> exact 0


def test_int4_pallas_kernel_epilogue_paths(rng):
    """Tilings that engage each epilogue family (qb=128 unlocks tok*),
    including the single-lp-tile tokpre direct path and odd Lp."""
    import jax.numpy as jnp

    from evdr_tpu.ops.pallas_maxsim import _pick_tiles, _resolve_epilogue, \
        maxsim_pallas_int4

    P, pmask, Q, qmask, _ = _corpus(rng, n=24, lp=7, lq=5, nq=128, d=128)
    packed, scale = quantize_tokens_int4(P, pmask)
    want = maxsim_numpy(Q, dequantize_int4(packed, scale), qmask, pmask)
    # confirm the auto gate engages a token-major path at this tiling
    qb, lqp, db, tlp = _pick_tiles(5, 7, 4096, 3072, nq=128)
    assert _resolve_epilogue("auto", qb, db)[0].startswith("tok")
    for epi in ("auto", "sublane", "tokchain", "tokpre", "tokfuse4"):
        got = np.asarray(maxsim_pallas_int4(
            jnp.asarray(Q), jnp.asarray(packed), jnp.asarray(scale),
            jnp.asarray(qmask), jnp.asarray(pmask),
            compute_dtype=jnp.float32, interpret=True, epilogue=epi))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=epi)
    # multi-lp-tile path (several contraction steps per doc block)
    got_mt = np.asarray(maxsim_pallas_int4(
        jnp.asarray(Q), jnp.asarray(packed), jnp.asarray(scale),
        jnp.asarray(qmask), jnp.asarray(pmask),
        compute_dtype=jnp.float32, interpret=True, max_tlp=16, epilogue="sublane"))
    np.testing.assert_allclose(got_mt, want, rtol=1e-5, atol=1e-5)


def test_int4_pallas_zero_valid_token_scores_zero_not_masked(rng):
    """A valid all-zero token participates with sim 0 (scale 0 is VALID —
    the sentinel must not confuse it with masked -1)."""
    import jax.numpy as jnp

    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int4

    P, pmask, Q, qmask, _ = _corpus(rng, n=6, lp=4, lq=3, d=128)
    P[1] = 0.0
    pmask[1] = True
    qmask[:] = True
    packed, scale = quantize_tokens_int4(P, pmask)
    got = np.asarray(maxsim_pallas_int4(
        jnp.asarray(Q), jnp.asarray(packed), jnp.asarray(scale),
        jnp.asarray(qmask), jnp.asarray(pmask),
        compute_dtype=jnp.float32, interpret=True))
    want = maxsim_numpy(Q, dequantize_int4(packed, scale), qmask, pmask)
    np.testing.assert_allclose(got[:, 1], want[:, 1], atol=1e-6)


def test_int4full_kernel_matches_double_quantized_oracle(rng):
    """int8-query x int4-code path: scores equal the oracle computed from
    BOTH quantizations applied explicitly."""
    import jax.numpy as jnp

    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int4full

    P, pmask, Q, qmask, _ = _corpus(rng, d=128)
    packed, scale = quantize_tokens_int4(P, pmask)
    # replicate the kernel's query quantization
    amax = np.max(np.abs(Q), axis=-1)
    sq = amax / 127.0
    safe = np.where(sq > 0, sq, 1.0)
    Qq = np.clip(np.rint(Q / safe[..., None]), -127, 127) * sq[..., None]
    want = maxsim_numpy(Qq.astype(np.float32),
                        dequantize_int4(packed, scale), qmask, pmask)
    got = np.asarray(maxsim_pallas_int4full(
        jnp.asarray(Q), jnp.asarray(packed), jnp.asarray(scale),
        jnp.asarray(qmask), jnp.asarray(pmask), interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def _as_ragged(P, pmask):
    out = np.empty(P.shape[0], dtype=object)
    for i in range(P.shape[0]):
        rows = P[i][pmask[i]]
        if rows.shape[0] == 0:
            rows = np.zeros((1, P.shape[2]), np.float32)
        out[i] = rows
    return out


def test_int4_db_clamp_vmem_legality_grid():
    """Library-default tiles must never exceed the scoped-VMEM budget at
    small lp tiles (the wave-2 chip sweeps: cols=3072 at Lp=16 scope-OOMs
    remote compile with HTTP 500; cols=1536 is the swept best). The clamp
    is a pure host function — assert the plane bound over an (lp, nq,
    target_cols) grid, and that long-doc tiles are untouched."""
    from evdr_tpu.ops.pallas_maxsim import (_INT4_PLANE_BUDGET_ELEMS,
                                            _clamp_int4_db, _pick_tiles)

    for lp in (2, 7, 16, 33, 64, 128, 255):
        for nq in (8, 64, 128, 256, 1024):
            for cols in (512, 1536, 3072, 6144):
                qb, lqp, db, tlp = _pick_tiles(32, lp, 4096, cols, nq=nq)
                tlp = max(16, tlp)
                th = tlp // 2
                dbc = _clamp_int4_db(db, th, qb * lqp)
                assert 1 <= dbc <= db
                if th < 128:
                    assert dbc * th * qb * lqp <= _INT4_PLANE_BUDGET_ELEMS
                if dbc < db and dbc >= 8:
                    # when the clamp engages it lands on a multiple of 8
                    # so the token-major epilogue stays legal
                    assert dbc % 8 == 0
    # long-doc tiles (tlp_half >= 128) stream fine and are left alone
    assert _clamp_int4_db(4, 384, 4096) == 4
    # the exact wave-2 data points: default cols=3072 at Lp=16/qbl=4096
    # clamps 192 -> 96 (the swept best); qbl=2048 keeps 192
    assert _clamp_int4_db(192, 8, 4096) == 96
    assert _clamp_int4_db(192, 8, 2048) == 192


def test_int4_default_tiles_parity_with_clamp_engaged(rng):
    """Interpret-mode parity straight through the library-default tiling
    at a shape where the clamp engages (nq=128 -> qbl=4096, lp small):
    a user's engine dtype='int4' at config-5-like shapes must not need
    manual tile flags."""
    import jax.numpy as jnp

    from evdr_tpu.ops.pallas_maxsim import maxsim_pallas_int4

    P, pmask, Q, qmask, _ = _corpus(rng, n=24, lp=7, lq=5, nq=128, d=128)
    packed, scale = quantize_tokens_int4(P, pmask)
    want = maxsim_numpy(Q, dequantize_int4(packed, scale), qmask, pmask)
    got = np.asarray(maxsim_pallas_int4(
        jnp.asarray(Q), jnp.asarray(packed), jnp.asarray(scale),
        jnp.asarray(qmask), jnp.asarray(pmask),
        compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
