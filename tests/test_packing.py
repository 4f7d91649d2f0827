import numpy as np
import pytest

from evdr_tpu.data.packing import (
    l2_normalize,
    pad_tokens_object,
    pad_mask_object,
    preprocess_docs,
    preprocess_queries,
    pad_axis_to_multiple,
)
from evdr_tpu.data.align import align_by_docid
from evdr_tpu.data.synthetic import make_synthetic_corpus, pooled_init_index


def _ragged(rng, n, lo, hi, d=16):
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = rng.normal(size=(int(rng.integers(lo, hi)), d)).astype(np.float32)
    return out


def test_pad_tokens_object_shapes(rng):
    toks = _ragged(rng, 5, 3, 9)
    pad, valid = pad_tokens_object(toks)
    lmax = max(t.shape[0] for t in toks)
    assert pad.shape == (5, lmax, 16)
    for i in range(5):
        li = toks[i].shape[0]
        np.testing.assert_array_equal(pad[i, :li], toks[i])
        assert valid[i, :li].all() and not valid[i, li:].any()


def test_pad_tokens_length_multiple(rng):
    toks = _ragged(rng, 3, 3, 9)
    pad, valid = pad_tokens_object(toks, length_multiple=128)
    assert pad.shape[1] == 128
    assert not valid[:, max(t.shape[0] for t in toks):].any()


def test_mask_composition(rng):
    corpus = make_synthetic_corpus(n_docs=6, n_queries=4, dim=8, seed=1)
    P, pmask, valid = preprocess_docs(
        corpus["documents"], corpus["doc_attnmask"], corpus["doc_imgmask"]
    )
    # pmask = valid & attn & img
    for i in range(6):
        li = corpus["documents"][i].shape[0]
        expect = (
            np.asarray(corpus["doc_attnmask"][i], bool)
            & np.asarray(corpus["doc_imgmask"][i], bool)
        )
        np.testing.assert_array_equal(pmask[i, :li], expect)
        assert not pmask[i, li:].any()


def test_missing_masks_default_to_valid(rng):
    toks = _ragged(rng, 4, 2, 6)
    P, pmask, valid = preprocess_docs(toks, None, None)
    np.testing.assert_array_equal(pmask, valid)


def test_queries_l2_normalized(rng):
    corpus = make_synthetic_corpus(n_docs=4, n_queries=5, dim=8, seed=2)
    Q, qmask = preprocess_queries(corpus["query"], corpus["query_attnmask"])
    norms = np.linalg.norm(Q, axis=-1)
    # valid rows unit-norm; padded rows stay 0
    lens = [corpus["query"][i].shape[0] for i in range(5)]
    for i, li in enumerate(lens):
        np.testing.assert_allclose(norms[i, :li], 1.0, atol=1e-5)
        np.testing.assert_allclose(norms[i, li:], 0.0, atol=1e-7)


def test_l2_normalize_eps_semantics():
    x = np.zeros((2, 4), dtype=np.float32)
    y = l2_normalize(x)
    assert np.isfinite(y).all() and (y == 0).all()


def test_align_by_docid_permutes(rng):
    corpus = make_synthetic_corpus(n_docs=8, n_queries=2, dim=8, seed=3)
    init = pooled_init_index(corpus, mf=4, seed=3)
    # init docids are shuffled relative to teacher
    (docs, attn, img), ok = align_by_docid(
        corpus["docid"], init["docid"],
        init["documents"], init["doc_attnmask"], init["doc_imgmask"],
    )
    assert ok
    # after alignment, doc i's pooled tokens derive from teacher doc i
    perm = {str(d): i for i, d in enumerate(init["docid"])}
    for i in range(8):
        j = perm[str(corpus["docid"][i])]
        np.testing.assert_array_equal(docs[i], init["documents"][j])


def test_align_by_docid_mismatch_returns_unchanged():
    a = np.array(["x", "y"], dtype=object)
    b = np.array(["x", "z"], dtype=object)
    arrs = (np.array([1, 2]),)
    out, ok = align_by_docid(a, b, *arrs)
    assert not ok and out[0] is arrs[0]


def test_pad_axis_to_multiple():
    x = np.ones((3, 5, 7))
    y = pad_axis_to_multiple(x, axis=1, multiple=8)
    assert y.shape == (3, 8, 7)
    assert (y[:, 5:] == 0).all()


def test_registry_matches_reference_shape():
    from evdr_tpu.data.registry import DATASETMAP

    assert set(DATASETMAP) == {
        "arxiv", "docvqa", "infovqa", "tabfquad", "tatdqa",
        "shift", "ai", "energy", "gov", "health",
    }
    for ds, entry in DATASETMAP.items():
        for mf in (5, 10, 25, 50):
            assert f"mf{mf}" in entry
        assert entry["split_before"].endswith("_dump_all.npz")
        assert entry["pseudoQ"].endswith("_query.npz")
    assert DATASETMAP["arxiv"]["mf5"] == "mf5/arxivqa_test_subsampled.npz"
    assert DATASETMAP["tatdqa"]["train"] == "tatdqa_test_train.npz"
    assert DATASETMAP["gov"]["split_before"] == (
        "syntheticDocQA_government_reports_test_dump_all.npz"
    )
    assert "train" not in DATASETMAP["shift"]
