"""2D (dp x docs) mesh: query data-parallel serving over a sharded index."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdr_tpu.data.packing import l2_normalize, preprocess_docs, preprocess_queries
from evdr_tpu.data.synthetic import make_synthetic_corpus
from evdr_tpu.ops.maxsim import maxsim_xla
from evdr_tpu.parallel import build_sharded_index, sharded_maxsim, sharded_topk
from evdr_tpu.parallel.mesh import DP_AXIS, make_mesh_2d
from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def mesh2d():
    assert len(jax.devices()) >= 8
    return make_mesh_2d(dp=2, docs=4)


def _corpus(seed=0, n_docs=21, n_queries=8, dim=32):
    c = make_synthetic_corpus(n_docs=n_docs, n_queries=n_queries, dim=dim, seed=seed)
    Pm, pmask, _ = preprocess_docs(c["documents"], c["doc_attnmask"], c["doc_imgmask"])
    Q, qmask = preprocess_queries(c["query"], c["query_attnmask"])
    Pn = np.asarray(l2_normalize(Pm * pmask[..., None].astype(np.float32)))
    return Q, qmask, Pn, pmask


def _dp_shard(x, mesh):
    return jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(DP_AXIS, *([None] * (x.ndim - 1)))))


def test_2d_sharded_maxsim_matches_local(mesh2d):
    Q, qmask, Pn, pmask = _corpus()
    idx = build_sharded_index(Pn, pmask, mesh2d)
    assert idx.n_pad % 4 == 0
    want = np.asarray(maxsim_xla(jnp.asarray(Q), jnp.asarray(Pn),
                                 jnp.asarray(qmask), jnp.asarray(pmask)))
    got = np.asarray(sharded_maxsim(_dp_shard(Q, mesh2d), _dp_shard(qmask, mesh2d),
                                    idx))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_2d_sharded_topk_exact(mesh2d):
    Q, qmask, Pn, pmask = _corpus(seed=2, n_docs=33)
    idx = build_sharded_index(Pn, pmask, mesh2d)
    scores = np.asarray(maxsim_xla(jnp.asarray(Q), jnp.asarray(Pn),
                                   jnp.asarray(qmask), jnp.asarray(pmask)))
    k = 5
    vals, gidx = sharded_topk(_dp_shard(Q, mesh2d), _dp_shard(qmask, mesh2d),
                              idx, k=k)
    vals, gidx = np.asarray(vals), np.asarray(gidx)
    assert vals.shape == (Q.shape[0], k)
    for q in range(scores.shape[0]):
        want_idx = set(np.argsort(-scores[q])[:k].tolist())
        assert set(gidx[q].tolist()) == want_idx
