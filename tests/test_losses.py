"""Loss zoo parity tests.

Oracle: the reference repo's own torch implementation (/root/reference/criterion.py),
imported read-only. Values AND gradients w.r.t. student scores must match.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdr_tpu.losses import (
    spl_loss,
    infonce_supervised_loss,
    infonce_distillation_loss,
    score_preserving_loss,
    pairwise_distillation_loss,
    listwise_distillation_loss,
    lambda_loss,
    ranknce_loss,
    combined_loss,
    LOSS_REGISTRY,
)

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)
try:
    import criterion as ref_criterion  # reference torch losses, used as oracle only
except Exception:  # pragma: no cover
    ref_criterion = None

needs_ref = pytest.mark.skipif(ref_criterion is None, reason="reference repo unavailable")


def _scores(seed=0, b=6, n=17, scale=3.0):
    rng = np.random.default_rng(seed)
    s = (scale * rng.normal(size=(b, n))).astype(np.float32)
    t = (scale * rng.normal(size=(b, n))).astype(np.float32)
    return s, t


def _check(jax_fn, torch_fn, s, t, atol=2e-5, **kw):
    """Compare loss value and d(loss)/d(score_s) against the torch oracle."""
    val, grad = jax.value_and_grad(lambda x: jax_fn(x, jnp.asarray(t), **kw))(jnp.asarray(s))
    st = torch.tensor(s, requires_grad=True)
    tt = torch.tensor(t)
    tval = torch_fn(st, tt, **kw)
    tval.backward()
    np.testing.assert_allclose(float(val), tval.item(), atol=atol, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), st.grad.numpy(), atol=atol, rtol=1e-4)


@needs_ref
def test_infonce_distillation_parity():
    s, t = _scores(1)
    _check(infonce_distillation_loss, ref_criterion.infonce_distillation_loss, s, t)
    _check(infonce_distillation_loss, ref_criterion.infonce_distillation_loss, s, t,
           temperature=0.1)


@needs_ref
def test_infonce_supervised_parity():
    s, t = _scores(2)
    labels = np.array([3, 0, 16, 2, 9, 7])
    val = infonce_supervised_loss(jnp.asarray(s), jnp.asarray(labels), 0.07)
    tval = ref_criterion.infonce_supervised_loss(torch.tensor(s), torch.tensor(labels), 0.07)
    np.testing.assert_allclose(float(val), tval.item(), atol=2e-5)


@needs_ref
def test_score_preserving_parity():
    s, t = _scores(3)
    _check(score_preserving_loss, ref_criterion.score_preserving_loss, s, t)


@needs_ref
def test_pairwise_ranknet_parity():
    s, t = _scores(4)
    _check(pairwise_distillation_loss, ref_criterion.pairwise_distillation_loss, s, t)


@needs_ref
@pytest.mark.parametrize("k,temp", [(10, 1.0), (5, 0.1), (40, 0.07)])
def test_listwise_parity(k, temp):
    s, t = _scores(5)
    kk = min(k, s.shape[1])
    val, grad = jax.value_and_grad(
        lambda x: listwise_distillation_loss(x, jnp.asarray(t), k=kk, temperature=temp)
    )(jnp.asarray(s))
    st = torch.tensor(s, requires_grad=True)
    tval = ref_criterion.listwise_distillation_loss(st, torch.tensor(t), k=kk, temperature=temp)
    tval.backward()
    np.testing.assert_allclose(float(val), tval.item(), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), st.grad.numpy(), atol=2e-5, rtol=1e-4)


@needs_ref
def test_lambda_parity():
    s, t = _scores(6)
    val, grad = jax.value_and_grad(
        lambda x: lambda_loss(x, jnp.asarray(t), alpha=1.5)
    )(jnp.asarray(s))
    st = torch.tensor(s, requires_grad=True)
    tval = ref_criterion.lambda_loss(st, torch.tensor(t), alpha=1.5)
    tval.backward()
    np.testing.assert_allclose(float(val), tval.item(), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), st.grad.numpy(), atol=2e-5, rtol=1e-4)


@needs_ref
def test_ranknce_parity():
    s, t = _scores(7)
    val, grad = jax.value_and_grad(
        lambda x: ranknce_loss(x, jnp.asarray(t), temperature=0.5, lambda_weight=2.0)
    )(jnp.asarray(s))
    st = torch.tensor(s, requires_grad=True)
    tval = ref_criterion.ranknce_loss(st, torch.tensor(t), temperature=0.5, lambda_weight=2.0)
    tval.backward()
    np.testing.assert_allclose(float(val), tval.item(), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), st.grad.numpy(), atol=2e-5, rtol=1e-4)


def test_spl_matches_halved_mse():
    s, t = _scores(8)
    np.testing.assert_allclose(
        float(spl_loss(jnp.asarray(s), jnp.asarray(t))),
        0.5 * np.mean((t - s) ** 2), rtol=1e-6)


def test_teacher_gets_no_gradient():
    s, t = _scores(9)
    for name, (fn, needs_labels) in LOSS_REGISTRY.items():
        if needs_labels:
            continue
        g = jax.grad(lambda tt: fn(jnp.asarray(s), tt))(jnp.asarray(t))
        assert np.abs(np.asarray(g)).max() == 0.0, f"{name} leaked teacher grads"


def test_combined_liscore():
    s, t = _scores(10)
    hp = {"lambda_list": 1.0, "lambda_score": 0.5, "k": 8, "temperature": 0.1}
    total, parts = combined_loss("liscore", jnp.asarray(s), jnp.asarray(t), hp)
    want = (
        1.0 * listwise_distillation_loss(jnp.asarray(s), jnp.asarray(t), k=8, temperature=0.1)
        + 0.5 * score_preserving_loss(jnp.asarray(s), jnp.asarray(t))
    )
    np.testing.assert_allclose(float(total), float(want), rtol=1e-6)
    assert set(parts) == {"listwise", "score"}


def test_combined_linfo_separate_temps():
    s, t = _scores(11)
    hp = {"lambda_list": 1.0, "lambda_info": 1.0, "k": 5,
          "list_temp": 1.0, "info_temp": 0.1}
    total, parts = combined_loss("linfo", jnp.asarray(s), jnp.asarray(t), hp)
    want = (
        listwise_distillation_loss(jnp.asarray(s), jnp.asarray(t), k=5, temperature=1.0)
        + infonce_distillation_loss(jnp.asarray(s), jnp.asarray(t), temperature=0.1)
    )
    np.testing.assert_allclose(float(total), float(want), rtol=1e-6)


def test_losses_jittable():
    s, t = _scores(12)
    for name, (fn, needs_labels) in LOSS_REGISTRY.items():
        if needs_labels:
            labels = jnp.zeros(s.shape[0], dtype=jnp.int32)
            val = jax.jit(fn)(jnp.asarray(s), labels)
        else:
            val = jax.jit(fn)(jnp.asarray(s), jnp.asarray(t))
        assert np.isfinite(float(val)), name


def test_score_std_scale_and_offset_invariant():
    """Beyond-reference score_std: invariant to per-query affine transforms
    of either side; zero when rankings/structures coincide up to scale."""
    import jax
    import jax.numpy as jnp

    from evdr_tpu.losses.distill import (combined_loss,
                                         score_preserving_std_loss)

    rng = np.random.default_rng(0)
    sc_t = jnp.asarray(rng.normal(size=(4, 9)).astype(np.float32))
    sc_s = jnp.asarray(rng.normal(size=(4, 9)).astype(np.float32))

    base = float(score_preserving_std_loss(sc_s, sc_t))
    scaled = float(score_preserving_std_loss(0.05 * sc_s + 3.0, 7.0 * sc_t - 1.0))
    np.testing.assert_allclose(scaled, base, rtol=1e-4)
    # identical structure at a different scale -> ~0 (plain MSE would be big)
    near0 = float(score_preserving_std_loss(0.1 * sc_t + 5.0, sc_t))
    assert near0 < 1e-6

    # gradient flows to the student only
    g_s, g_t = jax.grad(
        lambda s, t: score_preserving_std_loss(s, t), argnums=(0, 1))(sc_s, sc_t)
    assert float(jnp.abs(g_s).max()) > 0
    assert float(jnp.abs(g_t).max()) == 0.0

    # combined recipe wires the weights like liscore
    total, parts = combined_loss("liscore_std", sc_s, sc_t,
                                 {"lambda_list": 1.0, "lambda_score": 0.5,
                                  "k": 4, "temperature": 0.1})
    np.testing.assert_allclose(
        float(total), float(parts["listwise"]) + 0.5 * float(parts["score_std"]),
        rtol=1e-6)

    # zero-variance row (e.g. a fully-masked query's identically-zero score
    # row): the gradient must stay finite — eps outside the sqrt gives 0/0
    sc_s0 = sc_s.at[0].set(0.0)
    g = jax.grad(lambda s: score_preserving_std_loss(s, sc_t))(sc_s0)
    assert np.isfinite(np.asarray(g)).all()
