"""Train-step parity vs the reference torch pipeline.

Recreates one liscore training step exactly as the reference does it
(score_multi_vector_masked + listwise/score losses + torch AdamW,
mainv2_iter_liscore.py:282-310) and checks our jitted optax step produces the
same updated student parameter. The reference module imports mteb at module
scope; we stub it since only the scorer is needed.
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# stub mteb so evaluator/retrieval.py imports without the dependency
if "mteb" not in sys.modules:
    mteb_stub = types.ModuleType("mteb")
    eval_mod = types.ModuleType("mteb.evaluation")
    evals_mod = types.ModuleType("mteb.evaluation.evaluators")
    re_mod = types.ModuleType("mteb.evaluation.evaluators.RetrievalEvaluator")
    re_mod.RetrievalEvaluator = object
    sys.modules.update({
        "mteb": mteb_stub,
        "mteb.evaluation": eval_mod,
        "mteb.evaluation.evaluators": evals_mod,
        "mteb.evaluation.evaluators.RetrievalEvaluator": re_mod,
    })

try:
    from evaluator.retrieval import score_multi_vector_masked as ref_score
    import criterion as ref_criterion
except Exception:  # pragma: no cover
    ref_score = None

needs_ref = pytest.mark.skipif(ref_score is None, reason="reference unavailable")


def _setup(seed=0, b=6, n=9, lq=5, lp_t=40, ls=8, d=16):
    rng = np.random.default_rng(seed)

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    Qb = unit(rng.normal(size=(b, lq, d))).astype(np.float32)
    qmb = rng.random((b, lq)) > 0.15
    P_t = rng.normal(size=(n, lp_t, d)).astype(np.float32)
    pm_t = rng.random((n, lp_t)) > 0.15
    P_t = np.asarray(P_t * pm_t[..., None])
    P_t = unit(P_t + 1e-12).astype(np.float32)
    Pbar = rng.normal(size=(n, ls, d)).astype(np.float32)
    pm_s = rng.random((n, ls)) > 0.1
    Pbar = (Pbar * pm_s[..., None]).astype(np.float32)
    return Qb, qmb, P_t, pm_t, Pbar, pm_s


@needs_ref
def test_one_liscore_step_matches_reference():
    Qb, qmb, P_t, pm_t, Pbar, pm_s = _setup()
    lr, wd, k, temp, lam_l, lam_s = 1e-3, 1e-2, 4, 0.1, 1.0, 0.7

    # ---- reference step (torch) ----
    def l2n(x):
        return x / (x.norm(dim=-1, keepdim=True) + 1e-12)

    param_t = torch.nn.Parameter(torch.tensor(Pbar))
    opt = torch.optim.AdamW([param_t], lr=lr, weight_decay=wd)
    pm_s_t = torch.tensor(pm_s)
    Psb = l2n(param_t * pm_s_t.unsqueeze(-1))
    with torch.no_grad():
        sc_t = ref_score(torch.tensor(Qb), torch.tensor(P_t),
                         torch.tensor(qmb), torch.tensor(pm_t), chunk_p=4)
    sc_s = ref_score(torch.tensor(Qb), Psb, torch.tensor(qmb), pm_s_t, chunk_p=4)
    loss = (lam_l * ref_criterion.listwise_distillation_loss(sc_s, sc_t, k=k, temperature=temp)
            + lam_s * ref_criterion.score_preserving_loss(sc_s, sc_t))
    opt.zero_grad(set_to_none=True)
    loss.backward()
    opt.step()
    want = param_t.detach().numpy()

    # ---- our step (jax) ----
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import DatasetBundle, build_train_step
    import optax

    cfg = TrainConfig(loss="liscore", lr=lr, weight_decay=wd, k=k, temp=temp,
                      lambda_list=lam_l, lambda_score=lam_s, chunk_p=4)
    bundle = DatasetBundle(
        dataset="x",
        Q_train=jnp.asarray(Qb), qmask_train=jnp.asarray(qmb), pos_idx=None,
        Q_test=jnp.asarray(Qb), qmask_test=jnp.asarray(qmb),
        P_teacher_norm=jnp.asarray(P_t), pmask_teacher=jnp.asarray(pm_t),
        docid_teacher=np.array(["d"] * P_t.shape[0], dtype=object),
        relevant_docs_test={}, docidx_2_docid_test={}, qsidx_2_query_test=None,
    )
    optimizer = optax.adamw(lr, weight_decay=wd)
    param = jnp.asarray(Pbar)
    opt_state = optimizer.init(param)
    step = build_train_step(cfg, bundle, jnp.asarray(pm_s), optimizer)
    import jax

    idx = jnp.arange(Qb.shape[0], dtype=jnp.int32)
    param2, _, parts = step(param, opt_state, idx, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(parts["total_loss"]), loss.item(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(param2), want, rtol=1e-4, atol=2e-5)


@needs_ref
def test_one_qnoise_liscore_step_matches_reference():
    """aug='qnoise' parity vs mainv3_iter_liscore_noisev1.py:293-311.

    The reference adds masked Gaussian noise, then mask-multiplies and
    re-L2-normalizes the queries (:296-299), and scores the TEACHER with the
    noisy queries (:305). Fixed noise (drawn from the exact PRNG key our
    jitted step consumes) is injected into both pipelines.
    """
    import jax

    Qb, qmb, P_t, pm_t, Pbar, pm_s = _setup(seed=7)
    lr, wd, k, temp, lam_l, lam_s = 1e-3, 1e-2, 4, 0.1, 1.0, 0.7
    q_noise_std = 0.05
    key = jax.random.PRNGKey(0)
    noise = np.asarray(
        jax.random.normal(key, Qb.shape, jnp.float32)) * q_noise_std

    # ---- reference step semantics (torch), with our noise injected ----
    def l2n(x):
        return x / (x.norm(dim=-1, keepdim=True) + 1e-12)

    param_t = torch.nn.Parameter(torch.tensor(Pbar))
    opt = torch.optim.AdamW([param_t], lr=lr, weight_decay=wd)
    pm_s_t = torch.tensor(pm_s)
    qmb_t = torch.tensor(qmb)
    Qb_t = torch.tensor(Qb) + torch.tensor(noise) * qmb_t.unsqueeze(-1)
    Qb_t = l2n(Qb_t * qmb_t.unsqueeze(-1))
    Psb = l2n(param_t * pm_s_t.unsqueeze(-1))
    with torch.no_grad():
        sc_t = ref_score(Qb_t, torch.tensor(P_t), qmb_t,
                         torch.tensor(pm_t), chunk_p=4)
    sc_s = ref_score(Qb_t, Psb, qmb_t, pm_s_t, chunk_p=4)
    loss = (lam_l * ref_criterion.listwise_distillation_loss(sc_s, sc_t, k=k, temperature=temp)
            + lam_s * ref_criterion.score_preserving_loss(sc_s, sc_t))
    opt.zero_grad(set_to_none=True)
    loss.backward()
    opt.step()
    want = param_t.detach().numpy()

    # ---- our step (jax), aug='qnoise', same PRNG key ----
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import DatasetBundle, build_train_step
    import optax

    cfg = TrainConfig(loss="liscore", lr=lr, weight_decay=wd, k=k, temp=temp,
                      lambda_list=lam_l, lambda_score=lam_s, chunk_p=4,
                      aug="qnoise", q_noise_std=q_noise_std)
    bundle = DatasetBundle(
        dataset="x",
        Q_train=jnp.asarray(Qb), qmask_train=jnp.asarray(qmb), pos_idx=None,
        Q_test=jnp.asarray(Qb), qmask_test=jnp.asarray(qmb),
        P_teacher_norm=jnp.asarray(P_t), pmask_teacher=jnp.asarray(pm_t),
        docid_teacher=np.array(["d"] * P_t.shape[0], dtype=object),
        relevant_docs_test={}, docidx_2_docid_test={}, qsidx_2_query_test=None,
    )
    # precomputed clean-query teacher rows must be IGNORED under qnoise
    from evdr_tpu.train.harness import _precompute_teacher_scores
    bundle.sc_t_train = _precompute_teacher_scores(
        bundle.Q_train, bundle.qmask_train, bundle.P_teacher_norm,
        bundle.pmask_teacher, chunk_q=8, chunk_p=4, impl="xla")

    optimizer = optax.adamw(lr, weight_decay=wd)
    param = jnp.asarray(Pbar)
    opt_state = optimizer.init(param)
    step = build_train_step(cfg, bundle, jnp.asarray(pm_s), optimizer)
    idx = jnp.arange(Qb.shape[0], dtype=jnp.int32)
    param2, _, parts = step(param, opt_state, idx, key)

    np.testing.assert_allclose(float(parts["total_loss"]), loss.item(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(param2), want, rtol=1e-4, atol=2e-5)


@needs_ref
def test_one_ranknet_step_matches_reference():
    Qb, qmb, P_t, pm_t, Pbar, pm_s = _setup(seed=3)
    lr, wd = 1e-3, 1e-2

    def l2n(x):
        return x / (x.norm(dim=-1, keepdim=True) + 1e-12)

    param_t = torch.nn.Parameter(torch.tensor(Pbar))
    opt = torch.optim.AdamW([param_t], lr=lr, weight_decay=wd)
    pm_s_t = torch.tensor(pm_s)
    Psb = l2n(param_t * pm_s_t.unsqueeze(-1))
    with torch.no_grad():
        sc_t = ref_score(torch.tensor(Qb), torch.tensor(P_t),
                         torch.tensor(qmb), torch.tensor(pm_t), chunk_p=4)
    sc_s = ref_score(torch.tensor(Qb), Psb, torch.tensor(qmb), pm_s_t, chunk_p=4)
    loss = ref_criterion.pairwise_distillation_loss(sc_s, sc_t)
    opt.zero_grad(set_to_none=True)
    loss.backward()
    opt.step()
    want = param_t.detach().numpy()

    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import DatasetBundle, build_train_step
    import jax
    import optax

    cfg = TrainConfig(loss="ranknet", lr=lr, weight_decay=wd, chunk_p=4)
    bundle = DatasetBundle(
        dataset="x",
        Q_train=jnp.asarray(Qb), qmask_train=jnp.asarray(qmb), pos_idx=None,
        Q_test=jnp.asarray(Qb), qmask_test=jnp.asarray(qmb),
        P_teacher_norm=jnp.asarray(P_t), pmask_teacher=jnp.asarray(pm_t),
        docid_teacher=np.array(["d"] * P_t.shape[0], dtype=object),
        relevant_docs_test={}, docidx_2_docid_test={}, qsidx_2_query_test=None,
    )
    optimizer = optax.adamw(lr, weight_decay=wd)
    param = jnp.asarray(Pbar)
    opt_state = optimizer.init(param)
    step = build_train_step(cfg, bundle, jnp.asarray(pm_s), optimizer)
    idx = jnp.arange(Qb.shape[0], dtype=jnp.int32)
    param2, _, parts = step(param, opt_state, idx, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(parts["total_loss"]), loss.item(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(param2), want, rtol=1e-4, atol=2e-5)
