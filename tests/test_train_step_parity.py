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
def test_one_mixup_liscore_step_matches_reference():
    """aug='mixup' parity vs mainv3_iter_liscore_mixup.py:289-335.

    The reference mixes masked student embeddings with a Beta(a,a) lambda and
    a random doc permutation, AND-s the masks, mixes the teacher target at
    score level, and adds lambda_mix * (lambda_score * mse) to the total.
    The exact (lam, perm) our jitted step derives from its PRNG key are
    injected into the torch pipeline.
    """
    import jax

    Qb, qmb, P_t, pm_t, Pbar, pm_s = _setup(seed=11)
    lr, wd, k, temp, lam_l, lam_s = 1e-3, 1e-2, 4, 0.1, 1.0, 0.7
    lambda_mix, mixup_alpha = 0.5, 0.2
    n = Pbar.shape[0]

    # replicate the step's PRNG derivation (harness.py mixup branch)
    key = jax.random.PRNGKey(0)
    rng_lam, rng_perm = jax.random.split(key)
    lam = float(jax.random.beta(rng_lam, mixup_alpha, mixup_alpha))
    perm = np.asarray(jax.random.permutation(rng_perm, n))

    # ---- reference step semantics (torch), with our lam/perm injected ----
    def l2n(x):
        return x / (x.norm(dim=-1, keepdim=True) + 1e-12)

    param_t = torch.nn.Parameter(torch.tensor(Pbar))
    opt = torch.optim.AdamW([param_t], lr=lr, weight_decay=wd)
    pm_s_t = torch.tensor(pm_s)
    P_masked = param_t * pm_s_t.unsqueeze(-1)
    Psb = l2n(P_masked)
    with torch.no_grad():
        sc_t = ref_score(torch.tensor(Qb), torch.tensor(P_t),
                         torch.tensor(qmb), torch.tensor(pm_t), chunk_p=4)
    sc_s = ref_score(torch.tensor(Qb), Psb, torch.tensor(qmb), pm_s_t, chunk_p=4)
    total = (lam_l * ref_criterion.listwise_distillation_loss(sc_s, sc_t, k=k, temperature=temp)
             + lam_s * ref_criterion.score_preserving_loss(sc_s, sc_t))
    perm_t = torch.tensor(perm, dtype=torch.long)
    pmask_mix = pm_s_t & pm_s_t[perm_t]
    P_mix = lam * P_masked + (1.0 - lam) * P_masked[perm_t]
    Psb_mix = l2n(P_mix * pmask_mix.unsqueeze(-1))
    sc_s_mix = ref_score(torch.tensor(Qb), Psb_mix, torch.tensor(qmb),
                         pmask_mix, chunk_p=4)
    with torch.no_grad():
        sc_t_mix = lam * sc_t + (1.0 - lam) * sc_t[:, perm_t]
    loss_mix = lam_s * ref_criterion.score_preserving_loss(sc_s_mix, sc_t_mix.detach())
    total = total + lambda_mix * loss_mix
    opt.zero_grad(set_to_none=True)
    total.backward()
    opt.step()
    want = param_t.detach().numpy()

    # ---- our step (jax), aug='mixup', same PRNG key ----
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import DatasetBundle, build_train_step
    import optax

    cfg = TrainConfig(loss="liscore", lr=lr, weight_decay=wd, k=k, temp=temp,
                      lambda_list=lam_l, lambda_score=lam_s, chunk_p=4,
                      aug="mixup", mixup_alpha=mixup_alpha,
                      lambda_mix=lambda_mix)
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
    param2, _, parts = step(param, opt_state, idx, key)

    np.testing.assert_allclose(float(parts["total_loss"]), total.item(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(param2), want, rtol=1e-4, atol=2e-5)


@needs_ref
def test_one_hardtoken_liscore_step_matches_reference():
    """aug='hardtoken' parity vs mainv3_iter_liscore_QA_hardtoken.py:360-445.

    The reference picks, per query, the `aux_docs` largest |rank-gap| docs
    within the teacher top-k, builds one-token virtual queries from each
    picked doc's hardest token (+noise, L2-normalized, query-major order),
    and adds lambda_aux * (lambda_list*listwise + lambda_score*mse) on the
    virtual-query scores. The exact noise our jitted step draws from its PRNG
    key is injected into the torch pipeline.

    Tie handling: integer rank gaps tie often, and torch.topk's order among
    tied values is backend-unspecified (observed: NOT lowest-index-first on
    CPU), so the reference pins no particular tie order. The oracle here uses
    the deterministic lowest-position-first order our harness implements;
    everything downstream (hard-token choice, noise, scoring, loss
    composition, AdamW update) is then exact parity.
    """
    import jax

    Qb, qmb, P_t, pm_t, Pbar, pm_s = _setup(seed=13)
    lr, wd, k, temp, lam_l, lam_s = 1e-3, 1e-2, 4, 0.1, 1.0, 0.7
    aux_docs, virt_noise_std, lambda_aux = 2, 0.1, 0.3
    b = Qb.shape[0]

    key = jax.random.PRNGKey(0)
    noise = np.asarray(jax.random.normal(
        key, (b * aux_docs, 1, Qb.shape[-1]), jnp.float32)) * virt_noise_std

    # ---- reference step semantics (torch), with our noise injected ----
    def l2n(x):
        return x / (x.norm(dim=-1, keepdim=True) + 1e-12)

    param_t = torch.nn.Parameter(torch.tensor(Pbar))
    opt = torch.optim.AdamW([param_t], lr=lr, weight_decay=wd)
    pm_s_t = torch.tensor(pm_s)
    qmb_t = torch.tensor(qmb)
    Qb_t = torch.tensor(Qb)
    P_t_t = torch.tensor(P_t)
    pm_t_t = torch.tensor(pm_t)
    Psb = l2n(param_t * pm_s_t.unsqueeze(-1))
    with torch.no_grad():
        sc_t = ref_score(Qb_t, P_t_t, qmb_t, pm_t_t, chunk_p=4)
    sc_s = ref_score(Qb_t, Psb, qmb_t, pm_s_t, chunk_p=4)
    with torch.no_grad():
        rank_t = torch.argsort(torch.argsort(sc_t, dim=-1, descending=True), dim=-1)
        rank_s = torch.argsort(torch.argsort(sc_s, dim=-1, descending=True), dim=-1)
        gap = rank_t.float() - rank_s.float()
        kk = min(k, sc_t.shape[1])
        topk_idx = torch.topk(sc_t, k=kk, dim=-1).indices
        gap_topk = gap.gather(1, topk_idx).abs()
        # deterministic lowest-position-first tie order (see docstring):
        # stable descending argsort, same as the harness's stable jnp.argsort
        aux_pos = torch.argsort(gap_topk, dim=1, descending=True,
                                stable=True)[:, :aux_docs]
        aux_doc_idx_q = topk_idx.gather(1, aux_pos)
    qv_list = []
    with torch.no_grad():
        for q_i in range(b):
            q_tokens = Qb_t[q_i][qmb_t[q_i].bool()]
            for slot, doc_i in enumerate(aux_doc_idx_q[q_i].tolist()):
                doc_tok = P_t_t[int(doc_i)]
                sim = q_tokens @ doc_tok.T
                sim[:, ~pm_t_t[int(doc_i)].bool()] = float("-inf")
                best = torch.argmax(sim.max(dim=0).values)
                qv = doc_tok[best] + torch.tensor(
                    noise[q_i * aux_docs + slot, 0])
                qv_list.append(l2n(qv).view(1, 1, -1))
    q_virtual = torch.cat(qv_list, dim=0)
    qmask_v = torch.ones(q_virtual.shape[0], 1, dtype=torch.bool)
    with torch.no_grad():
        sc_t_v = ref_score(q_virtual, P_t_t, qmask_v, pm_t_t, chunk_p=4)
    sc_s_v = ref_score(q_virtual, Psb, qmask_v, pm_s_t, chunk_p=4)
    loss_aux = (lam_l * ref_criterion.listwise_distillation_loss(sc_s_v, sc_t_v, k=k, temperature=temp)
                + lam_s * ref_criterion.score_preserving_loss(sc_s_v, sc_t_v))
    total = (lam_l * ref_criterion.listwise_distillation_loss(sc_s, sc_t, k=k, temperature=temp)
             + lam_s * ref_criterion.score_preserving_loss(sc_s, sc_t)
             + lambda_aux * loss_aux)
    opt.zero_grad(set_to_none=True)
    total.backward()
    opt.step()
    want = param_t.detach().numpy()

    # ---- our step (jax), aug='hardtoken', same PRNG key ----
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import DatasetBundle, build_train_step
    import optax

    cfg = TrainConfig(loss="liscore", lr=lr, weight_decay=wd, k=k, temp=temp,
                      lambda_list=lam_l, lambda_score=lam_s, chunk_p=4,
                      aug="hardtoken", aux_docs=aux_docs,
                      virt_noise_std=virt_noise_std, lambda_aux=lambda_aux)
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
    idx = jnp.arange(b, dtype=jnp.int32)
    param2, _, parts = step(param, opt_state, idx, key)

    np.testing.assert_allclose(float(parts["total_loss"]), total.item(),
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
