"""Model-level fused (Pallas) E-step paths on CPU via FORCE_INTERPRET.

The kernel-level interpret tests in test_pallas_scan.py validate the
kernels' math; these run the MODELS' fused dispatch end-to-end —
`infer` + `accumulate` + one `vb_step` — so the padding/cache glue in
`PhoneLoop.infer`/`HMM.infer` (reference beer/models/{hmm,phoneloop}.py
E-step entry points) is covered without a TPU.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import beer_tpu
from beer_tpu.models import graph as graph_mod
from beer_tpu.models.hmm import HMM
from beer_tpu.models.phoneloop import PhoneLoop
from beer_tpu.ops import pallas_scan
from beer_tpu.vbi import vb_step


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def force_interpret(monkeypatch):
    monkeypatch.setattr(pallas_scan, "FORCE_INTERPRET", True)
    pallas_scan.available.cache_clear()
    yield
    pallas_scan.available.cache_clear()


def _general_path(model, stats, mask, monkeypatch):
    """Run infer/accumulate with the pallas path disabled."""
    with monkeypatch.context() as m:
        m.setattr(pallas_scan, "FORCE_INTERPRET", False)
        pallas_scan.available.cache_clear()
        try:
            log_z, cache = model.infer(stats, mask)
            assert "ckpts" not in cache
            acc = model.accumulate(stats, cache)
        finally:
            pallas_scan.available.cache_clear()
    return log_z, acc


def _assert_acc_close(acc_f, acc_g, rtol=2e-3, atol=0.05):
    flat_f, flat_g = jax.tree.leaves(acc_f), jax.tree.leaves(acc_g)
    assert len(flat_f) == len(flat_g)
    for a, b in zip(flat_f, flat_g):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=rtol, atol=atol)


def test_hmm_fused_path_matches_general(rng, force_interpret, monkeypatch):
    S, P, D, B, T = 8, 4, 3, 2, 21
    g = graph_mod.Graph()
    states = [g.add_state(i % P) for i in range(S)]
    for s in states:
        for t in states:
            g.add_arc(s, t, 0.5 if s == t else 0.5 / (S - 1))
        g.set_init(s)
        g.set_final(s, 0.1)
    g.normalize()
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.eye(D), P, cov_type="diagonal", noise_std=0.5,
        key=jax.random.PRNGKey(0),
    )
    hmm = HMM.create(g, nset, learn_transitions=True)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 13:] = 0
    mask = jnp.asarray(mask)

    stats = hmm.sufficient_statistics(x)
    assert hmm._fused_estep_ok()
    logz_f, cache_f = hmm.infer(stats, mask)
    assert "ckpts" in cache_f
    acc_f = hmm.accumulate(stats, cache_f)
    logz_g, acc_g = _general_path(hmm, stats, mask, monkeypatch)
    np.testing.assert_allclose(np.asarray(logz_f), np.asarray(logz_g),
                               rtol=2e-5, atol=1e-4)
    _assert_acc_close(acc_f, acc_g)
    # xi diagnostic through the fused cache
    counts = np.asarray(hmm.expected_transition_counts(cache_f))
    assert np.isfinite(counts).all() and (counts >= 0).all()
    np.testing.assert_allclose(
        counts.sum(), float(np.asarray(mask)[:, 1:].sum()), rtol=1e-4
    )


def test_phone_loop_fused_path_matches_general(rng, force_interpret,
                                               monkeypatch):
    U, SPU, D, B, T = 3, 2, 3, 2, 17
    S = U * SPU
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.eye(D), S, cov_type="diagonal", noise_std=0.5,
        key=jax.random.PRNGKey(1),
    )
    loop = PhoneLoop.create(U, SPU, nset)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 9:] = 0
    mask = jnp.asarray(mask)

    stats = loop.sufficient_statistics(x)
    assert loop._fused_estep_ok()
    logz_f, cache_f = loop.infer(stats, mask)
    assert "ckpts" in cache_f
    acc_f = loop.accumulate(stats, cache_f)
    logz_g, acc_g = _general_path(loop, stats, mask, monkeypatch)
    np.testing.assert_allclose(np.asarray(logz_f), np.asarray(logz_g),
                               rtol=2e-5, atol=1e-4)
    _assert_acc_close(acc_f, acc_g)

    # one full fused VB step stays finite and matches the general step
    elbo_f, loop_f = vb_step(loop, x, mask=mask)
    with monkeypatch.context() as m:
        m.setattr(pallas_scan, "FORCE_INTERPRET", False)
        pallas_scan.available.cache_clear()
        try:
            elbo_g, _ = vb_step(loop, x, mask=mask)
        finally:
            pallas_scan.available.cache_clear()
    assert np.isfinite(float(elbo_f))
    np.testing.assert_allclose(float(elbo_f), float(elbo_g), rtol=1e-4)


def test_svae_grad_through_fused_phone_loop(rng, force_interpret,
                                            monkeypatch):
    """The SVAE hybrid step differentiates log Z through the fused
    forward (`forward_llh_ckpt_banded` custom_vjp) — the on-TPU training
    path.  Gradients must match the general-path step."""
    import optax
    from beer_tpu.models.vae import SequenceVAE, make_vae_train_step

    U, SPU, DZ, DX, B, T = 2, 2, 2, 3, 2, 9
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(DZ), jnp.eye(DZ), U * SPU, cov_type="diagonal",
        noise_std=0.5, key=jax.random.PRNGKey(2),
    )
    loop = PhoneLoop.create(U, SPU, nset, self_loop=0.7)
    svae = SequenceVAE.create(
        obs_dim=DX, latent_dim=DZ, latent_model=loop, hidden=(8,),
        nsamples=1, key=jax.random.PRNGKey(4),
    )
    x = jnp.asarray(rng.normal(size=(B, T, DX)), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 5:] = 0
    mask = jnp.asarray(mask)
    tx = optax.adam(1e-3)
    opt_state = tx.init(svae.nnet_params)
    assert loop._fused_estep_ok()

    step = make_vae_train_step(tx)
    elbo_f, svae_f, _ = step(svae, opt_state, x, jax.random.PRNGKey(0), mask)
    with monkeypatch.context() as m:
        m.setattr(pallas_scan, "FORCE_INTERPRET", False)
        pallas_scan.available.cache_clear()
        try:
            step_g = make_vae_train_step(tx)
            elbo_g, svae_g, _ = step_g(
                svae, opt_state, x, jax.random.PRNGKey(0), mask
            )
        finally:
            pallas_scan.available.cache_clear()
    np.testing.assert_allclose(float(elbo_f), float(elbo_g), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(svae_f.nnet_params),
                    jax.tree.leaves(svae_g.nnet_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_phone_loop_lane_major_matches_general(rng, force_interpret,
                                               monkeypatch):
    """LANE_MAJOR=True routes the fused E-step through the (S, B)
    kernels + accumulate_from_moments; results must match the general
    path like the batch-major fused path does."""
    from beer_tpu.models import phoneloop as phoneloop_mod

    U, SPU, D, B, T = 3, 2, 3, 2, 17
    S = U * SPU
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.eye(D), S, cov_type="diagonal", noise_std=0.5,
        key=jax.random.PRNGKey(1),
    )
    loop = PhoneLoop.create(U, SPU, nset)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 9:] = 0
    mask = jnp.asarray(mask)

    stats = loop.sufficient_statistics(x)
    assert loop._fused_estep_ok()
    monkeypatch.setattr(phoneloop_mod, "LANE_MAJOR", True)
    logz_f, cache_f = loop.infer(stats, mask)
    assert "llh_lm" in cache_f
    acc_f = loop.accumulate(stats, cache_f)
    monkeypatch.setattr(phoneloop_mod, "LANE_MAJOR", False)
    logz_g, acc_g = _general_path(loop, stats, mask, monkeypatch)
    np.testing.assert_allclose(np.asarray(logz_f), np.asarray(logz_g),
                               rtol=2e-5, atol=1e-4)
    _assert_acc_close(acc_f, acc_g)

    # one full lane-major VB step == the general step
    monkeypatch.setattr(phoneloop_mod, "LANE_MAJOR", True)
    elbo_f, loop_f = vb_step(loop, x, mask=mask)
    monkeypatch.setattr(phoneloop_mod, "LANE_MAJOR", False)
    with monkeypatch.context() as m:
        m.setattr(pallas_scan, "FORCE_INTERPRET", False)
        pallas_scan.available.cache_clear()
        try:
            elbo_g, _ = vb_step(loop, x, mask=mask)
        finally:
            pallas_scan.available.cache_clear()
    assert np.isfinite(float(elbo_f))
    np.testing.assert_allclose(float(elbo_f), float(elbo_g), rtol=1e-4)


def test_svae_grad_through_lane_major_phone_loop(rng, force_interpret,
                                                 monkeypatch):
    """SVAE gradients flow through forward_llh_ckpt_banded_lm's
    custom_vjp and match the general path."""
    import optax
    from beer_tpu.models import phoneloop as phoneloop_mod
    from beer_tpu.models.vae import SequenceVAE, make_vae_train_step

    U, SPU, DZ, DX, B, T = 2, 2, 2, 3, 2, 9
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(DZ), jnp.eye(DZ), U * SPU, cov_type="diagonal",
        noise_std=0.5, key=jax.random.PRNGKey(2),
    )
    loop = PhoneLoop.create(U, SPU, nset, self_loop=0.7)
    svae = SequenceVAE.create(
        obs_dim=DX, latent_dim=DZ, latent_model=loop, hidden=(8,),
        nsamples=1, key=jax.random.PRNGKey(4),
    )
    x = jnp.asarray(rng.normal(size=(B, T, DX)), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 5:] = 0
    mask = jnp.asarray(mask)
    tx = optax.adam(1e-3)
    opt_state = tx.init(svae.nnet_params)

    monkeypatch.setattr(phoneloop_mod, "LANE_MAJOR", True)
    step = make_vae_train_step(tx)
    elbo_f, svae_f, _ = step(svae, opt_state, x, jax.random.PRNGKey(0), mask)
    monkeypatch.setattr(phoneloop_mod, "LANE_MAJOR", False)
    with monkeypatch.context() as m:
        m.setattr(pallas_scan, "FORCE_INTERPRET", False)
        pallas_scan.available.cache_clear()
        try:
            step_g = make_vae_train_step(tx)
            elbo_g, svae_g, _ = step_g(
                svae, opt_state, x, jax.random.PRNGKey(0), mask
            )
        finally:
            pallas_scan.available.cache_clear()
    np.testing.assert_allclose(float(elbo_f), float(elbo_g), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(svae_f.nnet_params),
                    jax.tree.leaves(svae_g.nnet_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_hmm_lane_major_matches_general(rng, force_interpret, monkeypatch):
    """pallas_scan.LANE_MAJOR routes the HMM fused E-step through the
    dense (S, B) kernels; results must match the general path."""
    S, P, D, B, T = 8, 4, 3, 2, 21
    g = graph_mod.Graph()
    states = [g.add_state(i % P) for i in range(S)]
    for s in states:
        for t in states:
            g.add_arc(s, t, 0.5 if s == t else 0.5 / (S - 1))
        g.set_init(s)
        g.set_final(s, 0.1)
    g.normalize()
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.eye(D), P, cov_type="diagonal", noise_std=0.5,
        key=jax.random.PRNGKey(0),
    )
    hmm = HMM.create(g, nset, learn_transitions=True)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 13:] = 0
    mask = jnp.asarray(mask)

    stats = hmm.sufficient_statistics(x)
    assert hmm._fused_estep_ok()
    monkeypatch.setattr(pallas_scan, "LANE_MAJOR", True)
    # default gates: the stats-streaming path (fused ELLH + in-VMEM
    # moment accumulation; non-identity 1-D pdf map folds into W/acc2)
    logz_f, cache_f = hmm.infer(stats, mask)
    assert "w_lm" in cache_f and "llh_lm" not in cache_f
    acc_f = hmm.accumulate(stats, cache_f)
    # γ-emitting llh-streaming lm path (BEER_FUSE_ELLH=0)
    monkeypatch.setattr(pallas_scan, "FUSE_ELLH", False)
    logz_l, cache_l = hmm.infer(stats, mask)
    assert "llh_lm" in cache_l
    acc_l = hmm.accumulate(stats, cache_l)
    monkeypatch.setattr(pallas_scan, "FUSE_ELLH", True)
    monkeypatch.setattr(pallas_scan, "LANE_MAJOR", False)
    logz_g, acc_g = _general_path(hmm, stats, mask, monkeypatch)
    np.testing.assert_allclose(np.asarray(logz_f), np.asarray(logz_g),
                               rtol=2e-5, atol=1e-4)
    _assert_acc_close(acc_f, acc_g)
    np.testing.assert_allclose(np.asarray(logz_l), np.asarray(logz_g),
                               rtol=2e-5, atol=1e-4)
    _assert_acc_close(acc_l, acc_g)

    monkeypatch.setattr(pallas_scan, "LANE_MAJOR", True)
    elbo_f, _ = vb_step(hmm, x, mask=mask)
    monkeypatch.setattr(pallas_scan, "LANE_MAJOR", False)
    with monkeypatch.context() as m:
        m.setattr(pallas_scan, "FORCE_INTERPRET", False)
        pallas_scan.available.cache_clear()
        try:
            elbo_g, _ = vb_step(hmm, x, mask=mask)
        finally:
            pallas_scan.available.cache_clear()
    np.testing.assert_allclose(float(elbo_f), float(elbo_g), rtol=1e-4)


def test_recognizer_fused_path_matches_general(rng, force_interpret,
                                               monkeypatch):
    """Shared transcription graphs (per-utterance pdf_ids/log_final, one
    (S, S) matrix) route through the checkpointed fused kernels; log Z
    and accumulated stats must match the general batched path."""
    from tests.test_recognizer import (N_PHONES, STATES, make_corpus,
                                       make_emissions)

    rng2 = np.random.default_rng(7)
    transcriptions, data, mask = make_corpus(rng2, n_utts=4, max_phones=4)
    x, m = jnp.asarray(data, jnp.float32), jnp.asarray(mask, jnp.float32)
    graphs = graph_mod.transcription_graphs(
        transcriptions, N_PHONES, STATES, dtype=jnp.float32, shared=True)
    hmm = HMM.create(graphs, make_emissions(data, mask))
    stats = hmm.sufficient_statistics(x)
    assert hmm._fused_estep_ok()
    logz_f, cache_f = hmm.infer(stats, m)
    assert "ckpts" in cache_f or "llh_lm" in cache_f
    acc_f = hmm.accumulate(stats, cache_f)
    logz_g, acc_g = _general_path(hmm, stats, m, monkeypatch)
    np.testing.assert_allclose(np.asarray(logz_f), np.asarray(logz_g),
                               rtol=2e-4, atol=5e-3)
    _assert_acc_close(acc_f, acc_g)

    # lane-major orientation over per-utterance graphs
    monkeypatch.setattr(pallas_scan, "LANE_MAJOR", True)
    logz_l, cache_l = hmm.infer(stats, m)
    assert "llh_lm" in cache_l
    acc_l = hmm.accumulate(stats, cache_l)
    monkeypatch.setattr(pallas_scan, "LANE_MAJOR", "0")
    np.testing.assert_allclose(np.asarray(logz_l), np.asarray(logz_g),
                               rtol=2e-4, atol=5e-3)
    _assert_acc_close(acc_l, acc_g)


def test_hmm_stats_path_zero_length_utterance(rng, force_interpret,
                                              monkeypatch):
    """A fully-masked (zero-length) utterance through the
    stats-streaming lane-major path: log Z must be exactly 0 for that
    row, accumulated stats must match the general path, and nothing may
    go NaN."""
    S, P, D, B, T = 6, 3, 2, 3, 17
    g = graph_mod.Graph()
    states = [g.add_state(i % P) for i in range(S)]
    for s in states:
        for t in states:
            g.add_arc(s, t, 1.0 / S)
        g.set_init(s)
        g.set_final(s, 0.2)
    g.normalize()
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.eye(D), P, cov_type="diagonal", noise_std=0.5,
        key=jax.random.PRNGKey(2),
    )
    hmm = HMM.create(g, nset, learn_transitions=True)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, :] = 0.0                      # zero-length utterance
    mask[2, 5:] = 0.0
    mask = jnp.asarray(mask)

    stats = hmm.sufficient_statistics(x)
    monkeypatch.setattr(pallas_scan, "LANE_MAJOR", True)
    logz_f, cache_f = hmm.infer(stats, mask)
    assert "w_lm" in cache_f
    assert float(logz_f[1]) == 0.0
    assert np.all(np.isfinite(np.asarray(logz_f)))
    acc_f = hmm.accumulate(stats, cache_f)
    monkeypatch.setattr(pallas_scan, "LANE_MAJOR", False)
    logz_g, acc_g = _general_path(hmm, stats, mask, monkeypatch)
    np.testing.assert_allclose(np.asarray(logz_f), np.asarray(logz_g),
                               rtol=2e-5, atol=1e-4)
    _assert_acc_close(acc_f, acc_g)


def test_hmm_stats_path_logz_gradient_matches_general(rng, force_interpret,
                                                      monkeypatch):
    """∂(Σ log Z)/∂data through the HMM stats-streaming path uses the
    Fisher-identity backward (hmm_logz_stats_lm: one fused smoothing
    pass, ∂log Z/∂llh = γ); it must match autodiff through the general
    scan path."""
    S, P, D, B, T = 6, 3, 2, 3, 17
    g = graph_mod.Graph()
    states = [g.add_state(i % P) for i in range(S)]
    for s in states:
        for t in states:
            g.add_arc(s, t, 1.0 / S)
        g.set_init(s)
        g.set_final(s, 0.2)
    g.normalize()
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.eye(D), P, cov_type="diagonal", noise_std=0.5,
        key=jax.random.PRNGKey(5),
    )
    hmm = HMM.create(g, nset)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[2, 9:] = 0
    mask = jnp.asarray(mask)

    def logz_sum(x):
        stats = hmm.sufficient_statistics(x)
        log_z, _ = hmm.infer(stats, mask)
        return log_z.sum()

    monkeypatch.setattr(pallas_scan, "LANE_MAJOR", True)
    _, cache = hmm.infer(hmm.sufficient_statistics(x), mask)
    assert "w_lm" in cache          # the stats path is what we test
    g_f = jax.grad(logz_sum)(x)
    monkeypatch.setattr(pallas_scan, "LANE_MAJOR", False)
    with monkeypatch.context() as m:
        m.setattr(pallas_scan, "FORCE_INTERPRET", False)
        pallas_scan.available.cache_clear()
        try:
            g_g = jax.grad(logz_sum)(x)
        finally:
            pallas_scan.available.cache_clear()
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_g),
                               rtol=5e-4, atol=1e-5)


def test_use_lane_major_gate(monkeypatch):
    """The auto gate reproduces the on-chip dp-shard sweep (v5e, S=150):
    lane-major for B>=32, batch-major at B=16; forced modes override."""
    monkeypatch.setattr(pallas_scan, "LANE_MAJOR", "auto")
    assert not pallas_scan.use_lane_major(16, 150)
    for b in (32, 64, 128, 512):
        assert pallas_scan.use_lane_major(b, 150)
    # small-S shapes (hmm bench config) are lane-major at any dp shard
    assert pallas_scan.use_lane_major(32, 30)
    monkeypatch.setattr(pallas_scan, "LANE_MAJOR", "1")
    assert pallas_scan.use_lane_major(16, 150)
    monkeypatch.setattr(pallas_scan, "LANE_MAJOR", "0")
    assert not pallas_scan.use_lane_major(512, 150)
