"""Pallas scan kernels vs the jnp scaled-pass reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from beer_tpu.ops import pallas_scan, semiring_scan
from tests.test_hmm import random_hmm_params


def make_case(rng, b=4, t_len=23, s=5):
    lt, li, lf = random_hmm_params(rng, s, dtype=np.float32)
    llh = rng.normal(size=(b, t_len, s)).astype(np.float32)
    lengths = rng.integers(t_len // 2, t_len + 1, size=b)
    mask = (np.arange(t_len)[None] < lengths[:, None]).astype(np.float32)
    m_llh = llh.max(-1, keepdims=True)
    e_llh = np.exp(llh - m_llh) * mask[..., None] + (1 - mask[..., None])
    trans = np.exp(lt).astype(np.float32)
    init = np.broadcast_to(np.exp(li), (b, s)).astype(np.float32)
    final = np.broadcast_to(np.exp(lf), (b, s)).astype(np.float32)
    return map(jnp.asarray, (e_llh, trans, init, final, mask))


def test_forward_matches_scaled_pass(rng):
    e_llh, trans, init, final, mask = make_case(rng)
    p_ref, c_ref, (last_p, last_c) = semiring_scan._scaled_pass(
        e_llh, trans, init, mask, reverse=False
    )
    p_pal, c_pal, (lp, lc) = pallas_scan.forward_pass(
        e_llh, trans, init, mask, interpret=True
    )
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(last_p), rtol=1e-5, atol=1e-6)


def test_backward_matches_scaled_pass(rng):
    e_llh, trans, init, final, mask = make_case(rng)
    p_ref, c_ref, _ = semiring_scan._scaled_pass(
        e_llh, trans, final, mask, reverse=True
    )
    p_pal, c_pal, _ = pallas_scan.backward_pass(
        e_llh, trans, final, mask, interpret=True
    )
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref), rtol=1e-5, atol=1e-5)


def test_smoothing_matches_scan(rng):
    e_llh, trans, init, final, mask = make_case(rng)
    a_probs, _, _ = semiring_scan._scaled_pass(
        e_llh, trans, init, mask, reverse=False
    )
    ref = semiring_scan._smoothing_scan(e_llh, trans, final, mask, a_probs)
    pal = pallas_scan.backward_smoothing_pass(
        e_llh, trans, final, mask, a_probs, interpret=True
    )
    for r, p, name in zip(ref, pal, ["gamma", "w", "wsum", "pnorm"]):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=1e-5, atol=1e-6, err_msg=name
        )


def make_banded_case(rng, b=4, t_len=23, n_units=4, spu=3):
    """Phone-loop-shaped band + rank-1 transition structure."""
    s = n_units * spu
    ids = np.arange(s)
    sl = 0.6
    a_self = np.full(s, sl, np.float32)
    a_adv = np.where(ids % spu != spu - 1, 1.0 - sl, 0.0).astype(np.float32)
    exit_v = np.zeros(s, np.float32)
    exit_v[ids % spu == spu - 1] = 0.5 * (1.0 - sl)
    w = rng.dirichlet(np.ones(n_units)).astype(np.float32)
    w_scat = np.zeros(s, np.float32)
    w_scat[ids % spu == 0] = w
    bands = tuple(map(jnp.asarray, (a_self, a_adv, exit_v, w_scat)))
    llh = rng.normal(size=(b, t_len, s)).astype(np.float32)
    lengths = rng.integers(t_len // 2, t_len + 1, size=b)
    mask = (np.arange(t_len)[None] < lengths[:, None]).astype(np.float32)
    m_llh = llh.max(-1, keepdims=True)
    e_llh = np.exp(llh - m_llh) * mask[..., None] + (1 - mask[..., None])
    init = np.zeros(s, np.float32)
    init[ids % spu == 0] = w
    init = np.broadcast_to(init, (b, s))
    final = np.zeros(s, np.float32)
    final[ids % spu == spu - 1] = 0.5 * (1.0 - sl)
    final = np.broadcast_to(final, (b, s))
    return (jnp.asarray(e_llh), bands, jnp.asarray(init),
            jnp.asarray(final), jnp.asarray(mask))


def test_banded_forward_matches_dense(rng):
    e_llh, bands, init, final, mask = make_banded_case(rng)
    dense = semiring_scan.bands_to_dense(bands)
    p_ref, c_ref, _ = semiring_scan._scaled_pass(
        e_llh, dense, init, mask, reverse=False
    )
    p_pal, c_pal, _ = pallas_scan.forward_pass_banded(
        e_llh, bands, init, mask, interpret=True
    )
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref), rtol=1e-5, atol=1e-5)


def test_banded_smoothing_matches_dense(rng):
    e_llh, bands, init, final, mask = make_banded_case(rng)
    dense = semiring_scan.bands_to_dense(bands)
    a_probs, _, _ = semiring_scan._scaled_pass(
        e_llh, dense, init, mask, reverse=False
    )
    ref = semiring_scan._smoothing_scan(e_llh, dense, final, mask, a_probs)
    pal = pallas_scan.backward_smoothing_banded(
        e_llh, bands, final, mask, a_probs, interpret=True
    )
    for r, p, name in zip(ref, pal, ["gamma", "w", "wsum", "pnorm"]):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=1e-5, atol=1e-6, err_msg=name
        )


def test_fused_estep_matches_reference(rng):
    """phone_loop_estep_pass (interpret) == the general-path composition
    (forward_backward_probs posteriors/xi + einsum accumulation)."""
    b, t_len, n_units, spu, d = 3, 17, 4, 3, 2
    s = n_units * spu
    lt, li, lf = random_hmm_params(rng, s, dtype=np.float32)
    llh = (rng.normal(size=(b, t_len, s)) * 2).astype(np.float32)
    stats = rng.normal(size=(b, t_len, 2 * d)).astype(np.float32)
    lengths = [t_len, 9, 1]
    mask = np.zeros((b, t_len), np.float32)
    for i, ln in enumerate(lengths):
        mask[i, :ln] = 1.0
    rows = jnp.arange(n_units, dtype=jnp.int32) * spu + spu - 1
    cols = jnp.arange(n_units, dtype=jnp.int32) * spu
    args = (jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li),
            jnp.asarray(lf), jnp.asarray(mask))
    ref = semiring_scan.phone_loop_estep_reference(
        args[0], args[1], args[2], args[3], args[4], rows, cols,
    )
    # fused kernel inputs: time-major + forward by-products
    llh_tm = jnp.swapaxes(args[0], 0, 1)
    trans = jnp.exp(args[1])
    iv = jnp.broadcast_to(jnp.exp(args[2]), (b, s)).astype(jnp.float32)
    fv = jnp.broadcast_to(jnp.exp(args[3]), (b, s)).astype(jnp.float32)
    m_llh = jnp.max(args[0], axis=-1, keepdims=True)
    e = jnp.exp(args[0] - m_llh) * mask[..., None] + (1 - mask[..., None])
    a_bm, logc_bm, _ = semiring_scan._scaled_pass(
        e.astype(jnp.float32), trans, iv, args[4], reverse=False
    )
    norms_bm = jnp.exp(jnp.diff(
        logc_bm, axis=1, prepend=jnp.zeros_like(logc_bm[:, :1])
    ))
    sel_r = jax.nn.one_hot(rows, s, dtype=jnp.float32).T
    sel_c = jax.nn.one_hot(cols, s, dtype=jnp.float32).T
    gamma_tm, xi_raw = pallas_scan.phone_loop_estep_pass(
        llh_tm, jnp.swapaxes(a_bm, 0, 1), norms_bm.T, trans, fv, args[4],
        sel_r, sel_c, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(gamma_tm, 0, 1)), np.asarray(ref[0]),
        rtol=2e-4, atol=1e-5, err_msg="gamma",
    )
    np.testing.assert_allclose(
        np.asarray(xi_raw), np.asarray(ref[1]), rtol=2e-4, atol=1e-5,
        err_msg="xi_raw",
    )


def test_forward_llh_matches_reference(rng):
    e_llh, trans, init, final, mask = make_case(rng)
    llh = jnp.log(jnp.maximum(e_llh, 1e-30)) - 3.0  # arbitrary levels
    p_ref, l_ref, s_ref = semiring_scan._fwd_llh_reference(
        jnp.swapaxes(llh, 0, 1), trans, init, mask
    )
    p, l, sh = pallas_scan.forward_llh_pass(
        jnp.swapaxes(llh, 0, 1), trans, init, mask, interpret=True
    )
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(s_ref), rtol=1e-5, atol=1e-6)


def test_forward_llh_ckpt_matches_reference(rng):
    """forward_llh_ckpt_pass == checkpoints sliced from the full pass —
    on the LIVE entries: the no-blend kernel lets rows drift past their
    length (consumers are masked; the smoothing recompute replays the
    same drift), so checkpoint g matches the frozen reference only for
    rows with len ≥ g·K.  last (the is_last-accumulated α̂(len−1)) and
    log Z match everywhere."""
    e_llh, trans, init, final, mask = make_case(rng)
    llh = jnp.log(jnp.maximum(e_llh, 1e-30)) - 3.0
    llh_tm = jnp.swapaxes(llh, 0, 1)
    c_ref, last_ref, z_ref = semiring_scan._fwd_llh_ckpt_reference(
        llh_tm, trans, init, mask
    )
    c, last, z = pallas_scan.forward_llh_ckpt_pass(
        llh_tm, trans, init, mask, interpret=True
    )
    t_len, b, s = llh_tm.shape
    k = pallas_scan._steps_per_block(b, s)
    lens = np.asarray(mask).sum(-1)
    for g in range(c.shape[0]):
        live = lens >= g * k
        np.testing.assert_allclose(
            np.asarray(c)[g][live], np.asarray(c_ref)[g][live],
            rtol=1e-5, atol=1e-6, err_msg=f"ckpt block {g}")
    np.testing.assert_allclose(np.asarray(last), np.asarray(last_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-4)


def test_fused_estep_ckpt_matches_reference(rng):
    """checkpointed fused E-step (forward_llh_ckpt_pass →
    phone_loop_estep_ckpt_pass, interpret) == the general-path reference
    — γ and restricted ξ, ragged masks included."""
    b, t_len, n_units, spu, d = 3, 17, 4, 3, 2
    s = n_units * spu
    lt, li, lf = random_hmm_params(rng, s, dtype=np.float32)
    llh = (rng.normal(size=(b, t_len, s)) * 2).astype(np.float32)
    lengths = [t_len, 9, 1]
    mask = np.zeros((b, t_len), np.float32)
    for i, ln in enumerate(lengths):
        mask[i, :ln] = 1.0
    rows = jnp.arange(n_units, dtype=jnp.int32) * spu + spu - 1
    cols = jnp.arange(n_units, dtype=jnp.int32) * spu
    args = (jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li),
            jnp.asarray(lf), jnp.asarray(mask))
    ref = semiring_scan.phone_loop_estep_reference(
        args[0], args[1], args[2], args[3], args[4], rows, cols,
    )
    llh_tm = jnp.swapaxes(args[0], 0, 1)
    trans = jnp.exp(args[1])
    iv = jnp.broadcast_to(jnp.exp(args[2]), (b, s)).astype(jnp.float32)
    fv = jnp.broadcast_to(jnp.exp(args[3]), (b, s)).astype(jnp.float32)
    ckpts, last, logz_base = pallas_scan.forward_llh_ckpt_pass(
        llh_tm, trans, iv, args[4], interpret=True
    )
    sel_r = jax.nn.one_hot(rows, s, dtype=jnp.float32).T
    sel_c = jax.nn.one_hot(cols, s, dtype=jnp.float32).T
    gamma_tm, xi_raw = pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, ckpts, trans, fv, args[4], sel_r, sel_c, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(gamma_tm, 0, 1)), np.asarray(ref[0]),
        rtol=2e-4, atol=1e-5, err_msg="gamma",
    )
    np.testing.assert_allclose(
        np.asarray(xi_raw), np.asarray(ref[1]), rtol=2e-4, atol=1e-5,
        err_msg="xi_raw",
    )


def test_stats_fused_ckpt_matches_llh_variant(rng):
    """fused-ELLH ckpt kernels (stats streamed, llh computed in-kernel)
    == the llh-input ckpt kernels given llh = stats @ W + bias."""
    b, t_len, n_units, spu, p_dim = 3, 17, 4, 3, 7
    s = n_units * spu
    lt, _, lf = random_hmm_params(rng, s, dtype=np.float32)
    stats = rng.normal(size=(b, t_len, p_dim)).astype(np.float32)
    w = rng.normal(size=(p_dim, s)).astype(np.float32)
    bias = rng.normal(size=(s,)).astype(np.float32)
    lengths = [t_len, 9, 1]
    mask = np.zeros((b, t_len), np.float32)
    for i, ln in enumerate(lengths):
        mask[i, :ln] = 1.0
    mask = jnp.asarray(mask)
    stats_tm = jnp.swapaxes(jnp.asarray(stats), 0, 1)
    llh_tm = jnp.matmul(
        stats_tm, jnp.asarray(w), precision=jax.lax.Precision.HIGHEST
    ) + jnp.asarray(bias)
    trans = jnp.exp(jnp.asarray(lt))
    iv = jnp.full((b, s), 1.0 / s, jnp.float32)
    fv = jnp.broadcast_to(jnp.exp(jnp.asarray(lf)), (b, s)).astype(jnp.float32)

    c_ref, last_ref, z_ref = pallas_scan.forward_llh_ckpt_pass(
        llh_tm, trans, iv, mask, interpret=True
    )
    c, last, z = pallas_scan.forward_llh_ckpt_pass(
        stats_tm, trans, iv, mask, interpret=True,
        w=jnp.asarray(w), bias=jnp.asarray(bias),
    )
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(last), np.asarray(last_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-4)

    rows = jnp.arange(n_units, dtype=jnp.int32) * spu + spu - 1
    cols = jnp.arange(n_units, dtype=jnp.int32) * spu
    sel_r = jax.nn.one_hot(rows, s, dtype=jnp.float32).T
    sel_c = jax.nn.one_hot(cols, s, dtype=jnp.float32).T
    g_ref, xi_ref = pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, c_ref, trans, fv, mask, sel_r, sel_c, interpret=True,
    )
    g, xi = pallas_scan.phone_loop_estep_ckpt_pass(
        stats_tm, c, trans, fv, mask, sel_r, sel_c, interpret=True,
        w=jnp.asarray(w), bias=jnp.asarray(bias),
    )
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi_ref),
                               rtol=1e-4, atol=1e-5)


def test_full_xi_ckpt_matches_log_oracle(rng):
    """hmm_estep_ckpt (full (S, S) ξ, identity selections) == the
    log-domain forward-backward + expected_transition_counts oracle on
    a random ergodic graph, ragged masks included."""
    b, t_len, s = 3, 17, 6
    lt, li, lf = random_hmm_params(rng, s, dtype=np.float32)
    llh = (rng.normal(size=(b, t_len, s)) * 2).astype(np.float32)
    lengths = [t_len, 9, 2]
    mask = np.zeros((b, t_len), np.float32)
    for i, ln in enumerate(lengths):
        mask[i, :ln] = 1.0
    args = (jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li),
            jnp.asarray(lf), jnp.asarray(mask))
    fb = semiring_scan.forward_backward(*args)
    xi_oracle = semiring_scan.expected_transition_counts(
        fb.log_alpha, fb.log_beta, args[0], args[1], fb.log_z, args[4]
    )

    llh_tm = jnp.swapaxes(args[0], 0, 1)
    trans = jnp.exp(args[1])
    iv = jnp.broadcast_to(jnp.exp(args[2]), (b, s)).astype(jnp.float32)
    fv = jnp.broadcast_to(jnp.exp(args[3]), (b, s)).astype(jnp.float32)
    ckpts, _, _ = pallas_scan.forward_llh_ckpt_pass(
        llh_tm, trans, iv, args[4], interpret=True
    )
    gamma_tm, xi_raw = pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, ckpts, trans, fv, args[4], None, None, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(gamma_tm, 0, 1)), np.asarray(fb.posteriors),
        rtol=2e-4, atol=1e-5, err_msg="gamma",
    )
    np.testing.assert_allclose(
        np.asarray(xi_raw * trans), np.asarray(xi_oracle),
        rtol=2e-4, atol=1e-5, err_msg="xi",
    )


def test_banded_ckpt_matches_dense(rng):
    """Banded ckpt kernels (band + rank-1 VPU propagators) == the dense
    ckpt kernels on a phone-loop-structured transition matrix."""
    b, t_len, n_units, spu = 3, 17, 4, 3
    s = n_units * spu
    ids = np.arange(s)
    a_self = np.full(s, 0.6, np.float32)
    a_adv = np.where(ids % spu != spu - 1, 0.4, 0.0).astype(np.float32)
    exit_v = np.zeros(s, np.float32)
    exit_v[ids % spu == spu - 1] = 0.2
    w_v = np.zeros(s, np.float32)
    w_raw = rng.random(n_units).astype(np.float32)
    w_v[ids % spu == 0] = w_raw / w_raw.sum()
    bands = tuple(jnp.asarray(v) for v in (a_self, a_adv, exit_v, w_v))
    trans = semiring_scan.bands_to_dense(bands)

    llh = (rng.normal(size=(b, t_len, s)) * 2).astype(np.float32)
    lengths = [t_len, 9, 1]
    mask = np.zeros((b, t_len), np.float32)
    for i, ln in enumerate(lengths):
        mask[i, :ln] = 1.0
    mask = jnp.asarray(mask)
    llh_tm = jnp.swapaxes(jnp.asarray(llh), 0, 1)
    iv = jnp.full((b, s), 1.0 / s, jnp.float32)
    fv = jnp.broadcast_to(jnp.asarray(exit_v), (b, s)).astype(jnp.float32)

    c_ref, last_ref, z_ref = pallas_scan.forward_llh_ckpt_pass(
        llh_tm, trans, iv, mask, interpret=True
    )
    c, last, z = pallas_scan.forward_llh_ckpt_pass(
        llh_tm, None, iv, mask, interpret=True, bands=bands
    )
    # ckpt entries for rows past their length drift freely (no-blend
    # kernels) and banded/dense drift arithmetic differs — compare the
    # live entries only (len ≥ g·K); last/log Z are exact everywhere
    k_steps = pallas_scan._steps_per_block(b, s)
    lens_np = np.asarray(mask).sum(-1)
    for g in range(c.shape[0]):
        live = lens_np >= g * k_steps
        np.testing.assert_allclose(
            np.asarray(c)[g][live], np.asarray(c_ref)[g][live],
            rtol=1e-5, atol=1e-6, err_msg=f"ckpt block {g}")
    np.testing.assert_allclose(np.asarray(last), np.asarray(last_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-4)

    rows = jnp.arange(n_units, dtype=jnp.int32) * spu + spu - 1
    cols = jnp.arange(n_units, dtype=jnp.int32) * spu
    sel_r = jax.nn.one_hot(rows, s, dtype=jnp.float32).T
    sel_c = jax.nn.one_hot(cols, s, dtype=jnp.float32).T
    g_ref, xi_ref = pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, c_ref, trans, fv, mask, sel_r, sel_c, interpret=True,
    )
    g, xi = pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, c, None, fv, mask, sel_r, sel_c, interpret=True,
        bands=bands,
    )
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi_ref),
                               rtol=1e-4, atol=1e-5)


def test_estep_ckpt_acc_matches_gamma_variant(rng):
    """γ-fused estep kernel (in-kernel Σγᵀstats / counts / γ(t=0)) ==
    the γ-emitting kernel followed by the XLA einsum."""
    b, t_len, n_units, spu, p_dim = 3, 17, 4, 3, 7
    s = n_units * spu
    lt, _, lf = random_hmm_params(rng, s, dtype=np.float32)
    llh = (rng.normal(size=(b, t_len, s)) * 2).astype(np.float32)
    stats = rng.normal(size=(b, t_len, p_dim)).astype(np.float32)
    lengths = [t_len, 9, 1]
    mask = np.zeros((b, t_len), np.float32)
    for i, ln in enumerate(lengths):
        mask[i, :ln] = 1.0
    mask = jnp.asarray(mask)
    llh_tm = jnp.swapaxes(jnp.asarray(llh), 0, 1)
    stats_tm = jnp.swapaxes(jnp.asarray(stats), 0, 1)
    trans = jnp.exp(jnp.asarray(lt))
    iv = jnp.full((b, s), 1.0 / s, jnp.float32)
    fv = jnp.broadcast_to(jnp.exp(jnp.asarray(lf)), (b, s)).astype(jnp.float32)
    ckpts, _, _ = pallas_scan.forward_llh_ckpt_pass(
        llh_tm, trans, iv, mask, interpret=True
    )
    rows = jnp.arange(n_units, dtype=jnp.int32) * spu + spu - 1
    cols = jnp.arange(n_units, dtype=jnp.int32) * spu
    sel_r = jax.nn.one_hot(rows, s, dtype=jnp.float32).T
    sel_c = jax.nn.one_hot(cols, s, dtype=jnp.float32).T
    g_ref, xi_ref = pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, ckpts, trans, fv, mask, sel_r, sel_c, interpret=True,
    )
    xi, emis_acc, counts, gamma0 = pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, ckpts, trans, fv, mask, sel_r, sel_c, interpret=True,
        stats_tm=stats_tm,
    )
    acc_ref = jnp.einsum("tbs,tbp->sp", g_ref, stats_tm,
                         precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi_ref),
                               rtol=1e-5, atol=1e-6, err_msg="xi")
    np.testing.assert_allclose(np.asarray(emis_acc), np.asarray(acc_ref),
                               rtol=1e-4, atol=1e-5, err_msg="acc")
    np.testing.assert_allclose(
        np.asarray(counts), np.asarray(g_ref.sum((0, 1))),
        rtol=1e-4, atol=1e-5, err_msg="counts",
    )
    np.testing.assert_allclose(
        np.asarray(gamma0), np.asarray(g_ref[0]),
        rtol=1e-5, atol=1e-6, err_msg="gamma0",
    )


def test_forward_stats_ckpt_grad_flows(rng, monkeypatch):
    """∂log Z/∂stats through the custom_vjp of forward_stats_ckpt
    matches the all-jnp composition (SVAE gradient path)."""
    import functools

    monkeypatch.setattr(
        pallas_scan, "forward_llh_ckpt_pass",
        functools.partial(pallas_scan.forward_llh_ckpt_pass,
                          interpret=True),
    )
    b, t_len, s, p_dim = 2, 11, 4, 3
    lt, _, lf = random_hmm_params(rng, s, dtype=np.float32)
    stats = jnp.asarray(rng.normal(size=(t_len, b, p_dim)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(p_dim, s)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(s,)).astype(np.float32))
    mask = jnp.asarray(
        (np.arange(t_len)[None] < np.array([[t_len], [6]])).astype(np.float32)
    )
    trans = jnp.exp(jnp.asarray(lt))
    iv = jnp.full((b, s), 1.0 / s, jnp.float32)
    fv = jnp.broadcast_to(jnp.exp(jnp.asarray(lf)), (b, s)).astype(jnp.float32)

    def logz_pallas(st):
        ck, last, zb = semiring_scan.forward_stats_ckpt(
            st, w, bias, trans, iv, mask
        )
        return (zb + jnp.log((last * fv).sum(-1))).sum()

    def logz_ref(st):
        ck, last, zb = semiring_scan._fwd_stats_ckpt_reference(
            st, w, bias, trans, iv, mask
        )
        return (zb + jnp.log((last * fv).sum(-1))).sum()

    g_pal = jax.grad(logz_pallas)(stats)
    g_ref = jax.grad(logz_ref)(stats)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_batch_chunked_ckpt_matches_unchunked(rng):
    """batch_chunks > 1 (independent interleaved batch sub-chains) ==
    the unchunked ckpt kernels.  The chain ops are all row-wise, so the
    forward checkpoints / log Z / γ must be bit-identical; ξ and the
    fused accumulators sum per-chunk contributions (reduction-order
    changes only)."""
    b, t_len, n_units, spu, p_dim = 32, 21, 4, 3, 7
    s = n_units * spu
    lt, _, lf = random_hmm_params(rng, s, dtype=np.float32)
    llh = (rng.normal(size=(b, t_len, s)) * 2).astype(np.float32)
    stats = rng.normal(size=(b, t_len, p_dim)).astype(np.float32)
    lengths = rng.integers(1, t_len + 1, size=b)
    lengths[0] = t_len
    mask = jnp.asarray(
        (np.arange(t_len)[None] < lengths[:, None]).astype(np.float32))
    llh_tm = jnp.swapaxes(jnp.asarray(llh), 0, 1)
    stats_tm = jnp.swapaxes(jnp.asarray(stats), 0, 1)
    trans = jnp.exp(jnp.asarray(lt))
    iv = jnp.full((b, s), 1.0 / s, jnp.float32)
    fv = jnp.broadcast_to(jnp.exp(jnp.asarray(lf)), (b, s)).astype(jnp.float32)
    rows = jnp.arange(n_units, dtype=jnp.int32) * spu + spu - 1
    cols = jnp.arange(n_units, dtype=jnp.int32) * spu
    sel_r = jax.nn.one_hot(rows, s, dtype=jnp.float32).T
    sel_c = jax.nn.one_hot(cols, s, dtype=jnp.float32).T

    c_ref, last_ref, z_ref = pallas_scan.forward_llh_ckpt_pass(
        llh_tm, trans, iv, mask, interpret=True)
    g_ref, xi_ref = pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, c_ref, trans, fv, mask, sel_r, sel_c, interpret=True)
    xi_a_ref, acc_ref, cnt_ref, g0_ref = pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, c_ref, trans, fv, mask, sel_r, sel_c, interpret=True,
        stats_tm=stats_tm)

    for chunks in (2, 4):
        c, last, z = pallas_scan.forward_llh_ckpt_pass(
            llh_tm, trans, iv, mask, interpret=True, batch_chunks=chunks)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))
        np.testing.assert_array_equal(np.asarray(last), np.asarray(last_ref))
        np.testing.assert_array_equal(np.asarray(z), np.asarray(z_ref))
        g, xi = pallas_scan.phone_loop_estep_ckpt_pass(
            llh_tm, c, trans, fv, mask, sel_r, sel_c, interpret=True,
            batch_chunks=chunks)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi_ref),
                                   rtol=1e-5, atol=1e-6)
        xi_a, acc, cnt, g0 = pallas_scan.phone_loop_estep_ckpt_pass(
            llh_tm, c, trans, fv, mask, sel_r, sel_c, interpret=True,
            stats_tm=stats_tm, batch_chunks=chunks)
        np.testing.assert_allclose(np.asarray(xi_a), np.asarray(xi_a_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cnt), np.asarray(cnt_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(g0), np.asarray(g0_ref))

    # non-dividing / non-sublane-aligned chunk counts fall back cleanly
    c, last, z = pallas_scan.forward_llh_ckpt_pass(
        llh_tm, trans, iv, mask, interpret=True, batch_chunks=3)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z_ref))


def test_lane_major_ckpt_matches_batch_major(rng):
    """Lane-major (S, B) ckpt kernel pair == the batch-major kernels
    with every per-frame array transposed (identical per-row
    arithmetic; ξ differs only in float summation order)."""
    b, t_len, n_units, spu = 16, 21, 4, 3
    s = n_units * spu
    ids = np.arange(s)
    a_self = np.full(s, 0.6, np.float32)
    a_adv = np.where(ids % spu != spu - 1, 0.4, 0.0).astype(np.float32)
    exit_v = np.zeros(s, np.float32)
    exit_v[ids % spu == spu - 1] = 0.2
    w_v = np.zeros(s, np.float32)
    w_raw = rng.random(n_units).astype(np.float32)
    w_v[ids % spu == 0] = w_raw / w_raw.sum()
    bands = tuple(jnp.asarray(v) for v in (a_self, a_adv, exit_v, w_v))

    llh = (rng.normal(size=(b, t_len, s)) * 2).astype(np.float32)
    lengths = rng.integers(1, t_len + 1, size=b)
    lengths[0] = t_len
    mask = jnp.asarray(
        (np.arange(t_len)[None] < lengths[:, None]).astype(np.float32))
    llh_tm = jnp.swapaxes(jnp.asarray(llh), 0, 1)      # (T, B, S)
    llh_lm = jnp.swapaxes(llh_tm, 1, 2)                # (T, S, B)
    iv = jnp.full((b, s), 1.0 / s, jnp.float32)
    fv = jnp.broadcast_to(jnp.asarray(exit_v), (b, s)).astype(jnp.float32)
    rows = jnp.arange(n_units, dtype=jnp.int32) * spu + spu - 1
    cols = jnp.arange(n_units, dtype=jnp.int32) * spu
    sel_r = jax.nn.one_hot(rows, s, dtype=jnp.float32).T   # (S, U)
    sel_c = jax.nn.one_hot(cols, s, dtype=jnp.float32).T

    c_ref, last_ref, z_ref = pallas_scan.forward_llh_ckpt_pass(
        llh_tm, None, iv, mask, interpret=True, bands=bands)
    g_ref, xi_ref = pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, c_ref, None, fv, mask, sel_r, sel_c, interpret=True,
        bands=bands)

    c, last, z = pallas_scan.forward_llh_ckpt_pass_lm(
        llh_lm, bands, iv.T, mask, interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(c, 1, 2)), np.asarray(c_ref),
        rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(last.T), np.asarray(last_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-6)
    g, xi = pallas_scan.phone_loop_estep_ckpt_pass_lm(
        llh_lm, c, bands, fv.T, mask, sel_r.T, sel_c.T, interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(g, 1, 2)), np.asarray(g_ref),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi_ref),
                               rtol=1e-4, atol=1e-5)

    # the lm passes accept batch_chunks for signature parity but ignore
    # it (Mosaic rejects lane-chunked sublane broadcasts on real TPUs,
    # and chunking measured slower anyway — see the kernel docstring):
    # outputs must be bit-identical with the knob set
    c2, last2, z2 = pallas_scan.forward_llh_ckpt_pass_lm(
        llh_lm, bands, iv.T, mask, interpret=True, batch_chunks=2)
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c))
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(z))


def test_lane_major_dense_full_xi_matches_batch_major(rng):
    """Dense lane-major kernels (general shared-graph HMM: (S, S)
    transitions, full-ξ identity selections) == the batch-major
    kernels transposed."""
    b, t_len, s = 16, 21, 6
    lt, _, lf = random_hmm_params(rng, s, dtype=np.float32)
    llh = (rng.normal(size=(b, t_len, s)) * 2).astype(np.float32)
    lengths = rng.integers(1, t_len + 1, size=b)
    lengths[0] = t_len
    mask = jnp.asarray(
        (np.arange(t_len)[None] < lengths[:, None]).astype(np.float32))
    llh_tm = jnp.swapaxes(jnp.asarray(llh), 0, 1)
    llh_lm = jnp.swapaxes(llh_tm, 1, 2)
    trans = jnp.exp(jnp.asarray(lt))
    iv = jnp.full((b, s), 1.0 / s, jnp.float32)
    fv = jnp.broadcast_to(jnp.exp(jnp.asarray(lf)), (b, s)).astype(jnp.float32)

    c_ref, last_ref, z_ref = pallas_scan.forward_llh_ckpt_pass(
        llh_tm, trans, iv, mask, interpret=True)
    g_ref, xi_ref = pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, c_ref, trans, fv, mask, None, None, interpret=True)

    c, last, z = pallas_scan.forward_llh_ckpt_pass_lm(
        llh_lm, None, iv.T, mask, interpret=True, trans=trans)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(c, 1, 2)), np.asarray(c_ref),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(last.T), np.asarray(last_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    g, xi = pallas_scan.phone_loop_estep_ckpt_pass_lm(
        llh_lm, c, None, fv.T, mask, None, None, interpret=True,
        trans=trans)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(g, 1, 2)), np.asarray(g_ref),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi_ref),
                               rtol=1e-4, atol=1e-5)


def test_lane_major_ignores_batch_chunks(rng):
    """The lm passes accept ``batch_chunks`` but ignore it (no
    lane-chunked kernel variant exists — Mosaic layout limit plus a
    measured on-chip loss; see _make_fwd_llh_ckpt_kernel_lm): outputs
    with the knob set must be BIT-identical to the unchunked run."""
    b, t_len, n_units, spu = 256, 9, 2, 3
    s = n_units * spu
    ids = np.arange(s)
    a_self = np.full(s, 0.6, np.float32)
    a_adv = np.where(ids % spu != spu - 1, 0.4, 0.0).astype(np.float32)
    exit_v = np.zeros(s, np.float32)
    exit_v[ids % spu == spu - 1] = 0.2
    w_v = np.zeros(s, np.float32)
    w_v[ids % spu == 0] = 1.0 / n_units
    bands = tuple(jnp.asarray(v) for v in (a_self, a_adv, exit_v, w_v))
    llh = (rng.normal(size=(b, t_len, s)) * 2).astype(np.float32)
    lengths = rng.integers(1, t_len + 1, size=b)
    lengths[0] = t_len
    mask = jnp.asarray(
        (np.arange(t_len)[None] < lengths[:, None]).astype(np.float32))
    llh_lm = jnp.swapaxes(jnp.swapaxes(jnp.asarray(llh), 0, 1), 1, 2)
    iv = jnp.full((s, b), 1.0 / s, jnp.float32)
    fv = jnp.broadcast_to(jnp.asarray(exit_v)[:, None], (s, b)).astype(
        jnp.float32)
    rows = jnp.arange(n_units, dtype=jnp.int32) * spu + spu - 1
    cols = jnp.arange(n_units, dtype=jnp.int32) * spu
    sel_r_t = jax.nn.one_hot(rows, s, dtype=jnp.float32)
    sel_c_t = jax.nn.one_hot(cols, s, dtype=jnp.float32)

    c1, last1, z1 = pallas_scan.forward_llh_ckpt_pass_lm(
        llh_lm, bands, iv, mask, interpret=True)
    g1, xi1 = pallas_scan.phone_loop_estep_ckpt_pass_lm(
        llh_lm, c1, bands, fv, mask, sel_r_t, sel_c_t, interpret=True)
    c2, last2, z2 = pallas_scan.forward_llh_ckpt_pass_lm(
        llh_lm, bands, iv, mask, interpret=True, batch_chunks=2)
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(last2), np.asarray(last1))
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(z1))
    g2, xi2 = pallas_scan.phone_loop_estep_ckpt_pass_lm(
        llh_lm, c2, bands, fv, mask, sel_r_t, sel_c_t, interpret=True,
        batch_chunks=2)
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(g1))
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi1),
                               rtol=1e-5, atol=1e-6)


def test_lane_major_acc_matches_gamma_variant(rng):
    """The accumulating lane-major E-step (in-VMEM γᵀ@stats, no γ
    output) reproduces the γ-emitting kernel's reductions: acc2 ==
    einsum(γ, stats), counts == Σγ, γ0 == γ[0], ξ identical."""
    b, t_len, n_units, spu, p_dim = 16, 21, 2, 3, 5
    s = n_units * spu
    ids = np.arange(s)
    a_self = np.full(s, 0.6, np.float32)
    a_adv = np.where(ids % spu != spu - 1, 0.4, 0.0).astype(np.float32)
    exit_v = np.zeros(s, np.float32)
    exit_v[ids % spu == spu - 1] = 0.2
    w_v = np.zeros(s, np.float32)
    w_v[ids % spu == 0] = 1.0 / n_units
    bands = tuple(jnp.asarray(v) for v in (a_self, a_adv, exit_v, w_v))
    llh = (rng.normal(size=(b, t_len, s)) * 2).astype(np.float32)
    lengths = rng.integers(1, t_len + 1, size=b)
    lengths[0] = t_len
    mask = jnp.asarray(
        (np.arange(t_len)[None] < lengths[:, None]).astype(np.float32))
    llh_lm = jnp.swapaxes(jnp.swapaxes(jnp.asarray(llh), 0, 1), 1, 2)
    stats_lm = jnp.asarray(
        rng.normal(size=(t_len, p_dim, b)).astype(np.float32))
    iv = jnp.full((s, b), 1.0 / s, jnp.float32)
    fv = jnp.broadcast_to(jnp.asarray(exit_v)[:, None], (s, b)).astype(
        jnp.float32)
    rows = jnp.arange(n_units, dtype=jnp.int32) * spu + spu - 1
    cols = jnp.arange(n_units, dtype=jnp.int32) * spu
    sel_r_t = jax.nn.one_hot(rows, s, dtype=jnp.float32)
    sel_c_t = jax.nn.one_hot(cols, s, dtype=jnp.float32)

    ckpts, _, _ = pallas_scan.forward_llh_ckpt_pass_lm(
        llh_lm, bands, iv, mask, interpret=True)
    gamma, xi_ref = pallas_scan.phone_loop_estep_ckpt_pass_lm(
        llh_lm, ckpts, bands, fv, mask, sel_r_t, sel_c_t, interpret=True)
    acc_ref = jnp.einsum("tsb,tpb->sp", gamma, stats_lm,
                         precision=jax.lax.Precision.HIGHEST)
    counts_ref = gamma.sum((0, 2))

    acc2, counts, gamma0, xi = pallas_scan.phone_loop_estep_ckpt_acc_lm(
        llh_lm, ckpts, bands, fv, mask, sel_r_t, sel_c_t, stats_lm,
        interpret=True)
    np.testing.assert_allclose(np.asarray(acc2), np.asarray(acc_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(counts), np.asarray(counts_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(gamma0), np.asarray(gamma[0]))
    np.testing.assert_array_equal(np.asarray(xi), np.asarray(xi_ref))


def test_lane_major_fuse_ellh_matches_llh_variant(rng):
    """The stats-streaming (fused-ELLH) lane-major kernels — forward
    with w/bias, accumulating E-step computing llh in VMEM — match the
    llh-streaming variants fed the same affine llh."""
    b, t_len, n_units, spu, d = 16, 21, 2, 3, 4
    s = n_units * spu
    p_dim = 2 * d
    ids = np.arange(s)
    a_self = np.full(s, 0.6, np.float32)
    a_adv = np.where(ids % spu != spu - 1, 0.4, 0.0).astype(np.float32)
    exit_v = np.zeros(s, np.float32)
    exit_v[ids % spu == spu - 1] = 0.2
    w_v = np.zeros(s, np.float32)
    w_v[ids % spu == 0] = 1.0 / n_units
    bands = tuple(jnp.asarray(v) for v in (a_self, a_adv, exit_v, w_v))
    stats_lm = jnp.asarray(
        rng.normal(size=(t_len, p_dim, b)).astype(np.float32))
    w_mat = jnp.asarray(rng.normal(size=(s, p_dim)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(s,)).astype(np.float32))
    llh_lm = jnp.einsum("tpb,sp->tsb", stats_lm, w_mat,
                        precision=jax.lax.Precision.HIGHEST) \
        + bias[None, :, None]
    lengths = rng.integers(1, t_len + 1, size=b)
    lengths[0] = t_len
    mask = jnp.asarray(
        (np.arange(t_len)[None] < lengths[:, None]).astype(np.float32))
    iv = jnp.full((s, b), 1.0 / s, jnp.float32)
    fv = jnp.broadcast_to(jnp.asarray(exit_v)[:, None], (s, b)).astype(
        jnp.float32)
    rows = jnp.arange(n_units, dtype=jnp.int32) * spu + spu - 1
    cols = jnp.arange(n_units, dtype=jnp.int32) * spu
    sel_r_t = jax.nn.one_hot(rows, s, dtype=jnp.float32)
    sel_c_t = jax.nn.one_hot(cols, s, dtype=jnp.float32)

    c1, last1, z1 = pallas_scan.forward_llh_ckpt_pass_lm(
        llh_lm, bands, iv, mask, interpret=True)
    c2, last2, z2 = pallas_scan.forward_llh_ckpt_pass_lm(
        stats_lm, bands, iv, mask, interpret=True, w=w_mat, bias=bias)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(last2), np.asarray(last1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1),
                               rtol=1e-5, atol=1e-5)

    a1, n1, g1, xi1 = pallas_scan.phone_loop_estep_ckpt_acc_lm(
        llh_lm, c1, bands, fv, mask, sel_r_t, sel_c_t, stats_lm,
        interpret=True)
    a2, n2, g2, xi2 = pallas_scan.phone_loop_estep_ckpt_acc_lm(
        None, c2, bands, fv, mask, sel_r_t, sel_c_t, stats_lm,
        interpret=True, w=w_mat, bias=bias)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n2), np.asarray(n1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi1),
                               rtol=1e-4, atol=1e-5)


def test_stored_alpha_bit_matches_ckpt_route(rng):
    """STORE_ALPHA route (forward emits the α̂ trajectory + normalizers;
    the accumulating kernel skips its serial forward recompute) is
    BIT-identical to the checkpoint route: same log Z / last, block
    checkpoints are a slice of the stored trajectory, and every
    accumulate output (acc2/counts/γ0/ξ) matches exactly — the stored
    values are the recompute's values, read instead of rebuilt."""
    b, t_len, n_units, spu, d = 16, 37, 2, 3, 4
    s = n_units * spu
    p_dim = 2 * d
    ids = np.arange(s)
    a_self = np.full(s, 0.6, np.float32)
    a_adv = np.where(ids % spu != spu - 1, 0.4, 0.0).astype(np.float32)
    exit_v = np.zeros(s, np.float32)
    exit_v[ids % spu == spu - 1] = 0.2
    w_v = np.zeros(s, np.float32)
    w_v[ids % spu == 0] = 1.0 / n_units
    bands = tuple(jnp.asarray(v) for v in (a_self, a_adv, exit_v, w_v))
    stats_lm = jnp.asarray(
        rng.normal(size=(t_len, p_dim, b)).astype(np.float32))
    w_mat = jnp.asarray(rng.normal(size=(s, p_dim)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(s,)).astype(np.float32))
    lengths = rng.integers(1, t_len + 1, size=b)
    lengths[0] = t_len
    lengths[1] = 0
    mask = jnp.asarray(
        (np.arange(t_len)[None] < lengths[:, None]).astype(np.float32))
    iv = jnp.full((s, b), 1.0 / s, jnp.float32)
    fv = jnp.broadcast_to(jnp.asarray(exit_v)[:, None], (s, b)).astype(
        jnp.float32)
    rows = jnp.arange(n_units, dtype=jnp.int32) * spu + spu - 1
    cols = jnp.arange(n_units, dtype=jnp.int32) * spu
    sel_r_t = jax.nn.one_hot(rows, s, dtype=jnp.float32)
    sel_c_t = jax.nn.one_hot(cols, s, dtype=jnp.float32)

    ck, last1, z1 = pallas_scan.forward_llh_ckpt_pass_lm(
        stats_lm, bands, iv, mask, interpret=True, w=w_mat, bias=bias)
    al, nm, last2, z2 = pallas_scan.forward_llh_ckpt_pass_lm(
        stats_lm, bands, iv, mask, interpret=True, w=w_mat, bias=bias,
        store_alpha=True)
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(z1))
    np.testing.assert_array_equal(np.asarray(last2), np.asarray(last1))
    k = pallas_scan._steps_per_block(b, s)
    ck2 = jnp.concatenate([iv[None], al[k - 1 :: k][:-1]], axis=0)
    np.testing.assert_array_equal(np.asarray(ck2), np.asarray(ck))

    o_ck = pallas_scan.phone_loop_estep_ckpt_acc_lm(
        None, ck, bands, fv, mask, sel_r_t, sel_c_t, stats_lm,
        interpret=True, w=w_mat, bias=bias)
    o_al = pallas_scan.phone_loop_estep_ckpt_acc_lm(
        None, None, bands, fv, mask, sel_r_t, sel_c_t, stats_lm,
        interpret=True, w=w_mat, bias=bias, alphas=al, norms=nm)
    for x, y in zip(o_ck, o_al):
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_stored_alpha_logz_grads_match_ckpt_route(rng, monkeypatch):
    """phone_loop_logz_stats_alpha_lm: value and Fisher-identity
    gradients (∂/∂stats, ∂/∂W, ∂/∂bias) are bit-equal to the ckpt
    wrapper's — the backward rebuilds block checkpoints by slicing the
    stored trajectory."""
    monkeypatch.setattr(pallas_scan, "FORCE_INTERPRET", True)
    b, t_len, s, p_dim = 8, 21, 6, 5
    stats_lm = jnp.asarray(
        rng.normal(size=(t_len, p_dim, b)).astype(np.float32))
    w_mat = jnp.asarray(
        (rng.normal(size=(s, p_dim)) * 0.3).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(s,)).astype(np.float32))
    a_self = jnp.asarray(rng.uniform(0.3, 0.9, s).astype(np.float32))
    a_adv = jnp.asarray(rng.uniform(0.05, 0.4, s).astype(np.float32))
    exit_v = jnp.asarray(
        (rng.uniform(size=s) < 0.5).astype(np.float32) * 0.2)
    w_v = jnp.asarray(rng.uniform(0.0, 0.2, s).astype(np.float32))
    bands = (a_self, a_adv, exit_v, w_v)
    iv = jnp.asarray(rng.uniform(0.1, 1.0, (s, b)).astype(np.float32))
    fv = jnp.asarray(rng.uniform(0.1, 1.0, (s, b)).astype(np.float32))
    lengths = rng.integers(3, t_len + 1, size=b)
    lengths[0] = t_len
    mask = jnp.asarray(
        (np.arange(t_len)[None] < lengths[:, None]).astype(np.float32))
    trans = jnp.eye(s, dtype=jnp.float32)
    ct = jnp.arange(1.0, b + 1)

    def f_ck(st, ww, bb):
        lz, _ = semiring_scan.phone_loop_logz_stats_lm(
            st, bands, ww, bb, trans, iv, fv, mask)
        return (lz * ct).sum()

    def f_al(st, ww, bb):
        lz, _, _ = semiring_scan.phone_loop_logz_stats_alpha_lm(
            st, bands, ww, bb, trans, iv, fv, mask)
        return (lz * ct).sum()

    v1, g1 = jax.value_and_grad(f_ck, argnums=(0, 1, 2))(
        stats_lm, w_mat, bias)
    v2, g2 = jax.value_and_grad(f_al, argnums=(0, 1, 2))(
        stats_lm, w_mat, bias)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1))
    for a, b_ in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(b_), np.asarray(a))


def test_stored_alpha_model_trajectories_identical(rng, monkeypatch):
    """Model-level STORE_ALPHA gate: PhoneLoop and (dense-transition)
    HMM VB trajectories are bit-identical with the stored-α̂ route on
    vs off — the stored forward values ARE the recompute's values.
    (On-chip the trade measured a WASH at the bench shape — extra α̂
    HBM traffic repays the removed serial recompute, see the
    STORE_ALPHA comment — so it defaults off; this test keeps the
    env-activatable path honest.)"""
    import beer_tpu
    from beer_tpu.models import graph as graph_mod
    from beer_tpu.models.hmm import HMM
    from beer_tpu.models.phoneloop import PhoneLoop
    from beer_tpu.vbi import vb_step

    monkeypatch.setattr(pallas_scan, "FORCE_INTERPRET", True)
    b, t_len, d = 8, 27, 4
    x = jnp.asarray(rng.normal(size=(b, t_len, d)).astype(np.float32))
    lengths = rng.integers(4, t_len + 1, size=b)
    lengths[0] = t_len
    mask = jnp.asarray(
        (np.arange(t_len)[None] < lengths[:, None]).astype(np.float32))

    def trajectories(store):
        monkeypatch.setattr(pallas_scan, "STORE_ALPHA", store)
        nset = beer_tpu.NormalSet.create(
            jnp.zeros(d), jnp.ones(d), size=6, cov_type="diagonal",
            noise_std=0.5, key=jax.random.PRNGKey(1))
        pl_model = PhoneLoop.create(2, 3, nset)
        hmm = HMM.create(graph_mod.ergodic(6).compile(), nset)
        out = []
        for model in (pl_model, hmm):
            es = []
            for _ in range(3):
                e, model = vb_step(model, x, mask=mask)
                es.append(float(e))
            out.append(es)
        return out

    off = trajectories("0")
    on = trajectories("1")
    assert on == off


def test_dot1_stacked_matches_three_dot(rng, monkeypatch):
    """BEER_DOT1 stacked (K=3S) propagate ≡ the default 3-dot bf16_3x
    form in both orientations (the stacked route is non-default after
    the end-to-end wash measurement — keep it correct for future
    shapes)."""
    for s, b in ((18, 64), (32, 128), (152, 256)):
        w = jnp.asarray(rng.normal(size=(s, s)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(b, s)).astype(np.float32))
        p = jnp.asarray(rng.normal(size=(s, b)).astype(np.float32))
        w_hi, w_lo = pallas_scan._split_bf16(w)

        monkeypatch.setattr(pallas_scan, "DOT1", False)
        y3 = pallas_scan._dot3(x, w_hi, w_lo)
        z3 = pallas_scan._dot3_lm(w_hi, w_lo, p)
        monkeypatch.setattr(pallas_scan, "DOT1", True)
        y1 = pallas_scan._dot3(x, w_hi, w_lo)
        z1 = pallas_scan._dot3_lm(w_hi, w_lo, p)

        # identical products, one accumulator: tolerance covers only
        # the f32 summation-order difference
        np.testing.assert_allclose(y1, y3, rtol=2e-6, atol=2e-5)
        np.testing.assert_allclose(z1, z3, rtol=2e-6, atol=2e-5)
