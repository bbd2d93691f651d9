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
