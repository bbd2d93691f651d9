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
