"""Pallas fused full-covariance kernels vs exact XLA fallbacks.

Runs in interpreter mode on the CPU test mesh (the compiled path is
exercised on the real chip by the verify drives / bench).
"""

import numpy as np
import jax
import jax.numpy as jnp

from beer_tpu import dists
from beer_tpu.dists import normallik
from beer_tpu.ops import stats_kernels


def make_inputs(rng, t=300, d=5, k=3, dtype=np.float32):
    x = rng.normal(size=(t, d)).astype(dtype)
    r = rng.dirichlet(np.ones(k), size=t).astype(dtype)
    fam = dists.NormalWishart(dim=d)
    nats = []
    for j in range(k):
        q = rng.normal(size=(d, d))
        w = (q @ q.T + d * np.eye(d)) / 20.0
        nats.append(fam.to_nat(jnp.asarray(rng.normal(size=d), dtype),
                               2.0, jnp.asarray(w, dtype), d + 2.0))
    e_stats = fam.expected_sufficient_statistics(jnp.stack(nats)).astype(dtype)
    return jnp.asarray(x), jnp.asarray(r), e_stats


def test_fused_ellh_matches_xla(rng):
    x, _, e_stats = make_inputs(rng)
    ours = stats_kernels.fused_ellh_full(x, e_stats, dim=5, interpret=True)
    oracle = stats_kernels.ellh_full_xla(x, e_stats, dim=5)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                               rtol=2e-5, atol=2e-5)


def test_ellh_xla_matches_stats_matmul(rng):
    """The no-materialization XLA path equals the (T,P)@(P,K) contraction."""
    x, _, e_stats = make_inputs(rng)
    direct = stats_kernels.ellh_full_xla(x, e_stats, dim=5)
    stats = normallik.suff_stats_full(x)
    via_stats = stats @ e_stats.T - 0.5 * 5 * np.log(2 * np.pi)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_stats),
                               rtol=2e-5, atol=2e-5)


def test_fused_accumulate_matches_xla(rng):
    x, r, _ = make_inputs(rng)
    ours = stats_kernels.fused_accumulate_full(x, r, interpret=True)
    oracle = stats_kernels.accumulate_full_xla(x, r)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                               rtol=2e-4, atol=2e-4)


def test_padding_correct(rng):
    """T not a multiple of the tile: padded frames must contribute zero."""
    x, r, e_stats = make_inputs(rng, t=stats_kernels.TILE_T + 17)
    ours = stats_kernels.fused_accumulate_full(x, r, interpret=True)
    oracle = stats_kernels.accumulate_full_xla(x, r)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                               rtol=2e-4, atol=2e-4)
    llh = stats_kernels.fused_ellh_full(x, e_stats, dim=5, interpret=True)
    assert llh.shape == (stats_kernels.TILE_T + 17, 3)


def test_fused_gmm_estep_matches_xla(rng):
    """Single-kernel E-step (llh + acc + counts) vs the exact jnp path,
    including a mask and a T that isn't a tile multiple."""
    t = stats_kernels.GMM_TILE_T + 33
    x, _, e_stats = make_inputs(rng, t=t)
    log_w = jnp.log(jnp.asarray(rng.dirichlet(np.ones(3)), jnp.float32))
    for mask in (None, jnp.asarray((rng.uniform(size=t) > 0.2), jnp.float32)):
        llh, acc, counts = stats_kernels.fused_gmm_estep(
            x, e_stats, log_w, dim=5, mask=mask, interpret=True)
        llh0, acc0, counts0 = stats_kernels.gmm_estep_xla(
            x, e_stats, log_w, dim=5, mask=mask)
        np.testing.assert_allclose(np.asarray(llh), np.asarray(llh0),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(acc), np.asarray(acc0),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(counts), np.asarray(counts0),
                                   rtol=2e-4, atol=2e-4)
