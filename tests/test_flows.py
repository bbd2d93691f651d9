"""Normalizing-flow blocks: log-det correctness vs autodiff Jacobians."""

import numpy as np
import jax
import jax.numpy as jnp

from beer_tpu import nnet
from beer_tpu.nnet.flows import (
    AffineAutoregressiveFlow,
    FlowStack,
    PlanarFlow,
    flow_rsample,
)


def _check_logdet(flow, d, rng, atol=1e-6):
    params = flow.init(jax.random.PRNGKey(0), jnp.zeros((1, d)))
    z = jnp.asarray(rng.normal(size=(4, d)))

    _, logdet = flow.apply(params, z)
    f_single = lambda zi: flow.apply(params, zi[None])[0][0]
    for i in range(4):
        jac = jax.jacfwd(f_single)(z[i])
        oracle = np.linalg.slogdet(np.asarray(jac))[1]
        np.testing.assert_allclose(float(logdet[i]), oracle, atol=atol)


def test_planar_logdet(rng):
    _check_logdet(PlanarFlow(3), 3, rng)


def test_iaf_logdet(rng):
    _check_logdet(AffineAutoregressiveFlow(4), 4, rng)


def test_iaf_autoregressive_property(rng):
    """Output d must not depend on inputs >= d."""
    flow = AffineAutoregressiveFlow(4)
    params = flow.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    z = jnp.asarray(rng.normal(size=(1, 4)))
    out1, _ = flow.apply(params, z)
    z2 = z.at[0, 3].add(10.0)  # perturb the last input
    out2, _ = flow.apply(params, z2)
    np.testing.assert_allclose(
        np.asarray(out1[0, :3]), np.asarray(out2[0, :3]), rtol=1e-6
    )


def test_stack_and_rsample(rng):
    stack = FlowStack(3, n_planar=2, n_iaf=1)
    params = stack.init(jax.random.PRNGKey(1), jnp.zeros((1, 3)))
    q = {"mean": jnp.zeros((5, 3)), "logvar": jnp.zeros((5, 3))}
    z, log_q = flow_rsample(stack, params, q, jax.random.PRNGKey(2), nsamples=2)
    assert z.shape == (2, 5, 3) and log_q.shape == (2, 5)
    assert np.isfinite(np.asarray(log_q)).all()
