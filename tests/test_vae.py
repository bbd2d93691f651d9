"""(S)VAE tests (BASELINE config 5).

The hybrid step (optax reparameterization + conjugate natural-gradient)
must raise the ELBO on synthetic data, with both a plain Normal latent
prior (classic VAE) and a GMM latent prior (structured VAE).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

import beer_tpu
from beer_tpu.models.vae import VAE, make_vae_train_step


def make_data(rng, n=256, d=8):
    """Two latent clusters pushed through a fixed random linear map."""
    z = np.concatenate(
        [rng.normal(size=(n // 2, 2)) + [-3, 0], rng.normal(size=(n // 2, 2)) + [3, 0]]
    )
    w = rng.normal(size=(2, d))
    return (z @ w + 0.1 * rng.normal(size=(n, d))).astype(np.float32)


def make_latent_prior(kind, key=0):
    mean, cov = jnp.zeros(2), 4.0 * jnp.eye(2)
    if kind == "normal":
        return beer_tpu.Normal.create(mean, cov, cov_type="full")
    nset = beer_tpu.NormalSet.create(
        mean, cov, size=4, cov_type="full", noise_std=1.0,
        key=jax.random.PRNGKey(key),
    )
    return beer_tpu.Mixture.create(nset)


@pytest.mark.parametrize("prior_kind", ["normal", "gmm"])
def test_elbo_improves(rng, prior_kind):
    data = make_data(rng)
    x = jnp.asarray(data)
    vae = VAE.create(
        obs_dim=data.shape[1], latent_dim=2,
        latent_model=make_latent_prior(prior_kind),
        hidden=(32, 32), nsamples=1, key=jax.random.PRNGKey(0),
    )
    tx = optax.adam(1e-3)
    opt_state = tx.init(vae.nnet_params)
    step = make_vae_train_step(tx)
    key = jax.random.PRNGKey(42)
    elbos = []
    for it in range(200):
        key, sub = jax.random.split(key)
        elbo, vae, opt_state = step(vae, opt_state, x, sub)
        elbos.append(float(elbo) / len(data))
    assert np.isfinite(elbos).all()
    first = np.mean(elbos[:10])
    last = np.mean(elbos[-10:])
    assert last > first + 1.0, f"ELBO did not improve: {first} -> {last}"


def test_svae_latent_clusters(rng):
    """With a GMM prior the aggregate posterior should use >1 component."""
    data = make_data(rng, n=256)
    x = jnp.asarray(data)
    vae = VAE.create(
        obs_dim=data.shape[1], latent_dim=2,
        latent_model=make_latent_prior("gmm", key=3),
        hidden=(32, 32), key=jax.random.PRNGKey(1),
    )
    tx = optax.adam(3e-3)
    opt_state = tx.init(vae.nnet_params)
    step = make_vae_train_step(tx)
    key = jax.random.PRNGKey(7)
    for _ in range(300):
        key, sub = jax.random.split(key)
        _, vae, opt_state = step(vae, opt_state, x, sub)
    q = vae.posteriors(x)
    resps = vae.latent_model.posteriors(q["mean"])
    usage = np.asarray(resps).mean(0)
    assert (usage > 0.1).sum() >= 2, f"only one active component: {usage}"


def test_bernoulli_output(rng):
    """VAE with Bernoulli decoder head on binarized data."""
    data = (make_data(rng) > 0).astype(np.float32)
    x = jnp.asarray(data)
    vae = VAE.create(
        obs_dim=data.shape[1], latent_dim=2,
        latent_model=make_latent_prior("normal"),
        hidden=(16,), output="bernoulli", key=jax.random.PRNGKey(2),
    )
    tx = optax.adam(3e-3)
    opt_state = tx.init(vae.nnet_params)
    step = make_vae_train_step(tx)
    key = jax.random.PRNGKey(0)
    elbos = []
    for _ in range(100):
        key, sub = jax.random.split(key)
        elbo, vae, opt_state = step(vae, opt_state, x, sub)
        elbos.append(float(elbo) / len(data))
    assert np.isfinite(elbos).all()
    assert np.mean(elbos[-10:]) > np.mean(elbos[:10])
