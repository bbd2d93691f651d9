"""Structured VAE with a GMM latent prior (config 5).

Run: python examples/svae_demo.py
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

import beer_tpu
from beer_tpu.models.vae import VAE, make_vae_train_step


def main():
    rng = np.random.default_rng(0)
    z = np.concatenate(
        [rng.normal(size=(256, 2)) + [-3, 0], rng.normal(size=(256, 2)) + [3, 0]]
    )
    w = rng.normal(size=(2, 16))
    data = (z @ w + 0.1 * rng.normal(size=(512, 16))).astype(np.float32)

    nset = beer_tpu.NormalSet.create(
        jnp.zeros(2), 4.0 * jnp.eye(2), size=4, cov_type="full",
        noise_std=1.0, key=jax.random.PRNGKey(3),
    )
    vae = VAE.create(
        obs_dim=16, latent_dim=2,
        latent_model=beer_tpu.Mixture.create(nset),
        hidden=(64, 64), key=jax.random.PRNGKey(0),
    )
    tx = optax.adam(3e-3)
    opt_state = tx.init(vae.nnet_params)
    step = make_vae_train_step(tx)
    key = jax.random.PRNGKey(7)
    x = jnp.asarray(data)
    for it in range(300):
        key, sub = jax.random.split(key)
        elbo, vae, opt_state = step(vae, opt_state, x, sub)
        if it % 50 == 0:
            print(f"iter {it:4d}  elbo/frame = {float(elbo) / len(data):.3f}")

    q = vae.posteriors(x)
    resps = vae.latent_model.posteriors(q["mean"])
    print("\nGMM prior component usage:", np.asarray(resps).mean(0).round(3))


if __name__ == "__main__":
    main()
