"""Bayesian GMM on 2-D synthetic data (reference notebook demo, config 1).

Run: python examples/gmm_demo.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu.vbi import vb_step


def main():
    rng = np.random.default_rng(0)
    means = np.array([[-4.0, 0.0], [4.0, 0.0], [0.0, 5.0]])
    data = np.concatenate(
        [rng.multivariate_normal(m, np.eye(2) * 0.6, size=500) for m in means]
    ).astype(np.float32)

    nset = beer_tpu.NormalSet.create(
        jnp.asarray(data.mean(0)),
        jnp.asarray(np.cov(data.T).astype(np.float32)),
        size=6,
        cov_type="full",
        noise_std=1.0,
        key=jax.random.PRNGKey(3),
    )
    gmm = beer_tpu.Mixture.create(nset)
    x = jnp.asarray(data)
    step = jax.jit(vb_step)
    for epoch in range(30):
        elbo, gmm = step(gmm, x)
        if epoch % 5 == 0:
            print(f"epoch {epoch:3d}  elbo/frame = {float(elbo) / len(data):.4f}")

    print("\nlearned weights:", np.asarray(gmm.weights()).round(3))
    print("learned means:\n", np.asarray(gmm.modelset.means()).round(2))


if __name__ == "__main__":
    main()
