"""Phone-loop acoustic unit discovery on synthetic data (config 4).

Run: python examples/aud_demo.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu.models.phoneloop import PhoneLoop
from beer_tpu.vbi import vb_step


def main():
    rng = np.random.default_rng(3)
    n_seq, t_len, d, n_phones = 32, 100, 4, 4
    centers = rng.normal(size=(n_phones, d)) * 4.0
    data = np.zeros((n_seq, t_len, d), np.float32)
    mask = np.zeros((n_seq, t_len), np.float32)
    for i in range(n_seq):
        t = 0
        while t < t_len - 4:
            ph = int(rng.integers(n_phones))
            dwell = min(int(rng.integers(4, 9)), t_len - t)
            data[i, t : t + dwell] = centers[ph] + 0.4 * rng.normal(size=(dwell, d))
            t += dwell
        mask[i, :t] = 1

    flat = data.reshape(-1, d)[mask.reshape(-1) > 0]
    nset = beer_tpu.NormalSet.create(
        jnp.asarray(flat.mean(0)),
        jnp.asarray(np.cov(flat.T).astype(np.float32)),
        size=10 * 3,
        cov_type="full",
        noise_std=2.0,
        key=jax.random.PRNGKey(11),
    )
    loop = PhoneLoop.create(10, 3, nset, concentration=2.0)
    x, m = jnp.asarray(data), jnp.asarray(mask)
    step = jax.jit(vb_step)
    for epoch in range(30):
        elbo, loop = step(loop, x, mask=m)
        if epoch % 5 == 0:
            print(f"epoch {epoch:3d}  elbo/frame = {float(elbo) / mask.sum():.4f}")

    units, _ = jax.jit(loop.decode_units)(x, m)
    print("\nunit prior weights:", np.asarray(loop.unit_prior.mean()).round(3))
    print("decoded units (utt 0):", np.asarray(units[0])[: int(mask[0].sum())])


if __name__ == "__main__":
    main()
