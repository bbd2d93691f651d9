"""Sequence-parallel forward vs the single-device scan (8-dev CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from beer_tpu import parallel
from beer_tpu.ops import semiring_scan, seq_parallel
from tests.test_hmm import random_hmm_params


def test_time_sharded_forward_matches(rng):
    b, t_len, s = 3, 64, 5  # t divisible by 8 devices
    lt, li, lf = random_hmm_params(rng, s)
    llh = rng.normal(size=(b, t_len, s))
    lengths = np.array([64, 40, 21])
    mask = (np.arange(t_len)[None] < lengths[:, None]).astype(np.float64)

    mesh = parallel.make_mesh(axis_name="seq")
    fn = seq_parallel.make_sharded_forward(mesh)
    la_sh, lz_sh = fn(
        jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li), jnp.asarray(lf),
        jnp.asarray(mask),
    )

    la_ref, _ = semiring_scan.forward(
        jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li), jnp.asarray(mask)
    )
    fb = semiring_scan.forward_backward(
        jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li), jnp.asarray(lf),
        jnp.asarray(mask),
    )
    for i, ln in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(la_sh[i, :ln]), np.asarray(la_ref[i, :ln]), rtol=1e-8
        )
    np.testing.assert_allclose(np.asarray(lz_sh), np.asarray(fb.log_z), rtol=1e-8)
