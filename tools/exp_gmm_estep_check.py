"""On-chip check of stats_kernels.fused_gmm_estep vs f64 oracle + timing."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu.ops import stats_kernels

import argparse
_ap = argparse.ArgumentParser()
_ap.add_argument("--t", type=int, default=500)
B, T, D, K = 512, _ap.parse_args().t, 39, 64


def main():
    rng = np.random.default_rng(0)
    n = B * T
    x_np = rng.normal(size=(n, D)).astype(np.float32)

    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.eye(D), size=K, cov_type="full",
        noise_std=0.5, key=jax.random.PRNGKey(2))
    e_stats64 = np.asarray(
        nset.means_precisions.expected_sufficient_statistics(), np.float64)
    log_w = np.log(np.full(K, 1.0 / K))

    # f64 oracle
    xd = x_np.astype(np.float64)
    elam = e_stats64[:, : D * D].reshape(K, D, D)
    elin = e_stats64[:, D * D : D * D + D]
    const = (-0.5 * e_stats64[:, -2] + 0.5 * e_stats64[:, -1]
             - 0.5 * D * np.log(2 * np.pi) + log_w)
    quad = np.einsum("td,kde,te->tk", xd, elam, xd)
    joint = -0.5 * quad + xd @ elin.T + const
    m = joint.max(-1, keepdims=True)
    p = np.exp(joint - m)
    s = p.sum(-1, keepdims=True)
    llh64 = (m + np.log(s))[:, 0]
    r64 = p / s
    accxx = np.einsum("tk,td,te->kde", r64, xd, xd).reshape(K, D * D)
    c64 = r64.sum(0)
    acc64 = np.concatenate(
        [-0.5 * accxx, r64.T @ xd, -0.5 * c64[:, None], 0.5 * c64[:, None]], 1)

    x = jnp.asarray(x_np)
    e_stats = jnp.asarray(e_stats64.astype(np.float32))
    lw = jnp.asarray(log_w.astype(np.float32))

    f = jax.jit(lambda x: stats_kernels.fused_gmm_estep(x, e_stats, lw, D))
    llh, acc, counts = f(x)
    llh, acc, counts = map(np.asarray, (llh, acc, counts))
    print("err llh max:", np.abs(llh - llh64).max())
    print("err elbo/frame:", abs(llh.sum() - llh64.sum()) / n)
    print("err acc rel:", np.abs(acc - acc64).max() / np.abs(acc64).max())
    print("err counts rel:", np.abs(counts - c64).max() / c64.max())

    # timing via chained scan
    def harness(inner):
        @jax.jit
        def g(x):
            def step(c, _):
                xp = x * (1.0 + c * 1e-30)
                llh, acc, counts = stats_kernels.fused_gmm_estep(
                    xp, e_stats, lw, D)
                return (llh.sum() + acc.sum() + counts.sum()) * 1e-30, None
            c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=inner)
            return c
        return g

    f1, f2 = harness(4), harness(12)
    float(f1(x)); float(f2(x))

    def t(f):
        t0 = time.time()
        for _ in range(3):
            float(f(x))
        return (time.time() - t0) / 3

    dt = (t(f2) - t(f1)) / 8
    print(f"estep: {dt*1e3:.3f} ms ({n/dt/1e6:.1f}M frames/s)")


if __name__ == "__main__":
    main()
