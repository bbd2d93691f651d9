"""Component-wise timing of the GMM VB-EM epoch (bench config 1 shape).

Same slope harness as tools/profile_phoneloop.py (see
docs/PERFORMANCE.md): components chained inside one jitted scan,
carry-perturbed against CSE, per-iteration cost = slope between two
chain lengths so tunnel fetch/dispatch constants cancel.

Components (nested → differences give stage costs):

* ellh   — fused full-cov ELLH kernel alone ((N, D) → (N, K))
* infer  — ellh + E[log w] + logsumexp + responsibilities
* estep  — infer + fused accumulate (+ Dirichlet counts)
* full   — estep + conjugate M-step (NW update, cholesky) + KL + ELBO
* kl     — KL(q‖p) alone (the per-component NW Bregman block)
* estats — E[T(θ)] of the NW posterior alone (digamma/cholesky block)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu.vbi import vb_step, elbo_and_stats

B, T, D = 512, 500, 39
K = 64


def make_model_and_data():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(B * T, D)).astype(np.float32)
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.eye(D), size=K, cov_type="full",
        noise_std=0.5, key=jax.random.PRNGKey(2),
    )
    gmm = beer_tpu.Mixture.create(nset)
    return gmm, jnp.asarray(data)


def chain(body, inner):
    @jax.jit
    def run(model, x):
        def step(c, _):
            xp = x * (1.0 + c * 1e-30)
            return body(model, xp), None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=inner)
        return c

    return run


def chain_model(body, inner):
    @jax.jit
    def run(model, x):
        def step(carry, _):
            model, c = carry
            xp = x * (1.0 + c * 1e-30)
            elbo, model = body(model, xp)
            return (model, elbo * 1e-30), None

        (model, c), _ = jax.lax.scan(
            step, (model, jnp.float32(0.0)), None, length=inner
        )
        return c

    return run


def timeit(make, model, x, n1, n2, outer):
    f1, f2 = make(n1), make(n2)
    float(f1(model, x))
    float(f2(model, x))

    def run(f):
        t0 = time.time()
        for _ in range(outer):
            float(f(model, x))
        return (time.time() - t0) / outer

    t1, t2 = run(f1), run(f2)
    return (t2 - t1) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, nargs=2, default=[4, 16])
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--components", default="ellh,infer,estep,full,kl,estats")
    args = ap.parse_args()
    n1, n2 = args.inner
    wanted = args.components.split(",")
    model, x = make_model_and_data()
    frames = float(x.shape[0])
    print(f"fused full-cov path: {model.modelset.fused}", flush=True)

    def body_ellh(model, xp):
        stats = model.sufficient_statistics(xp)
        return model.modelset.expected_log_likelihood(stats).sum() * 1e-30

    def body_infer(model, xp):
        stats = model.sufficient_statistics(xp)
        llh, cache = model.infer(stats)
        return (llh.sum() + cache["resps"][0].sum()) * 1e-30

    def body_estep(model, xp):
        elbo, acc = elbo_and_stats(model, xp)
        tot = sum(jnp.sum(l) for l in jax.tree.leaves(acc))
        return (elbo + tot) * 1e-30

    def body_kl(model, xp):
        return model.kl_div_posterior_prior() * (1e-30 + 0 * xp[0, 0])

    def body_estats(model, xp):
        p = model.modelset.means_precisions
        e = p.family.expected_sufficient_statistics(
            p.posterior * (1.0 + xp[0, 0] * 1e-30)
        )
        return e.sum() * 1e-30

    bodies = {
        "ellh": lambda n: chain(body_ellh, n),
        "infer": lambda n: chain(body_infer, n),
        "estep": lambda n: chain(body_estep, n),
        "full": lambda n: chain_model(vb_step, n),
        "kl": lambda n: chain(body_kl, n),
        "estats": lambda n: chain(body_estats, n),
    }
    out = {}
    for name in wanted:
        dt = timeit(bodies[name], model, x, n1, n2, args.outer)
        out[name] = round(dt * 1e3, 3)
        print(f"{name}: {dt*1e3:.3f} ms/iter "
              f"({frames/dt/1e6:.1f}M frames/s)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
