"""Component-wise timing of the phone-loop VB-EM epoch (bench shape).

Slope method through the axon tunnel (see docs/PERFORMANCE.md): each
component is chained ``inner`` times inside one jitted ``lax.scan``
(carry-perturbed against CSE), the final scalar is fetched once, and the
per-iteration cost is the slope between two inner counts — so the ~28 ms
tunnel fetch and dispatch overheads cancel.

Components (nested, so differences give the stage costs):

* llh      — sufficient stats + expected log-likelihood matmul
* infer    — llh + forward kernel + log Z
* estep    — infer + smoothing/ξ kernel + emission accumulation
* full     — estep + conjugate M-step + KL + ELBO assembly (vb_step)
* kl       — KL(q‖p) of all parameters alone
* estats   — E[T(θ)] of the emission posterior alone (digamma block)
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
from beer_tpu.models.phoneloop import PhoneLoop
from beer_tpu.vbi import vb_step, elbo_and_stats

B, T, D = 512, 500, 39
N_UNITS, SPP = 50, 3
S = N_UNITS * SPP


def make_model_and_data():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(B, T, D)).astype(np.float32)
    lengths = rng.integers(T // 2, T + 1, size=B)
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.ones(D), size=S, cov_type="diagonal",
        noise_std=0.5, key=jax.random.PRNGKey(1),
    )
    loop = PhoneLoop.create(N_UNITS, SPP, nset)
    return loop, jnp.asarray(data), jnp.asarray(mask)


def chain(body, inner):
    """jit a scan of `body(c, x, mask) -> c` with input perturbation."""

    @jax.jit
    def run(model, x, mask):
        def step(c, _):
            xp = x * (1.0 + c * 1e-30)
            return body(model, xp, mask), None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=inner)
        return c

    return run


def chain_model(body, inner):
    """Like chain, but threads the *model* through the scan (vb_step)."""

    @jax.jit
    def run(model, x, mask):
        def step(carry, _):
            model, c = carry
            xp = x * (1.0 + c * 1e-30)
            elbo, model = body(model, xp, mask)
            return (model, elbo * 1e-30), None

        (model, c), _ = jax.lax.scan(
            step, (model, jnp.float32(0.0)), None, length=inner
        )
        return c

    return run


def timeit(make, model, x, mask, n1, n2, outer):
    f1, f2 = make(n1), make(n2)
    float(f1(model, x, mask))  # compile
    float(f2(model, x, mask))

    def run(f):
        t0 = time.time()
        for _ in range(outer):
            float(f(model, x, mask))
        return (time.time() - t0) / outer

    t1, t2 = run(f1), run(f2)
    return (t2 - t1) / (n2 - n1)


def main():
    global T, B
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=T)
    ap.add_argument("--b", type=int, default=B,
                    help="batch size (VPU-occupancy B-sweep: chain "
                    "length is fixed by T, per-step arithmetic scales "
                    "with B — time ∝ B means throughput-bound)")
    ap.add_argument("--inner", type=int, nargs=2, default=[4, 16])
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--components", default="llh,infer,estep,full,kl,estats")
    # (fresh --t busts the stale sidechannel compile cache; see memory)
    args = ap.parse_args()
    T = args.t
    B = args.b
    n1, n2 = args.inner
    wanted = args.components.split(",")
    model, x, mask = make_model_and_data()
    frames = float(mask.sum())

    def body_llh(model, xp, mask):
        stats = model.sufficient_statistics(xp)
        stats_tm = jnp.swapaxes(stats, 0, 1)
        llh_tm = model.modelset.expected_log_likelihood(stats_tm)
        return llh_tm.sum() * 1e-30

    def body_infer(model, xp, mask):
        stats = model.sufficient_statistics(xp)
        log_z, cache = model.infer(stats, mask=mask)
        return (log_z.sum() + cache["ckpts"][-1].sum()) * 1e-30

    def body_estep(model, xp, mask):
        elbo, acc = elbo_and_stats(model, xp, mask=mask)
        tot = sum(jnp.sum(l) for l in jax.tree.leaves(acc))
        return (elbo + tot) * 1e-30

    def body_kl(model, xp, mask):
        return model.kl_div_posterior_prior() * (1e-30 + 0 * xp[0, 0, 0])

    def body_estats(model, xp, mask):
        p = model.modelset.means_precisions
        e = p.family.expected_sufficient_statistics(
            p.posterior * (1.0 + xp[0, 0, 0] * 1e-30)
        )
        return e.sum() * 1e-30

    bodies = {
        "llh": lambda n: chain(body_llh, n),
        "infer": lambda n: chain(body_infer, n),
        "estep": lambda n: chain(body_estep, n),
        "full": lambda n: chain_model(
            lambda m, xp, mk: vb_step(m, xp, mask=mk), n
        ),
        "kl": lambda n: chain(body_kl, n),
        "estats": lambda n: chain(body_estats, n),
    }
    out = {}
    for name in wanted:
        dt = timeit(bodies[name], model, x, mask, n1, n2, args.outer)
        out[name] = round(dt * 1e3, 3)  # ms
        print(f"{name}: {dt*1e3:.3f} ms/iter "
              f"({frames/dt/1e6:.1f}M frames/s)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
