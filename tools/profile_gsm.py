"""Component-wise timing of the H-SHMM subspace step (bench config 6).

Slope method through the axon tunnel (docs/PERFORMANCE.md): each
component is chained ``inner`` times inside one jitted ``lax.scan``
over per-step PRNG keys, the final scalar is fetched once, and the
per-iteration cost is the slope between two inner counts.

Components (nested, so differences give stage costs):

* rng    — key split + the three eps draws + reparameterization
           (``_sample_params``)
* fwd    — rng + unit_params affine map + links + expected-stats ll
           (the full ELBO, no grad)
* grad   — value_and_grad of the ELBO
* full   — grad + Adam update (the real train-scan step)
* full_eps — full with the reparameterization noise PRESAMPLED outside
           the scan.  Measured SLOWER than full on the v5e (47.0 vs
           39.3 µs/step): the slope method still pays the same
           threefry work (vmapped upfront, linear in nsteps) plus the
           HBM stream of the noise, so make_gsm_train_scan keeps
           in-loop sampling; the cheap lever is the rbg key impl
           (gsm.train_key), not moving the draw.

VERDICT r4 ask #6: find WHERE the 42 µs step goes before building
anything (0.136% MFU says the matmuls are not the story — they are
~3.1M MACs/step at this config).
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
import optax

from beer_tpu.models.gsm import HierarchicalGSM

UPL, NLANG, SPU, EMBED, LANGD, D = 50, 3, 3, 8, 2, 39
NSAMPLES = 4


def make_model_and_stats():
    u = UPL * NLANG
    unit_lang = sum(([i] * UPL for i in range(NLANG)), [])
    gsm = HierarchicalGSM.create(
        u, EMBED, D, lang_dim=LANGD, n_langs=NLANG, unit_lang=unit_lang,
        states_per_unit=SPU, learn_transitions=True,
        key=jax.random.PRNGKey(3),
    )
    rng = np.random.default_rng(5)
    c = rng.uniform(500.0, 2000.0, size=(u, SPU, 1)).astype(np.float32)
    mu = rng.normal(size=(u, SPU, 1, D)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=(u, SPU, 1, D)).astype(np.float32)
    cc = c[..., None]
    sx = cc * mu
    sxx = cc * (var + mu**2)
    emission = np.concatenate(
        [-0.5 * sxx, sx, np.broadcast_to(-0.5 * cc, sxx.shape),
         np.broadcast_to(0.5 * cc, sxx.shape)], axis=-1)
    stats = {
        "emission": jnp.asarray(emission),
        "comp_counts": jnp.asarray(c),
        "self": jnp.asarray(0.9 * c[..., 0]),
        "adv": jnp.asarray(0.1 * c[..., 0]),
    }
    return gsm, stats


def chain(body, inner, gsm, opt_state):
    """jit a scan of body(carry, key) over `inner` fresh keys."""

    @jax.jit
    def run(gsm, opt_state, stats, key):
        keys = jax.random.split(key, inner)
        carry, out = jax.lax.scan(
            lambda c, k: body(c, k, stats), (gsm, opt_state), keys
        )
        return out[-1]

    return run


def chain_eps(body, inner, gsm, opt_state):
    """jit a scan of body(carry, eps) over presampled noise (the
    round-5 train-scan structure)."""

    @jax.jit
    def run(gsm, opt_state, stats, key):
        keys = jax.random.split(key, inner)
        eps_all = jax.vmap(lambda k: gsm._sample_eps(k, NSAMPLES))(keys)
        carry, out = jax.lax.scan(
            lambda c, e: body(c, e, stats), (gsm, opt_state), eps_all
        )
        return out[-1]

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, nargs=2, default=[100, 1100])
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--components", default="rng,fwd,grad,full")
    ap.add_argument("--nsamples", type=int, default=4)
    args = ap.parse_args()
    n1, n2 = args.inner
    wanted = args.components.split(",")
    global NSAMPLES
    NSAMPLES = args.nsamples

    gsm, stats = make_model_and_stats()
    tx = optax.adam(5e-2)
    opt0 = tx.init(gsm)

    def body_nop(carry, k, stats):
        # harness floor: scan step + the upfront key split's per-step
        # share, no draw — isolates what the slope method charges every
        # component regardless of body
        g, opt = carry
        kd = (jax.random.key_data(k)
              if jnp.issubdtype(k.dtype, jax.dtypes.prng_key) else k)
        return carry, kd.astype(jnp.float32).sum()

    def body_draw(carry, k, stats):
        # the flat normal draw alone, no reparameterization
        g, opt = carry
        eps = g._sample_eps(k, NSAMPLES)
        return carry, sum(e.sum() for e in eps.values())

    def body_rng(carry, k, stats):
        g, opt = carry
        h, w = g._sample_params(k, NSAMPLES)
        return carry, h.sum() + w.sum()

    def body_fwd(carry, k, stats):
        g, opt = carry
        return carry, g.elbo(stats, None, k, NSAMPLES)

    def body_grad(carry, k, stats):
        g, opt = carry
        loss, grads = jax.value_and_grad(
            lambda g_: -g_.elbo(stats, None, k, NSAMPLES)
        )(g)
        return carry, loss + sum(jnp.sum(l) for l in jax.tree.leaves(grads))

    def body_full(carry, k, stats):
        g, opt = carry
        loss, grads = jax.value_and_grad(
            lambda g_: -g_.elbo(stats, None, k, NSAMPLES)
        )(g)
        updates, opt = tx.update(grads, opt, g)
        import optax as _o

        g = _o.apply_updates(g, updates)
        return (g, opt), -loss

    def body_fwd_eps(carry, eps, stats):
        g, opt = carry
        return carry, g.elbo(stats, None, None, NSAMPLES, eps=eps)

    def body_grad_eps(carry, eps, stats):
        g, opt = carry
        loss, grads = jax.value_and_grad(
            lambda g_: -g_.elbo(stats, None, None, NSAMPLES, eps=eps)
        )(g)
        return carry, loss + sum(jnp.sum(l) for l in jax.tree.leaves(grads))

    def body_full_eps(carry, eps, stats):
        g, opt = carry
        loss, grads = jax.value_and_grad(
            lambda g_: -g_.elbo(stats, None, None, NSAMPLES, eps=eps)
        )(g)
        updates, opt = tx.update(grads, opt, g)
        import optax as _o

        g = _o.apply_updates(g, updates)
        return (g, opt), -loss

    bodies = {"nop": body_nop, "draw": body_draw,
              "rng": body_rng, "fwd": body_fwd, "grad": body_grad,
              "full": body_full, "fwd_eps": body_fwd_eps,
              "grad_eps": body_grad_eps, "full_eps": body_full_eps}
    # the key impl the components run under IS what's being profiled:
    # train_key honors BEER_GSM_RNG (rbg default / threefry)
    from beer_tpu.models.gsm import train_key

    key = train_key(11)
    out = {}
    for name in wanted:
        mk = chain_eps if name.endswith("_eps") else chain
        f1 = mk(bodies[name], n1, gsm, opt0)
        f2 = mk(bodies[name], n2, gsm, opt0)
        float(f1(gsm, opt0, stats, key))  # compile
        float(f2(gsm, opt0, stats, key))

        def run(f):
            t0 = time.time()
            for _ in range(args.outer):
                float(f(gsm, opt0, stats, key))
            return (time.time() - t0) / args.outer

        t1, t2 = run(f1), run(f2)
        dt = (t2 - t1) / (n2 - n1)
        out[name] = round(dt * 1e6, 2)  # µs
        print(f"{name}: {dt*1e6:.2f} us/step "
              f"({1.0/max(dt,1e-12):.0f} steps/s)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
