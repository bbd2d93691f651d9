"""Subspace-HMM training (reference: ``beer shmm train``).

Alternates, per outer iteration (SURVEY.md §3.5):
1. phone-loop E-step accumulation of per-unit-state statistics,
2. reparameterization-trick gradient steps on the GSM ELBO,
3. injecting the subspace emission parameters back into the loop.

Input: a trained phone-loop ``.mdl`` (diagonal covariance) + features;
output: the subspace-constrained phone loop and the GSM itself.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def setup(parser):
    parser.add_argument("model", help="trained phone-loop model (.mdl)")
    parser.add_argument("feats", help="feature archive (.npz)")
    parser.add_argument("outdir", help="output directory")
    parser.add_argument("--embed-dim", type=int, default=10)
    parser.add_argument("--outer-iters", type=int, default=5)
    parser.add_argument("--inner-iters", type=int, default=500)
    parser.add_argument("--lrate", type=float, default=5e-2)


def main(args):
    import jax
    import jax.numpy as jnp
    import optax

    from beer_tpu.models.gsm import (
        GSM,
        accumulate_unit_stats,
        apply_to_phoneloop,
        make_gsm_train_step,
    )
    from beer_tpu.cli.subcommands.hmm_train import pad_archive
    from beer_tpu.utils import load_model, save_model

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    loop = load_model(args.model)
    _, data, mask = pad_archive(args.feats)
    x, m = jnp.asarray(data), jnp.asarray(mask)
    d = data.shape[-1]

    gsm = GSM.create(
        loop.n_units, args.embed_dim, d,
        states_per_unit=loop.states_per_unit, key=jax.random.PRNGKey(0),
    )
    tx = optax.adam(args.lrate)
    opt_state = tx.init(gsm)
    gstep = make_gsm_train_step(tx)
    accumulate = jax.jit(accumulate_unit_stats)
    key = jax.random.PRNGKey(1)

    for outer in range(args.outer_iters):
        stats, counts = accumulate(loop, x, m)
        elbo = None
        for _ in range(args.inner_iters):
            key, sub = jax.random.split(key)
            elbo, gsm, opt_state = gstep(gsm, opt_state, stats, counts, sub)
        loop = apply_to_phoneloop(gsm, loop)
        print(f"outer {outer}: gsm elbo = {float(elbo):.2f}")

    save_model(loop, outdir / "final.mdl")
    save_model(gsm, outdir / "gsm.mdl")
    print(f"wrote {outdir / 'final.mdl'} and {outdir / 'gsm.mdl'}")
