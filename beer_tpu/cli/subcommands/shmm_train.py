"""Subspace-HMM training (reference: ``beer shmm train``).

Alternates, per outer iteration (SURVEY.md §3.5):
1. phone-loop VB-EM epochs on each language's data (warm start /
   re-estimation under the current subspace constraint),
2. phone-loop E-step accumulation of per-unit statistics (emissions,
   and with ``--learn-transitions`` the per-state self-loop/advance
   counts),
3. reparameterization-trick gradient steps on the GSM ELBO,
4. moment-matched write-back of the subspace posterior into the loop(s).

Single language trains a :class:`beer_tpu.models.gsm.GSM`; adding
``--extra-lang NAME:MODEL:FEATS`` switches to the multilingual
:class:`HierarchicalGSM` (H-SHMM, ICASSP'21): one shared subspace, one
embedding per language, units concatenated across languages.

Input: trained phone-loop ``.mdl`` (diagonal covariance) + features;
output: subspace-constrained loops (``final.mdl`` / ``final_NAME.mdl``)
and the GSM itself (``gsm.mdl``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def setup(parser):
    parser.add_argument("model", help="trained phone-loop model (.mdl)")
    parser.add_argument("feats", help="feature archive (.npz or .bar)")
    parser.add_argument("outdir", help="output directory")
    parser.add_argument("--embed-dim", type=int, default=10)
    parser.add_argument("--outer-iters", type=int, default=5)
    parser.add_argument("--inner-iters", type=int, default=500)
    parser.add_argument("--loop-epochs", type=int, default=2,
                        help="phone-loop VB epochs per outer iteration")
    parser.add_argument("--lrate", type=float, default=5e-2)
    parser.add_argument("--learn-transitions", action="store_true",
                        help="subspace also generates per-state self-loop "
                        "probabilities")
    parser.add_argument("--trunk", default=None,
                        help="nnet transform config (e.g. 'mlp:32,32:tanh')")
    parser.add_argument("--lang-dim", type=int, default=2,
                        help="language-embedding dim (multilingual)")
    parser.add_argument("--extra-lang", action="append", default=[],
                        metavar="NAME:MODEL:FEATS",
                        help="additional language (repeatable) -> H-SHMM")
    parser.add_argument("--writeback-samples", type=int, default=64)


def main(args):
    import jax
    import jax.numpy as jnp
    import optax

    from beer_tpu.models.gsm import (
        GSM,
        HierarchicalGSM,
        accumulate_unit_stats,
        apply_to_phoneloop,
        make_gsm_train_scan,
        train_key,
    )
    from beer_tpu.cli.subcommands.hmm_train import pad_archive
    from beer_tpu.utils import load_model, save_model
    from beer_tpu.vbi import vb_step

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    langs = [("main", args.model, args.feats)]
    for spec in args.extra_lang:
        name, model, feats = spec.split(":")
        langs.append((name, model, feats))

    loops, datas, masks = [], [], []
    for _, model_path, feats_path in langs:
        loops.append(load_model(model_path))
        _, data, mask = pad_archive(feats_path)
        datas.append(jnp.asarray(data))
        masks.append(jnp.asarray(mask))
    d = datas[0].shape[-1]
    n_units = loops[0].n_units
    spp = loops[0].states_per_unit
    for lp in loops[1:]:
        if lp.n_units != n_units or lp.states_per_unit != spp:
            raise ValueError("all languages need the same loop topology")

    multilingual = len(langs) > 1
    if multilingual:
        unit_lang = sum(([i] * n_units for i in range(len(langs))), [])
        gsm = HierarchicalGSM.create(
            n_units * len(langs), args.embed_dim, d,
            lang_dim=args.lang_dim, n_langs=len(langs), unit_lang=unit_lang,
            states_per_unit=spp, learn_transitions=args.learn_transitions,
            trunk=args.trunk, key=jax.random.PRNGKey(0),
        )
    else:
        gsm = GSM.create(
            n_units, args.embed_dim, d, states_per_unit=spp,
            learn_transitions=args.learn_transitions, trunk=args.trunk,
            key=jax.random.PRNGKey(0),
        )

    tx = optax.adam(args.lrate)
    opt_state = tx.init(gsm)
    grun = make_gsm_train_scan(tx)
    loop_step = jax.jit(lambda m, x, msk: vb_step(m, x, mask=msk))
    accumulate = jax.jit(
        lambda lp, x, msk: accumulate_unit_stats(
            lp, x, msk, transitions=args.learn_transitions
        )
    )
    # rbg hardware RNG by default — measured faster for the subspace
    # step's noise draw (see gsm.GSM_RNG_IMPL; BEER_GSM_RNG=threefry
    # selects the counter-based impl)
    key = train_key(1)

    def cat_stats(per_lang):
        """Concatenate per-language stats along the unit axis."""
        if isinstance(per_lang[0], dict):
            return {
                k: (jnp.concatenate([s[k] for s in per_lang])
                    if per_lang[0][k] is not None else None)
                for k in per_lang[0]
            }
        return jnp.concatenate(per_lang)

    for outer in range(args.outer_iters):
        # 1. VB re-estimation of each loop under the current constraint
        for i in range(len(loops)):
            for _ in range(args.loop_epochs):
                elbo, loops[i] = loop_step(loops[i], datas[i], masks[i])

        # 2. accumulate per-unit statistics
        all_stats, all_counts = [], []
        for i in range(len(loops)):
            st, ct = accumulate(loops[i], datas[i], masks[i])
            all_stats.append(st)
            all_counts.append(ct)
        stats = cat_stats(all_stats)
        counts = jnp.concatenate(all_counts)

        # 3. subspace training — the whole inner loop is ONE device
        # dispatch (lax.scan over the gradient steps)
        key, sub = jax.random.split(key)
        elbo, gsm, opt_state = grun(
            gsm, opt_state, stats, counts, sub, args.inner_iters
        )

        # 4. moment-matched write-back per language
        key, sub = jax.random.split(key)
        if multilingual:
            for i in range(len(loops)):
                sub_gsm = _slice_gsm(gsm, i, n_units, args.embed_dim)
                loops[i] = apply_to_phoneloop(
                    sub_gsm, loops[i], key=sub,
                    nsamples=args.writeback_samples,
                )
        else:
            loops[0] = apply_to_phoneloop(
                gsm, loops[0], key=sub, nsamples=args.writeback_samples
            )
        print(f"outer {outer}: gsm elbo = {float(elbo):.2f}")

    for (name, _, _), loop in zip(langs, loops):
        out = "final.mdl" if name == "main" else f"final_{name}.mdl"
        save_model(loop, outdir / out)
    save_model(gsm, outdir / "gsm.mdl")
    print(f"wrote {outdir / 'final.mdl'} and {outdir / 'gsm.mdl'}")


def _slice_gsm(gsm, lang_idx, n_units, embed_dim):
    """A per-language view of a HierarchicalGSM for write-back.

    Builds a plain GSM over this language's units whose sampling uses
    [e_u; l_lang] through the shared map — exactly the induced q(η)
    of those units.
    """
    from beer_tpu.models.gsm import GSM

    sl = slice(lang_idx * n_units, (lang_idx + 1) * n_units)
    import jax.numpy as jnp

    e_mean = jnp.concatenate(
        [gsm.e_mean[sl],
         jnp.broadcast_to(gsm.lang_mean[lang_idx],
                          (n_units, gsm.lang_dim))], axis=-1
    )
    e_logvar = jnp.concatenate(
        [gsm.e_logvar[sl],
         jnp.broadcast_to(gsm.lang_logvar[lang_idx],
                          (n_units, gsm.lang_dim))], axis=-1
    )
    return GSM(
        e_mean=e_mean,
        e_logvar=e_logvar,
        w_mean=gsm.w_mean,
        w_logvar=gsm.w_logvar,
        trunk_params=gsm.trunk_params,
        trunk_def=gsm.trunk_def,
        n_units=n_units,
        embed_dim=embed_dim + gsm.lang_dim,
        obs_dim=gsm.obs_dim,
        states_per_unit=gsm.states_per_unit,
        n_comp=gsm.n_comp,
        learn_transitions=gsm.learn_transitions,
    )
