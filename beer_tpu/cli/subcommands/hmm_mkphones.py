"""Build per-phone HMM-GMM emissions (reference: ``beer hmm mkphones``).

Creates the MixtureSet emissions for a supervised phone recognizer
(BASELINE config 3): one GMM per phone-state, phone inventory taken from
the training transcriptions.  Writes ``out.mdl`` (emissions) and
``out.mdl.phones.json`` (phone inventory + topology metadata consumed by
``hmm train --transcriptions`` and ``hmm decode --phone-lm``).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def setup(parser):
    parser.add_argument("conf", help="hmm YAML config")
    parser.add_argument("feats", help="feature archive (.npz)")
    parser.add_argument("transcriptions", help="'uttid ph1 ph2 ...' per line")
    parser.add_argument("out", help="output model (.mdl)")


def read_transcriptions(path):
    out = {}
    for line in Path(path).read_text().splitlines():
        parts = line.split()
        if parts:
            out[parts[0]] = parts[1:]
    return out


def main(args):
    import jax
    import jax.numpy as jnp

    import beer_tpu
    from beer_tpu.models.mixture import MixtureSet
    from beer_tpu.utils import load_yaml, save_model

    conf = load_yaml(args.conf)
    states_per_phone = int(conf.get("states_per_phone", 3))
    ncomp = int(conf.get("ncomp_per_state", 2))
    cov_type = conf.get("cov_type", "diagonal")
    prior_strength = float(conf.get("prior_strength", 1.0))
    noise_std = float(conf.get("noise_std", 1.0))
    seed = int(conf.get("seed", 1))

    trans = read_transcriptions(args.transcriptions)
    phones = sorted({p for seq in trans.values() for p in seq})

    if args.feats.endswith(".bar"):
        from beer_tpu import io as bio

        bar = bio.Archive(args.feats)
        flat = np.concatenate([bar[i] for i in range(len(bar))])
    else:
        archive = np.load(args.feats)
        flat = np.concatenate([archive[k] for k in archive.files])
    mean = jnp.asarray(flat.mean(0))
    cov = (
        jnp.asarray(np.cov(flat.T))
        if cov_type == "full"
        else jnp.asarray(np.diag(flat.var(0)))
    )

    n_pdfs = len(phones) * states_per_phone
    # init pdf means from random data frames (see hmm_mkphoneloop)
    rng = np.random.default_rng(seed)
    n_comps = n_pdfs * ncomp
    frames = flat[rng.choice(len(flat), size=n_comps, replace=len(flat) < n_comps)]
    frames = frames + 0.1 * noise_std * flat.std(0) * rng.standard_normal(frames.shape)
    nset = beer_tpu.NormalSet.create(
        mean, cov, size=n_comps,
        prior_strength=prior_strength, noise_std=noise_std, cov_type=cov_type,
        key=jax.random.PRNGKey(seed), init_means=jnp.asarray(frames),
    )
    emissions = MixtureSet.create(nset, nmix=n_pdfs)
    save_model(emissions, args.out)
    meta = {
        "phones": phones,
        "states_per_phone": states_per_phone,
        "ncomp_per_state": ncomp,
    }
    Path(args.out + ".phones.json").write_text(json.dumps(meta, indent=1))
    print(
        f"wrote emissions for {len(phones)} phones x {states_per_phone} "
        f"states x {ncomp} components to {args.out}"
    )
