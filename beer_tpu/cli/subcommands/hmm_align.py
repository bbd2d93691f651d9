"""Forced alignment (reference recipes' alignment step).

Viterbi on per-utterance transcription graphs with trained emissions:
emits per-frame phone labels (the input to SHMM training or scoring).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def setup(parser):
    parser.add_argument("model", help="trained emissions (.mdl from mkphones/train)")
    parser.add_argument("feats", help="feature archive (.npz/.bar)")
    parser.add_argument("transcriptions", help="'uttid ph1 ph2 ...' per line")
    parser.add_argument("out", help="output per-frame alignment file")


def main(args):
    import jax
    import jax.numpy as jnp

    from beer_tpu.cli.subcommands.hmm_mkphones import read_transcriptions
    from beer_tpu.cli.subcommands.hmm_train import pad_archive
    from beer_tpu.models.graph import transcription_graphs
    from beer_tpu.models.hmm import HMM
    from beer_tpu.utils import load_model

    meta = json.loads(Path(args.model + ".phones.json").read_text())
    phones = meta["phones"]
    spp = meta["states_per_phone"]
    phone_idx = {p: i for i, p in enumerate(phones)}

    emissions = load_model(args.model)
    keys, data, mask = pad_archive(args.feats)
    trans = read_transcriptions(args.transcriptions)
    seqs = [[phone_idx[p] for p in trans[k]] for k in keys]
    graphs = transcription_graphs(seqs, len(phones), spp)
    hmm = HMM.create(graphs, emissions)

    paths, scores = jax.jit(hmm.decode)(jnp.asarray(data), jnp.asarray(mask))
    paths = np.asarray(paths)
    pdf_ids = np.asarray(graphs.pdf_ids)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as fh:
        for i, key in enumerate(keys):
            ln = int(mask[i].sum())
            frame_phones = pdf_ids[i][paths[i, :ln]] // spp
            fh.write(f"{key} {' '.join(phones[p] for p in frame_phones)}\n")
    print(f"aligned {len(keys)} utterances to {args.out}")
