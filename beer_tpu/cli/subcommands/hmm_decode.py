"""Viterbi-decode unit transcriptions (reference: ``beer hmm decode``)."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def setup(parser):
    parser.add_argument("model", help="trained model (.mdl)")
    parser.add_argument("feats", help="feature archive (.npz)")
    parser.add_argument("out", help="output transcription file")
    parser.add_argument(
        "--per-frame", action="store_true",
        help="emit per-frame unit labels instead of collapsed transcriptions",
    )
    parser.add_argument(
        "--phone-lm", action="store_true",
        help="the model is mkphones emissions: decode with a phone-loop "
        "graph and emit phone symbols (supervised recognizer)",
    )
    parser.add_argument(
        "--lm-transcriptions", default=None,
        help="with --phone-lm: estimate a bigram phone LM from this "
        "transcription file instead of a uniform loop",
    )


def collapse(units):
    """Per-frame unit labels → unit transcription (collapse repeats)."""
    out = []
    for u in units:
        if not out or out[-1] != u:
            out.append(int(u))
    return out


def main(args):
    import jax
    import jax.numpy as jnp

    from beer_tpu.cli.subcommands.hmm_train import pad_archive
    from beer_tpu.utils import load_model

    model = load_model(args.model)
    keys, data, mask = pad_archive(args.feats)

    if args.phone_lm:
        import json

        from beer_tpu.models.graph import bigram_lm, phone_loop_graph
        from beer_tpu.models.hmm import HMM

        meta = json.loads(Path(args.model + ".phones.json").read_text())
        phones = meta["phones"]
        spp = meta["states_per_phone"]
        lm_trans = lm_init = None
        if args.lm_transcriptions:
            from beer_tpu.cli.subcommands.hmm_mkphones import read_transcriptions

            idx = {p: i for i, p in enumerate(phones)}
            seqs = [
                [idx[p] for p in seq if p in idx]
                for seq in read_transcriptions(args.lm_transcriptions).values()
            ]
            lm_trans, lm_init = bigram_lm(seqs, len(phones))
        recognizer = HMM.create(
            phone_loop_graph(len(phones), spp, lm_trans=lm_trans,
                             lm_init=lm_init).compile(),
            model,
        )
        paths, _ = jax.jit(recognizer.decode)(
            jnp.asarray(data), jnp.asarray(mask)
        )
        units = np.asarray(paths) // spp
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        with open(args.out, "w") as fh:
            for i, k in enumerate(keys):
                ln = int(mask[i].sum())
                labels = units[i, :ln] if args.per_frame else collapse(units[i, :ln])
                fh.write(f"{k} {' '.join(phones[u] for u in labels)}\n")
        print(f"decoded {len(keys)} utterances to {args.out}")
        return

    decode = jax.jit(model.decode_units)
    units, scores = decode(jnp.asarray(data), jnp.asarray(mask))
    units = np.asarray(units)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as fh:
        for i, k in enumerate(keys):
            ln = int(mask[i].sum())
            labels = units[i, :ln]
            if not args.per_frame:
                labels = collapse(labels)
            fh.write(f"{k} {' '.join(f'au{u}' for u in labels)}\n")
    print(f"decoded {len(keys)} utterances to {args.out}")
