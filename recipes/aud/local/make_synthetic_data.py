"""Monolingual AUD corpus from the shared adversarial generator.

Thin wrapper over ``recipes/lib/aud_synth.py`` (allophones, formant
trajectories, gamma durations, per-utterance speaker factors + noise)
writing a train split and a held-out eval split.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "lib"))
import aud_synth  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n-phones", type=int, default=8)
    ap.add_argument("--n-utts", type=int, default=50)
    ap.add_argument("--n-utts-eval", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--name", default="aud")
    ap.add_argument("--write-trans", action="store_true",
                    help="also write phone transcriptions (.trans) — the "
                    "supervised recipe's labels")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    out = Path(args.out_dir)
    steady, allo = aud_synth.make_inventory(rng, args.n_phones)
    unigram = rng.dirichlet(np.full(args.n_phones, 3.0))
    for n, tag in ((args.n_utts, ""), (args.n_utts_eval, "_eval")):
        transcripts = aud_synth.make_split(
            rng, args.name, steady, allo, unigram, out, n, tag=tag,
            audio_subdir="audio", return_transcripts=args.write_trans,
        )
        if args.write_trans:
            suffix = f"_{tag.lstrip('_')}" if tag else ""
            lines = [
                f"{utt} {' '.join(f'p{p}' for p in seq)}"
                for utt, seq in transcripts
            ]
            (out / f"{args.name}{suffix}.trans").write_text(
                "\n".join(lines) + "\n")
    print(f"wrote {args.n_utts} train + {args.n_utts_eval} eval utts, "
          f"{args.n_phones} phones under {out}")


if __name__ == "__main__":
    main()
