"""Multilingual corpus for the (H-)SHMM recipe — shared generator.

Languages A/B (resourced) and C (low-resource target) share one latent
phone inventory (``recipes/lib/aud_synth.py``); each language applies a
global affine vocal-tract factor and its own unigram phonotactics.  Every
language gets a held-out eval split.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "lib"))
import aud_synth  # noqa: E402

LANG_FACTORS = {
    "A": ((0.0, 0.0), 1.00),
    "B": ((60.0, -150.0), 1.06),
    "C": ((-40.0, 120.0), 0.95),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n-phones", type=int, default=12)
    ap.add_argument("--n-utts-resourced", type=int, default=60)
    ap.add_argument("--n-utts-target", type=int, default=4)
    ap.add_argument("--n-utts-eval", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hard", action="store_true",
                    help="real-corpus degradations: reverb IR, babble "
                    "at 0-15 dB SNR, DC offset, clipping, heavy-tailed "
                    "utterance lengths (aud_synth.harden_utterance)")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    out = Path(args.out_dir)
    steady, allo = aud_synth.make_inventory(rng, args.n_phones)
    for lang in ("A", "B", "C"):
        shift, scale = LANG_FACTORS[lang]
        unigram = rng.dirichlet(np.full(args.n_phones, 3.0))
        n_train = (args.n_utts_target if lang == "C"
                   else args.n_utts_resourced)
        for n, tag in ((n_train, ""), (args.n_utts_eval, "_eval")):
            aud_synth.make_split(
                rng, lang, steady, allo, unigram, out, n, tag=tag,
                formant_shift=shift, formant_scale=scale, hard=args.hard,
            )
    print(
        f"wrote A/B ({args.n_utts_resourced} train utts), "
        f"C ({args.n_utts_target} train utts), eval sets of "
        f"{args.n_utts_eval} utts, {args.n_phones} shared phones"
    )


if __name__ == "__main__":
    main()
