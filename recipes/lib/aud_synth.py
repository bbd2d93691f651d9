"""Synthetic multilingual AUD corpus for the (H-)SHMM recipe.

Every language's pseudo-phones live on a SHARED phonetic subspace: a
phone is a point (f1, f2) in formant space drawn from a common latent
grid; each language applies one global affine "vocal tract" factor
(shift + scale) to all of its phones.  Low-resource target language C
gets only a handful of utterances — the setting where borrowing the
subspace from the resourced languages (H-SHMM, ICASSP'21) pays off.

Writes, per language: raw .npy audio, an scp list, and per-frame
reference alignments (10 ms frame shift, matching conf/features.yml).
"""

import argparse
from pathlib import Path

import numpy as np

SRATE = 16000
FRAME_SHIFT = 160  # 10 ms

# shared latent phone inventory: points on a 2-D grid in formant space
BASE_PHONES = [
    (300, 2300), (450, 1800), (620, 1250), (820, 1000), (380, 2600),
]
# per-language global factors (shift_f1, shift_f2, scale)
LANG_FACTORS = {
    "A": (0.0, 0.0, 1.00),
    "B": (60.0, -150.0, 1.06),
    "C": (-40.0, 120.0, 0.95),
}


def synth_phone(rng, f1, f2, dur_frames):
    n = dur_frames * FRAME_SHIFT
    t = np.arange(n) / SRATE
    jitter = 1.0 + 0.02 * rng.normal()
    sig = 0.6 * np.sin(2 * np.pi * f1 * jitter * t) + 0.4 * np.sin(
        2 * np.pi * f2 * jitter * t
    )
    env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n)) / 200.0)
    return (sig * env + 0.01 * rng.normal(size=n)).astype(np.float32)


def make_language(rng, lang, out_dir, n_utts):
    sh1, sh2, sc = LANG_FACTORS[lang]
    phones = [((f1 + sh1) * sc, (f2 + sh2) * sc) for f1, f2 in BASE_PHONES]
    audio_dir = out_dir / f"audio_{lang}"
    audio_dir.mkdir(parents=True, exist_ok=True)
    scp_lines, ref_lines = [], []
    for i in range(n_utts):
        n_seg = int(rng.integers(4, 10))
        seq = rng.integers(len(phones), size=n_seg)
        segs, labels = [], []
        for ph in seq:
            dur = int(rng.integers(8, 20))
            f1, f2 = phones[int(ph)]
            segs.append(synth_phone(rng, f1, f2, dur))
            labels += [int(ph)] * dur
        sig = np.concatenate(segs)
        path = audio_dir / f"{lang}_utt{i:04d}.npy"
        np.save(path, sig)
        scp_lines.append(f"{lang}_utt{i:04d} {path.resolve()}")
        ref_lines.append(
            f"{lang}_utt{i:04d} {' '.join(f'p{l}' for l in labels)}"
        )
    (out_dir / f"wav_{lang}.scp").write_text("\n".join(scp_lines) + "\n")
    (out_dir / f"ref_{lang}.ali").write_text("\n".join(ref_lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n-utts-resourced", type=int, default=40)
    ap.add_argument("--n-utts-target", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    out = Path(args.out_dir)
    make_language(rng, "A", out, args.n_utts_resourced)
    make_language(rng, "B", out, args.n_utts_resourced)
    make_language(rng, "C", out, args.n_utts_target)
    print(f"wrote languages A/B ({args.n_utts_resourced} utts) and "
          f"C ({args.n_utts_target} utts) under {out}")


if __name__ == "__main__":
    main()
