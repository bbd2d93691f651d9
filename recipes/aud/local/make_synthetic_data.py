"""Synthetic AUD corpus: formant-style tone "phones" at 16 kHz.

Each pseudo-phone is a fixed pair of sine carriers with an amplitude
envelope; utterances are random phone sequences.  Writes raw .npy audio,
an scp list, and the reference per-frame alignment used for scoring
(frame shift matched to conf/features.yml: 10 ms).
"""

import argparse
from pathlib import Path

import numpy as np

SRATE = 16000
FRAME_SHIFT = 160  # 10 ms
PHONE_FORMANTS = [
    (300, 2200), (450, 1700), (600, 1200), (800, 1000),
    (350, 2600), (500, 900),
]


def synth_phone(rng, phone, dur_frames):
    n = dur_frames * FRAME_SHIFT
    t = np.arange(n) / SRATE
    f1, f2 = PHONE_FORMANTS[phone]
    jitter = 1.0 + 0.02 * rng.normal()
    sig = 0.6 * np.sin(2 * np.pi * f1 * jitter * t) + 0.4 * np.sin(
        2 * np.pi * f2 * jitter * t
    )
    env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n)) / 200.0)
    return (sig * env + 0.01 * rng.normal(size=n)).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio_dir")
    ap.add_argument("scp")
    ap.add_argument("--ref-trans", required=True)
    ap.add_argument("--n-utts", type=int, default=50)
    ap.add_argument("--n-phones", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    audio_dir = Path(args.audio_dir)
    audio_dir.mkdir(parents=True, exist_ok=True)
    scp_lines, ref_lines = [], []
    for i in range(args.n_utts):
        n_seg = int(rng.integers(4, 10))
        phones = rng.integers(args.n_phones, size=n_seg)
        segs, labels = [], []
        for ph in phones:
            dur = int(rng.integers(8, 20))
            segs.append(synth_phone(rng, int(ph), dur))
            labels += [int(ph)] * dur
        sig = np.concatenate(segs)
        path = audio_dir / f"utt{i:04d}.npy"
        np.save(path, sig)
        scp_lines.append(f"utt{i:04d} {path.resolve()}")
        ref_lines.append(f"utt{i:04d} {' '.join(f'p{l}' for l in labels)}")
    Path(args.scp).write_text("\n".join(scp_lines) + "\n")
    Path(args.ref_trans).write_text("\n".join(ref_lines) + "\n")
    print(f"wrote {args.n_utts} synthetic utterances to {audio_dir}")


if __name__ == "__main__":
    main()
