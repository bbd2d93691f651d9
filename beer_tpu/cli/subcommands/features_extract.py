"""Extract fbank/MFCC features for a manifest (reference: ``beer features extract``)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def setup(parser):
    parser.add_argument("conf", help="features YAML config")
    parser.add_argument("manifest", help="dataset manifest (.json)")
    parser.add_argument("out", help="output archive (.npz)")


def _load_audio(path: str, expected_srate: int):
    path = Path(path)
    if path.suffix == ".npy":
        return np.load(path)
    if path.suffix == ".wav":
        from scipy.io import wavfile

        srate, sig = wavfile.read(path)
        if srate != expected_srate:
            raise ValueError(f"{path}: srate {srate} != conf srate {expected_srate}")
        if sig.dtype.kind == "i":
            sig = sig.astype(np.float32) / np.iinfo(sig.dtype).max
        return sig
    raise ValueError(f"unsupported audio format: {path}")


def main(args):
    import jax

    from beer_tpu import features
    from beer_tpu.utils import load_yaml

    conf = features.FeatureConfig.from_dict(load_yaml(args.conf))
    with open(args.manifest) as fh:
        utts = json.load(fh)["utterances"]

    # jit per distinct signal length (cached across same-length utterances)
    extract = jax.jit(lambda s: features.extract(s, conf))
    archive = {}
    for uttid, path in utts.items():
        sig = _load_audio(path, conf.srate)
        archive[uttid] = np.asarray(extract(sig))
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.out, **archive)
    dims = {v.shape[-1] for v in archive.values()}
    print(f"extracted {len(archive)} utterances (feature dim {dims}) to {args.out}")
