#!/usr/bin/env bash
# Supervised HMM-GMM phone recognizer recipe (BASELINE config 3).
#
# Reference parity: the historical recipes/timit* shape — data prep →
# features → mkphones → supervised VB training on transcription graphs →
# phone-loop decoding → PER scoring.  Stage-gated and restartable.
#
# Usage: ./run.sh [workdir]

set -euo pipefail
cd "$(dirname "$0")"

work=${1:-exp}
stage_mark() { echo "=== stage $1: $2"; }
beer() { python -m beer_tpu.cli "$@"; }

mkdir -p "$work"

if [ ! -f "$work/wav.scp" ]; then
  stage_mark 0 "synthetic labeled data preparation"
  python ../aud/local/make_synthetic_data.py "$work/audio" "$work/wav.scp" \
      --ref-trans "$work/ref.ali"
  # collapse per-frame reference labels into phone transcriptions
  python local/ali_to_trans.py "$work/ref.ali" "$work/train.trans"
fi

if [ ! -f "$work/manifest.json" ]; then
  stage_mark 1 "dataset manifest"
  beer dataset create "$work/wav.scp" "$work/manifest.json"
fi

if [ ! -f "$work/feats.bar" ]; then
  stage_mark 2 "feature extraction (native archive)"
  beer features extract ../aud/conf/features.yml "$work/manifest.json" \
      "$work/feats.bar"
fi

if [ ! -f "$work/emissions.mdl" ]; then
  stage_mark 3 "phone HMM-GMM initialization"
  beer hmm mkphones conf/phones.yml "$work/feats.bar" "$work/train.trans" \
      "$work/emissions.mdl"
fi

if [ ! -f "$work/train/final.mdl" ]; then
  stage_mark 4 "supervised VB training on transcription graphs"
  beer hmm train "$work/emissions.mdl" "$work/feats.bar" "$work/train" \
      --epochs 20 --transcriptions "$work/train.trans"
fi

if [ ! -f "$work/hyp.trans" ]; then
  stage_mark 5 "phone-loop recognition"
  beer hmm decode "$work/train/final.mdl" "$work/feats.bar" "$work/hyp.trans" \
      --phone-lm --lm-transcriptions "$work/train.trans"
fi

stage_mark 6 "PER scoring"
python local/score_per.py "$work/train.trans" "$work/hyp.trans" | tee "$work/score.txt"
