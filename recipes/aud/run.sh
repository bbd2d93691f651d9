#!/usr/bin/env bash
# Phone-loop acoustic unit discovery recipe (BASELINE config 4).
#
# Reference parity: recipes/hshmm/run.sh & recipes/aud*/run.sh — the same
# stage-gated shape (data prep → features → model init → VB training →
# decoding → scoring), but the per-job SGE map-reduce of the reference is
# replaced by on-chip data parallelism inside `beer hmm train`
# (shard_map + psum; see beer_tpu/parallel/).  Stages skip when their
# output already exists, so the recipe is restartable like the reference.
#
# Usage: ./run.sh [workdir]   (defaults to exp/)

set -euo pipefail
cd "$(dirname "$0")"

work=${1:-exp}
stage_mark() { echo "=== stage $1: $2"; }
beer() { python -m beer_tpu.cli "$@"; }

mkdir -p "$work"

if [ ! -f "$work/wav.scp" ]; then
  stage_mark 0 "synthetic data preparation"
  python local/make_synthetic_data.py "$work/audio" "$work/wav.scp" \
      --ref-trans "$work/ref.ali"
fi

if [ ! -f "$work/manifest.json" ]; then
  stage_mark 1 "dataset manifest"
  beer dataset create "$work/wav.scp" "$work/manifest.json"
fi

if [ ! -f "$work/feats.npz" ]; then
  stage_mark 2 "feature extraction"
  beer features extract conf/features.yml "$work/manifest.json" "$work/feats.npz"
fi

if [ ! -f "$work/init.mdl" ]; then
  stage_mark 3 "phone-loop initialization"
  beer hmm mkphoneloop conf/hmm.yml "$work/feats.npz" "$work/init.mdl"
fi

if [ ! -f "$work/train/final.mdl" ]; then
  stage_mark 4 "VB-EM training"
  beer hmm train "$work/init.mdl" "$work/feats.npz" "$work/train" --epochs 30
fi

if [ ! -f "$work/trans.txt" ]; then
  stage_mark 5 "decoding"
  beer hmm decode "$work/train/final.mdl" "$work/feats.npz" "$work/trans.txt" \
      --per-frame
fi

stage_mark 6 "scoring"
python local/score.py "$work/ref.ali" "$work/trans.txt" | tee "$work/score.txt"
