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
# Data comes from the shared adversarial generator (recipes/lib/
# aud_synth.py: allophones, formant trajectories, gamma durations,
# per-utterance speaker factors + noise) with a HELD-OUT eval split;
# all scores are on eval utterances never touched by training, and the
# phone loop must clear a k-means frame-clustering floor.
#
# Usage: ./run.sh [workdir]   (defaults to exp/)

set -euo pipefail
cd "$(dirname "$0")"

work=${1:-exp}
stage_mark() { echo "=== stage $1: $2"; }
# run from a bare checkout: make beer_tpu importable without pip install
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
beer() { python -m beer_tpu.cli "$@" ${BEER_DEVICE:+--device "$BEER_DEVICE"}; }

mkdir -p "$work"

if [ ! -f "$work/wav_aud.scp" ]; then
  stage_mark 0 "adversarial synthetic data (+ eval split)"
  python local/make_synthetic_data.py "$work"
fi

for split in aud aud_eval; do
  if [ ! -f "$work/feats_$split.npz" ]; then
    stage_mark 1 "features ($split)"
    beer dataset create "$work/wav_$split.scp" "$work/manifest_$split.json"
    beer features extract conf/features.yml "$work/manifest_$split.json" \
        "$work/feats_$split.npz"
  fi
done

if [ ! -f "$work/score_kmeans.txt" ]; then
  stage_mark 2 "k-means frame baseline (train -> eval)"
  python ../shmm/local/kmeans_baseline.py "$work/feats_aud.npz" \
      "$work/feats_aud_eval.npz" "$work/trans_kmeans.txt" --clusters 20
  python local/score.py "$work/ref_aud_eval.ali" "$work/trans_kmeans.txt" \
      | tee "$work/score_kmeans.txt"
fi

if [ ! -f "$work/init.mdl" ]; then
  stage_mark 3 "phone-loop initialization"
  beer hmm mkphoneloop conf/hmm.yml "$work/feats_aud.npz" "$work/init.mdl"
fi

if [ ! -f "$work/train/final.mdl" ]; then
  stage_mark 4 "VB-EM training"
  beer hmm train "$work/init.mdl" "$work/feats_aud.npz" "$work/train" \
      --epochs 30
fi

if [ ! -f "$work/trans.txt" ]; then
  stage_mark 5 "decoding (held-out eval)"
  beer hmm decode "$work/train/final.mdl" "$work/feats_aud_eval.npz" \
      "$work/trans.txt" --per-frame
fi

stage_mark 6 "scoring (held-out eval)"
python local/score.py "$work/ref_aud_eval.ali" "$work/trans.txt" \
    | tee "$work/score.txt"

get_nmi() { grep -o 'NMI: *[0-9.]*' "$1" | grep -o '[0-9.]*$'; }
km=$(get_nmi "$work/score_kmeans.txt")
loop=$(get_nmi "$work/score.txt")
python - "$km" "$loop" << 'EOF'
import sys
km, loop = float(sys.argv[1]), float(sys.argv[2])
print(f"phone loop NMI {loop:.1f} vs k-means floor {km:.1f}: "
      f"{'BEATS' if loop > km else 'does NOT beat'} the floor")
EOF
