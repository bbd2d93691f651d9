#!/usr/bin/env bash
# Supervised HMM-GMM phone recognizer recipe (BASELINE config 3).
#
# Reference parity: the historical recipes/timit* shape — data prep →
# features → mkphones → supervised VB training on transcription graphs →
# phone-loop decoding → PER scoring.  Stage-gated and restartable.
#
# Data comes from the shared adversarial generator (recipes/lib/
# aud_synth.py) with a HELD-OUT eval split; the headline PER is on eval
# utterances never touched by training (train-set PER printed for
# reference).
#
# Usage: ./run.sh [workdir]

set -euo pipefail
cd "$(dirname "$0")"

work=${1:-exp}
stage_mark() { echo "=== stage $1: $2"; }
# run from a bare checkout: make beer_tpu importable without pip install
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
beer() { python -m beer_tpu.cli "$@" ${BEER_DEVICE:+--device "$BEER_DEVICE"}; }

mkdir -p "$work"

if [ ! -f "$work/wav_sup.scp" ]; then
  stage_mark 0 "labeled data (+ eval split)"
  python ../aud/local/make_synthetic_data.py "$work" --name sup \
      --n-utts 40 --n-utts-eval 40 --write-trans
fi

for split in sup sup_eval; do
  if [ ! -f "$work/feats_$split.bar" ]; then
    stage_mark 1 "features ($split, native archive)"
    beer dataset create "$work/wav_$split.scp" "$work/manifest_$split.json"
    beer features extract ../aud/conf/features.yml \
        "$work/manifest_$split.json" "$work/feats_$split.bar"
  fi
done

if [ ! -f "$work/emissions.mdl" ]; then
  stage_mark 2 "phone HMM-GMM initialization"
  beer hmm mkphones conf/phones.yml "$work/feats_sup.bar" \
      "$work/sup.trans" "$work/emissions.mdl"
fi

if [ ! -f "$work/train/final.mdl" ]; then
  stage_mark 3 "supervised VB training on transcription graphs"
  beer hmm train "$work/emissions.mdl" "$work/feats_sup.bar" "$work/train" \
      --epochs 20 --transcriptions "$work/sup.trans"
fi

if [ ! -f "$work/hyp_eval.trans" ]; then
  stage_mark 4 "phone-loop recognition (train + held-out eval)"
  beer hmm decode "$work/train/final.mdl" "$work/feats_sup.bar" \
      "$work/hyp_train.trans" --phone-lm --lm-transcriptions "$work/sup.trans"
  beer hmm decode "$work/train/final.mdl" "$work/feats_sup_eval.bar" \
      "$work/hyp_eval.trans" --phone-lm --lm-transcriptions "$work/sup.trans"
fi

stage_mark 5 "PER scoring"
echo "-- train set (fit check):"
python local/score_per.py "$work/sup.trans" "$work/hyp_train.trans" \
    | tee "$work/score_train.txt"
echo "-- held-out eval set (headline):"
python local/score_per.py "$work/sup_eval.trans" "$work/hyp_eval.trans" \
    | tee "$work/score.txt"
