#!/usr/bin/env bash
# Local job-array VB-EM: file-based map-reduce over utterance shards.
#
# Reference parity: `utils/parallel/` in the reference recipes — its only
# scale-out mechanism (SURVEY.md §2.10): split the utterance list into N
# shards, run one statistics-accumulation job per shard (SGE array or
# local background jobs), then reduce the statistics files into a single
# natural-parameter update per epoch.  This is the local-backend analog
# for beer_tpu: `beer hmm accumulate --shard j/N` jobs in parallel, then
# one `beer hmm update`.  Exact full-batch VB-EM — identical math to
# `beer hmm train` — for corpora spread over processes/hosts that do NOT
# share a device mesh (on-chip dp via beer_tpu/parallel is the fast path
# when they do).  Stage-gated per epoch: rerunning resumes from the
# latest epochNNNN.mdl like `beer hmm train`.
#
# Usage: parallel_vbem.sh <init.mdl> <feats> <workdir> <njobs> <epochs> [lrate]

set -euo pipefail

model=$1 feats=$2 work=$3 njobs=$4 epochs=$5 lrate=${6:-1.0}
beer() { python -m beer_tpu.cli "$@" ${BEER_DEVICE:+--device "$BEER_DEVICE"}; }
mkdir -p "$work"

current=$model
start=0
latest=$(ls "$work"/epoch????.mdl 2>/dev/null | sort | tail -1 || true)
if [ -n "$latest" ]; then
    current=$latest
    start=$((10#$(basename "$latest" .mdl | tr -dc 0-9)))
    echo "resuming from $latest (epoch $start)"
fi

for epoch in $(seq $((start + 1)) "$epochs"); do
    pids=()
    for j in $(seq 1 "$njobs"); do
        beer hmm accumulate "$current" "$feats" \
            "$work/epoch$epoch.$j.acc" --shard "$j/$njobs" \
            > "$work/accumulate.$epoch.$j.log" 2>&1 &
        pids+=($!)
    done
    for pid in "${pids[@]}"; do wait "$pid"; done
    next=$(printf '%s/epoch%04d.mdl' "$work" "$epoch")
    beer hmm update "$current" "$next" \
        "$work"/epoch"$epoch".*.acc --lrate "$lrate"
    rm -f "$work"/epoch"$epoch".*.acc
    current=$next
done
cp "$current" "$work/final.mdl"
echo "wrote $work/final.mdl"
