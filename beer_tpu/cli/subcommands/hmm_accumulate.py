"""Accumulate VB statistics for one shard of a corpus (map step).

Reference parity: the reference's only scale-out mechanism is the
recipe-level ``utils/parallel/`` job arrays (SGE or local) that split the
utterance list into N shards, run one accumulation job per shard, write
the statistics to disk, and reduce them into a single natural-parameter
update (SURVEY.md §2.10 — Kaldi-style file-based map-reduce).  This
subcommand is the map step: ``beer hmm accumulate model feats out.acc
--shard 3/8`` scores every 3rd-of-8 utterance and writes the accumulated
statistics pytree (+ ELBO and frame count) to ``out.acc``.

``beer hmm update`` is the reduce step.  The pair is exact: summed shard
statistics followed by one conjugate update reproduces full-batch
``vb_step`` bit-for-bit math (tests/test_cli_mapreduce.py).  On-chip
data parallelism (``beer_tpu/parallel``) is the fast path when the
devices share a mesh; this path covers fleets of unconnected hosts.
"""

from __future__ import annotations

from pathlib import Path


def setup(parser):
    parser.add_argument("model", help="input model (.mdl)")
    parser.add_argument("feats", help="feature archive (.npz or .bar)")
    parser.add_argument("out", help="output statistics file (.acc)")
    parser.add_argument(
        "--shard", default="1/1",
        help="'i/N' (1-based): accumulate utterances i-1, i-1+N, ... "
        "(strided so shards balance across a length-sorted corpus)",
    )
    parser.add_argument(
        "--batch-size", type=int, default=512,
        help="utterances per scoring batch (0 = whole shard at once); "
        "batches pad to a fixed batch size and a rounded time length so "
        "a shard compiles O(1) times, not O(batches)",
    )


def _parse_shard(spec: str):
    try:
        i, n = spec.split("/")
        i, n = int(i), int(n)
    except ValueError:
        raise SystemExit(f"--shard must be 'i/N', got {spec!r}")
    if not 1 <= i <= n:
        raise SystemExit(f"--shard index out of range: {spec}")
    return i, n


def _round_up(t: int, quantum: int = 128) -> int:
    return -(-t // quantum) * quantum


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from beer_tpu import io as bio
    from beer_tpu.utils import load_model, save_model
    from beer_tpu.vbi import elbo_and_stats

    shard, n_shards = _parse_shard(args.shard)

    if args.feats.endswith(".bar"):
        archive = bio.Archive(args.feats)
    else:  # convert once next to the npz for mmap'd shard reads
        bar_path = args.feats + ".bar"
        if not Path(bar_path).exists():
            bio.convert_npz(args.feats, bar_path)
        archive = bio.Archive(bar_path)

    indices = list(range(shard - 1, len(archive), n_shards))
    if not indices:
        raise SystemExit(
            f"shard {args.shard}: no utterances (corpus has {len(archive)})"
        )
    model = load_model(args.model)
    estep = jax.jit(lambda m, x, msk: elbo_and_stats(m, x, mask=msk))

    # Static batch shape only matters when there are multiple batches;
    # a single-batch shard should not zero-pad 5 utterances up to 512.
    batch = min(args.batch_size or len(indices), len(indices))
    total_elbo, total_frames, n_batches = 0.0, 0.0, 0
    acc_sum = None
    for lo in range(0, len(indices), batch):
        chunk = indices[lo : lo + batch]
        t_max = _round_up(max(archive[i].shape[0] for i in chunk))
        data, mask = archive.padded_batch(chunk, t_max=t_max)
        if len(chunk) < batch:  # keep the batch shape static too
            pad = batch - len(chunk)
            data = np.concatenate(
                [data, np.zeros((pad,) + data.shape[1:], data.dtype)]
            )
            mask = np.concatenate(
                [mask, np.zeros((pad,) + mask.shape[1:], mask.dtype)]
            )
        elbo, acc = estep(model, jnp.asarray(data), jnp.asarray(mask))
        acc_sum = acc if acc_sum is None else jax.tree.map(
            jnp.add, acc_sum, acc
        )
        total_elbo += float(elbo)
        total_frames += float(mask.sum())
        n_batches += 1

    # each batch ELBO subtracts the full KL(q||p) once; keep it exactly
    # once in the shard total so the reduce step can account per shard
    kl = float(model.kl_div_posterior_prior())
    total_elbo += kl * (n_batches - 1)

    save_model(
        {
            "acc": acc_sum,
            "elbo": jnp.float32(total_elbo),
            "frames": jnp.float32(total_frames),
            "n_utts": jnp.int32(len(indices)),
            "shard": jnp.int32(shard),
            "n_shards": jnp.int32(n_shards),
        },
        args.out,
    )
    print(
        f"shard {args.shard}: {len(indices)} utts, "
        f"{total_frames:.0f} frames, elbo/frame = "
        f"{total_elbo / max(total_frames, 1):.6f} -> {args.out}"
    )
