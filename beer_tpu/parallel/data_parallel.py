"""Data-parallel VB-EM: shard_map over a ``data`` mesh axis + psum of stats.

The E-step is embarrassingly parallel over utterances; the statistics
pytree is a fixed small size (O(components · stats_dim)), so one ``psum``
over ICI per step replaces the reference's stats-file reduce exactly
(same sum, different wire).  After the psum every shard applies the same
deterministic conjugate update, so parameters stay replicated without a
broadcast.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(x, n_shards: int):
    """Pad the leading (batch) axis to a multiple of n_shards.

    Returns (padded_x, pad_mask (B',)) — padded entries get mask 0 so they
    contribute nothing to statistics.
    """
    import numpy as np

    b = x.shape[0]
    b_pad = -(-b // n_shards) * n_shards
    pad = b_pad - b
    x_p = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)]) if pad else x
    valid = np.concatenate([np.ones(b, x.dtype), np.zeros(pad, x.dtype)])
    return x_p, valid


def data_parallel_elbo_and_stats(
    model, x, mask, axis_name: str = "data", datascale: float = 1.0
):
    """Runs INSIDE shard_map: local E-step, psum of (llh, stats) over ICI.

    ``mask`` zeroes padded utterances *and* padded frames.  The KL term is
    computed once from the (replicated) parameters — outside the psum.
    """
    stats = model.sufficient_statistics(x)
    llh, cache = model.infer(stats, mask=mask)
    # zero out contributions of padded utterances (all-zero masks)
    seq_valid = (mask.sum(-1) > 0).astype(llh.dtype)
    llh_sum = jax.lax.psum((llh * seq_valid).sum(), axis_name)
    acc = model.accumulate(stats, cache)
    acc = jax.lax.psum(acc, axis_name)
    elbo = datascale * llh_sum - model.kl_div_posterior_prior()
    if datascale != 1.0:
        acc = jax.tree.map(lambda s: datascale * s, acc)
    return elbo, acc


def make_vb_train_step(
    mesh: Mesh,
    axis_name: str = "data",
    lrate: float = 1.0,
    datascale: float = 1.0,
):
    """Build the jitted data-parallel VB-EM step.

    Usage::

        mesh = make_mesh()
        step = make_vb_train_step(mesh)
        x, valid = shard_batch(data, mesh.devices.size)   # (B', T, D)
        mask = mask * valid[:, None]
        for epoch in range(E):
            elbo, model = step(model, x, mask)

    Model parameters are replicated (spec ``P()``); the batch is sharded
    on its leading axis.  The conjugate update runs identically on every
    shard after the psum, so the output model is replicated by
    construction.
    """

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(model, x, mask):
        elbo, acc = data_parallel_elbo_and_stats(
            model, x, mask, axis_name, datascale
        )
        new_model = model.vb_update(acc, lrate)
        return elbo, new_model

    return step


def make_supervised_vb_train_step(
    mesh: Mesh,
    axis_name: str = "data",
    lrate: float = 1.0,
):
    """Data-parallel supervised training with per-utterance graphs.

    The transcription graphs (batched CompiledGraph arrays) shard with
    the batch while the emission parameters stay replicated; the psum of
    the statistics pytree is unchanged.  Usage::

        step = make_supervised_vb_train_step(mesh)
        elbo, emissions = step(emissions, graphs, x, mask)

    where ``graphs = transcription_graphs(...)`` with a leading batch
    axis divisible by the mesh size.
    """
    from beer_tpu.models.hmm import HMM

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(emissions, graphs, x, mask):
        model = HMM(graph=graphs, modelset=emissions)
        elbo, acc = data_parallel_elbo_and_stats(model, x, mask, axis_name)
        new_model = model.vb_update(acc, lrate)
        return elbo, new_model.modelset

    return step
