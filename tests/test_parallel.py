"""Multi-chip tests on the 8-virtual-device CPU mesh (SURVEY §4e).

The invariant: psum-of-statistics over shards == single-device statistics
on the concatenated batch (exact up to float reduction order), hence the
data-parallel training trajectory matches single-device training.
"""

import numpy as np
import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu import parallel
from beer_tpu.models import graph as graph_mod
from beer_tpu.models.hmm import HMM
from beer_tpu.vbi import vb_step


def make_sequences(rng, b=16, t_len=30, d=2, dtype=np.float64):
    means = np.array([[-3.0] * d, [0.0] * d, [3.0] * d])
    data = np.zeros((b, t_len, d), dtype)
    mask = np.zeros((b, t_len), dtype)
    for i in range(b):
        ln = int(rng.integers(t_len // 2, t_len + 1))
        states = np.clip((3 * np.arange(ln)) // ln, 0, 2)
        data[i, :ln] = means[states] + 0.5 * rng.normal(size=(ln, d))
        mask[i, :ln] = 1
    return data, mask


def make_hmm(data, mask, key=5):
    d = data.shape[-1]
    flat = data.reshape(-1, d)[mask.reshape(-1) > 0]
    nset = beer_tpu.NormalSet.create(
        jnp.asarray(flat.mean(0)), jnp.asarray(np.cov(flat.T)),
        size=3, cov_type="full", noise_std=1.0, key=jax.random.PRNGKey(key),
    )
    return HMM.create(graph_mod.left_to_right(3).compile(jnp.float64), nset)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_matches_single_device(rng):
    data, mask = make_sequences(rng)
    hmm = make_hmm(data, mask)
    mesh = parallel.make_mesh()

    step_dp = parallel.make_vb_train_step(mesh)
    x, m = jnp.asarray(data), jnp.asarray(mask)

    hmm_dp = hmm
    hmm_single = hmm
    for it in range(5):
        elbo_dp, hmm_dp = step_dp(hmm_dp, x, m)
        elbo_single, hmm_single = vb_step(hmm_single, x, mask=m)
        np.testing.assert_allclose(
            float(elbo_dp), float(elbo_single), rtol=1e-9,
            err_msg=f"iter {it}",
        )
    for a, b in zip(jax.tree.leaves(hmm_dp), jax.tree.leaves(hmm_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_dp_with_padded_batch(rng):
    """Batch not divisible by #devices: padded utterances contribute zero."""
    data, mask = make_sequences(rng, b=13)
    hmm = make_hmm(data, mask)
    mesh = parallel.make_mesh()
    x_p, valid = parallel.shard_batch(data, 8)
    mask_p, _ = parallel.shard_batch(mask, 8)
    mask_p = mask_p * valid[:, None]

    step_dp = parallel.make_vb_train_step(mesh)
    elbo_dp, hmm_dp = step_dp(hmm, jnp.asarray(x_p), jnp.asarray(mask_p))
    elbo_single, hmm_single = vb_step(hmm, jnp.asarray(data), mask=jnp.asarray(mask))
    np.testing.assert_allclose(float(elbo_dp), float(elbo_single), rtol=1e-9)
    for a, b in zip(jax.tree.leaves(hmm_dp), jax.tree.leaves(hmm_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_gmm_dp(rng):
    """Data-parallel GMM (frame-sharded): psum stats == full-batch stats."""
    from beer_tpu.parallel.data_parallel import data_parallel_elbo_and_stats
    from functools import partial
    from jax.sharding import PartitionSpec as P

    frames = rng.normal(size=(800, 2)) + np.array([2.0, -1.0])
    nset = beer_tpu.NormalSet.create(
        jnp.asarray(frames.mean(0)), jnp.asarray(np.cov(frames.T)),
        size=4, cov_type="full", noise_std=1.0, key=jax.random.PRNGKey(0),
    )
    gmm = beer_tpu.Mixture.create(nset)
    mesh = parallel.make_mesh()

    # GMM "mask" = per-frame validity; reuse the sequence machinery by
    # treating frames as length-1 sequences is unnecessary — Mixture.infer
    # has no mask, so psum plain stats instead.
    @jax.jit
    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("data")), out_specs=(P(), P()),
        check_vma=False,
    )
    def dp_estep(model, x):
        stats = model.sufficient_statistics(x)
        llh, cache = model.infer(stats)
        acc = model.accumulate(stats, cache)
        return jax.lax.psum(llh.sum(), "data"), jax.lax.psum(acc, "data")

    llh_dp, acc_dp = dp_estep(gmm, jnp.asarray(frames))
    stats = gmm.sufficient_statistics(jnp.asarray(frames))
    llh, cache = gmm.infer(stats)
    acc = gmm.accumulate(stats, cache)
    np.testing.assert_allclose(float(llh_dp), float(llh.sum()), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(acc_dp), jax.tree.leaves(acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)


def test_supervised_dp_matches_single_device(rng):
    """Per-utterance transcription graphs sharded with the batch."""
    from beer_tpu.models.graph import transcription_graphs
    from beer_tpu.models.hmm import HMM
    from beer_tpu.models.mixture import MixtureSet

    n_phones, states, d = 3, 2, 2
    transcriptions = [
        list(rng.integers(n_phones, size=int(rng.integers(2, 5))))
        for _ in range(8)
    ]
    datas = []
    base = rng.normal(size=(n_phones * states, d)) * 3.0
    for phones in transcriptions:
        frames = []
        for ph in phones:
            for st in range(states):
                dwell = int(rng.integers(3, 6))
                frames.append(base[ph * states + st] + 0.3 * rng.normal(size=(dwell, d)))
        datas.append(np.concatenate(frames))
    t_max = max(map(len, datas))
    data = np.zeros((8, t_max, d))
    mask = np.zeros((8, t_max))
    for i, seq in enumerate(datas):
        data[i, : len(seq)] = seq
        mask[i, : len(seq)] = 1

    graphs = transcription_graphs(transcriptions, n_phones, states, dtype=jnp.float64)
    flat = data.reshape(-1, d)[mask.reshape(-1) > 0]
    nset = beer_tpu.NormalSet.create(
        jnp.asarray(flat.mean(0)), jnp.asarray(np.cov(flat.T)),
        size=n_phones * states * 2, cov_type="diagonal", noise_std=1.0,
        key=jax.random.PRNGKey(1),
    )
    emissions = MixtureSet.create(nset, nmix=n_phones * states)

    mesh = parallel.make_mesh()
    step = parallel.make_supervised_vb_train_step(mesh)
    x, m = jnp.asarray(data), jnp.asarray(mask)

    em_dp = emissions
    hmm_single = HMM.create(graphs, emissions)
    for it in range(3):
        elbo_dp, em_dp = step(em_dp, graphs, x, m)
        elbo_single, hmm_single = vb_step(hmm_single, x, mask=m)
        np.testing.assert_allclose(
            float(elbo_dp), float(elbo_single), rtol=1e-9, err_msg=f"iter {it}"
        )
    for a, b in zip(jax.tree.leaves(em_dp), jax.tree.leaves(hmm_single.modelset)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_minibatch_dp_matches_single_device(rng):
    """make_vb_minibatch_step (traced datascale) == single-device
    stochastic vb_step on the same minibatch, over 8 virtual devices."""
    import beer_tpu
    from beer_tpu import parallel
    from beer_tpu.models.phoneloop import PhoneLoop
    from beer_tpu.vbi import vb_step

    b, t, d = 16, 20, 3
    data = rng.normal(size=(b, t, d)).astype(np.float32)
    lengths = rng.integers(t // 2, t + 1, size=b)
    mask = (np.arange(t)[None] < lengths[:, None]).astype(np.float32)
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(d), jnp.ones(d), size=6, cov_type="diagonal",
        noise_std=0.5, key=jax.random.PRNGKey(0),
    )
    loop = PhoneLoop.create(3, 2, nset)
    x, m = jnp.asarray(data), jnp.asarray(mask)
    datasize, n_valid = 64, b  # pretend this is one minibatch of a corpus

    elbo_ref, model_ref = jax.jit(
        lambda mo, xx, mm: vb_step(mo, xx, datasize=datasize, mask=mm)
    )(loop, x, m)

    mesh = parallel.make_mesh(8)
    step = parallel.make_vb_minibatch_step(mesh)
    elbo_dp, model_dp = step(loop, x, m, jnp.float32(datasize / n_valid))
    np.testing.assert_allclose(float(elbo_ref), float(elbo_dp), rtol=1e-5)
    for a, c in zip(jax.tree.leaves(model_ref), jax.tree.leaves(model_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4,
                                   atol=1e-6)


def test_dp_estep_matches_elbo_and_stats(rng):
    """make_vb_estep == elbo_and_stats on replicated model."""
    import beer_tpu
    from beer_tpu import parallel
    from beer_tpu.vbi import elbo_and_stats

    n, d, k = 64, 3, 4
    data = rng.normal(size=(n, 8, d)).astype(np.float32)
    mask = np.ones((n, 8), np.float32)
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(d), jnp.ones(d), size=k, cov_type="diagonal",
        noise_std=0.5, key=jax.random.PRNGKey(1),
    )
    from beer_tpu.models.graph import ergodic
    from beer_tpu.models.hmm import HMM

    hmm = HMM.create(ergodic(k), nset)
    x, m = jnp.asarray(data), jnp.asarray(mask)
    elbo_ref, acc_ref = jax.jit(
        lambda mo, xx, mm: elbo_and_stats(mo, xx, mask=mm))(hmm, x, m)
    estep = parallel.make_vb_estep(parallel.make_mesh(8))
    elbo_dp, acc_dp = estep(hmm, x, m)
    np.testing.assert_allclose(float(elbo_ref), float(elbo_dp), rtol=1e-5)
    for a, c in zip(jax.tree.leaves(acc_ref), jax.tree.leaves(acc_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4,
                                   atol=1e-5)
