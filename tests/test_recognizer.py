"""Supervised HMM-GMM phone recognizer (BASELINE config 3).

Synthetic phone recognition: per-phone bimodal emissions (so GMM states
matter), supervised training on per-utterance transcription graphs,
forced alignment, then phone-loop decoding with the trained emissions —
checked with edit-distance phone error rate.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu.models import graph as graph_mod
from beer_tpu.models.hmm import HMM
from beer_tpu.models.mixture import MixtureSet
from beer_tpu.vbi import vb_step

N_PHONES, STATES, NCOMP, D = 4, 2, 2, 3


def make_corpus(rng, n_utts=20, max_phones=6):
    """Each phone-state has a bimodal emission (2 modes +/- offset)."""
    base = rng.normal(size=(N_PHONES * STATES, D)) * 3.0
    offset = rng.normal(size=(N_PHONES * STATES, D))
    transcriptions, datas = [], []
    for _ in range(n_utts):
        phones = list(rng.integers(N_PHONES, size=int(rng.integers(2, max_phones + 1))))
        frames = []
        for ph in phones:
            for st in range(STATES):
                dwell = int(rng.integers(3, 7))
                pdf = ph * STATES + st
                mode = rng.integers(2, size=dwell)[:, None]
                mu = base[pdf] + (2 * mode - 1) * offset[pdf]
                frames.append(mu + 0.3 * rng.normal(size=(dwell, D)))
        transcriptions.append(phones)
        datas.append(np.concatenate(frames))
    t_max = max(len(x) for x in datas)
    data = np.zeros((n_utts, t_max, D))
    mask = np.zeros((n_utts, t_max))
    for i, x in enumerate(datas):
        data[i, : len(x)] = x
        mask[i, : len(x)] = 1
    return transcriptions, data, mask


def make_emissions(data, mask, key=2):
    flat = data.reshape(-1, D)[mask.reshape(-1) > 0]
    nset = beer_tpu.NormalSet.create(
        jnp.asarray(flat.mean(0)), jnp.asarray(np.cov(flat.T)),
        size=N_PHONES * STATES * NCOMP, cov_type="full", noise_std=2.0,
        key=jax.random.PRNGKey(key),
    )
    return MixtureSet.create(nset, nmix=N_PHONES * STATES)


def edit_distance(a, b):
    m, n = len(a), len(b)
    dp = np.arange(n + 1)
    for i in range(1, m + 1):
        prev = dp.copy()
        dp[0] = i
        for j in range(1, n + 1):
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                        prev[j - 1] + (a[i - 1] != b[j - 1]))
    return dp[n]


@pytest.fixture(scope="module")
def trained(rng=None):
    rng = np.random.default_rng(7)
    transcriptions, data, mask = make_corpus(rng)
    graphs = graph_mod.transcription_graphs(
        transcriptions, N_PHONES, STATES, dtype=jnp.float64
    )
    hmm = HMM.create(graphs, make_emissions(data, mask))
    x, m = jnp.asarray(data), jnp.asarray(mask)
    step = jax.jit(vb_step)
    elbos = []
    for _ in range(25):
        elbo, hmm = step(hmm, x, mask=m)
        elbos.append(float(elbo) / mask.sum())
    return transcriptions, data, mask, hmm, elbos


def test_supervised_elbo_monotone(trained):
    *_, elbos = trained
    diffs = np.diff(elbos)
    assert np.all(diffs > -1e-8), f"min diff {diffs.min()}"


def test_forced_alignment(trained):
    """Viterbi on the transcription graph must traverse all phones in order."""
    transcriptions, data, mask, hmm, _ = trained
    x, m = jnp.asarray(data), jnp.asarray(mask)
    paths, _ = hmm.decode(x, m)
    paths = np.asarray(paths)
    for i, phones in enumerate(transcriptions):
        ln = int(mask[i].sum())
        states = paths[i, :ln]
        assert (np.diff(states) >= 0).all()  # left-to-right
        # graph position -> transcription slot; every slot must be visited
        # (repeated phones occupy distinct slots, unlike pdf collapsing)
        slots = np.unique(states // STATES)
        np.testing.assert_array_equal(slots, np.arange(len(phones)))


def test_phone_loop_recognition(trained):
    """Decode with a phone-loop over the trained emissions; PER must be low."""
    transcriptions, data, mask, hmm, _ = trained
    loop_graph = graph_mod.phone_loop_graph(N_PHONES, STATES).compile(jnp.float64)
    recognizer = HMM.create(loop_graph, hmm.modelset)
    x, m = jnp.asarray(data), jnp.asarray(mask)
    paths, _ = recognizer.decode(x, m)
    paths = np.asarray(paths)
    def collapse(seq):
        return [seq[0]] + [p for j, p in enumerate(seq[1:], 1) if p != seq[j - 1]]

    errs, total = 0, 0
    for i, truth in enumerate(transcriptions):
        ln = int(mask[i].sum())
        hyp = collapse(list(paths[i, :ln] // STATES))
        # consecutive repeats in the truth are unrecoverable after label
        # collapsing (u->u loop arcs carry no boundary) — score collapsed
        ref = collapse(list(truth))
        errs += edit_distance(hyp, ref)
        total += len(ref)
    per = errs / total
    assert per < 0.1, f"phone error rate too high: {per:.3f}"


def test_bigram_lm_decoding(trained):
    """A bigram unit LM estimated from the training transcriptions should
    not hurt (and typically helps) recognition vs the uniform loop."""
    from beer_tpu.models.graph import bigram_lm

    transcriptions, data, mask, hmm, _ = trained
    lm_trans, lm_init = bigram_lm(
        [list(map(int, t)) for t in transcriptions], N_PHONES
    )
    np.testing.assert_allclose(lm_trans.sum(1), 1.0, rtol=1e-12)
    loop_graph = graph_mod.phone_loop_graph(
        N_PHONES, STATES, lm_trans=lm_trans, lm_init=lm_init
    ).compile(jnp.float64)
    recognizer = HMM.create(loop_graph, hmm.modelset)
    x, m = jnp.asarray(data), jnp.asarray(mask)
    paths, _ = recognizer.decode(x, m)
    paths = np.asarray(paths)

    def collapse(seq):
        return [seq[0]] + [p for j, p in enumerate(seq[1:], 1) if p != seq[j - 1]]

    errs, total = 0, 0
    for i, truth in enumerate(transcriptions):
        ln = int(mask[i].sum())
        hyp = collapse(list(paths[i, :ln] // STATES))
        ref = collapse(list(truth))
        errs += edit_distance(hyp, ref)
        total += len(ref)
    assert errs / total < 0.1, f"bigram-LM PER too high: {errs/total:.3f}"


def test_shared_vs_batched_transcription_graphs(rng):
    """The shared-matrix fast path (one (S, S) left-to-right chain +
    per-utterance final/pdf_ids) must agree with the per-utterance
    (B, S, S) oracle on ragged transcription lengths: log Z, state
    posteriors, accumulated stats, and Viterbi alignments."""
    transcriptions, data, mask = make_corpus(rng, n_utts=8, max_phones=5)
    x, m = jnp.asarray(data), jnp.asarray(mask)
    emissions = make_emissions(data, mask)

    out = {}
    for shared in (True, False):
        graphs = graph_mod.transcription_graphs(
            transcriptions, N_PHONES, STATES, dtype=jnp.float64, shared=shared
        )
        assert graphs.log_trans.ndim == (2 if shared else 3)
        hmm = HMM.create(graphs, emissions)
        stats = hmm.sufficient_statistics(x)
        log_z, cache = hmm.infer(stats, mask=m)
        acc = hmm.accumulate(stats, cache)
        paths, scores = hmm.decode(x, m)
        out[shared] = (log_z, cache["posteriors"], acc, paths, scores)

    log_z_s, post_s, acc_s, paths_s, scores_s = out[True]
    log_z_b, post_b, acc_b, paths_b, scores_b = out[False]
    np.testing.assert_allclose(np.asarray(log_z_s), np.asarray(log_z_b),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(post_s), np.asarray(post_b),
                               atol=1e-10)
    for a, b in zip(jax.tree.leaves(acc_s), jax.tree.leaves(acc_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)
    # Viterbi: identical scores; identical paths on valid frames
    np.testing.assert_allclose(np.asarray(scores_s), np.asarray(scores_b),
                               rtol=1e-10, atol=1e-10)
    valid = np.asarray(mask) > 0
    np.testing.assert_array_equal(np.asarray(paths_s)[valid],
                                  np.asarray(paths_b)[valid])
