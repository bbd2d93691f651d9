"""HMM layer tests (BASELINE config 2).

Oracles, mirroring the reference test strategy (SURVEY.md §4):
brute-force enumeration over all state paths on tiny (T, S); the
independent torch sequential forward-backward (tests/torch_ref.py);
sequential scan ≡ associative scan; masked padded batches ≡ per-sequence
results; ELBO monotonicity of full VB-EM training.
"""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu.models import graph as graph_mod
from beer_tpu.models.hmm import HMM
from beer_tpu.ops import semiring_scan
from beer_tpu.vbi import vb_step


def random_hmm_params(rng, s, dtype=np.float64):
    trans = rng.uniform(0.1, 1.0, size=(s, s))
    trans /= trans.sum(1, keepdims=True)
    init = rng.uniform(0.1, 1.0, size=s)
    init /= init.sum()
    final = rng.uniform(0.1, 1.0, size=s)
    return (
        np.log(trans).astype(dtype),
        np.log(init).astype(dtype),
        np.log(final).astype(dtype),
    )


def brute_force_logz(llh, log_trans, log_init, log_final):
    """Σ over all paths of exp(score) — exact, exponential cost."""
    t_len, s = llh.shape
    total = []
    for path in itertools.product(range(s), repeat=t_len):
        score = log_init[path[0]] + llh[0, path[0]]
        for t in range(1, t_len):
            score += log_trans[path[t - 1], path[t]] + llh[t, path[t]]
        score += log_final[path[-1]]
        total.append(score)
    m = max(total)
    return m + np.log(np.exp(np.array(total) - m).sum())


def brute_force_best(llh, log_trans, log_init, log_final):
    t_len, s = llh.shape
    best, best_path = -np.inf, None
    for path in itertools.product(range(s), repeat=t_len):
        score = log_init[path[0]] + llh[0, path[0]]
        for t in range(1, t_len):
            score += log_trans[path[t - 1], path[t]] + llh[t, path[t]]
        score += log_final[path[-1]]
        if score > best:
            best, best_path = score, path
    return best, np.array(best_path)


class TestScans:
    def test_forward_vs_bruteforce(self, rng):
        t_len, s = 5, 3
        lt, li, lf = random_hmm_params(rng, s)
        llh = rng.normal(size=(1, t_len, s))
        fb = semiring_scan.forward_backward(
            jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li), jnp.asarray(lf)
        )
        oracle = brute_force_logz(llh[0], lt, li, lf)
        np.testing.assert_allclose(float(fb.log_z[0]), oracle, rtol=1e-10)

    def test_posteriors_sum_to_one(self, rng):
        t_len, s = 12, 4
        lt, li, lf = random_hmm_params(rng, s)
        llh = rng.normal(size=(2, t_len, s))
        fb = semiring_scan.forward_backward(
            jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li), jnp.asarray(lf)
        )
        np.testing.assert_allclose(
            np.asarray(fb.posteriors).sum(-1), 1.0, rtol=1e-8
        )

    def test_torch_parity(self, rng):
        import torch

        from tests.torch_ref import torch_forward_backward

        t_len, s = 50, 8
        lt, li, lf = random_hmm_params(rng, s)
        llh = rng.normal(size=(t_len, s))
        fb = semiring_scan.forward_backward(
            jnp.asarray(llh[None]), jnp.asarray(lt), jnp.asarray(li), jnp.asarray(lf)
        )
        la, lb, lz = torch_forward_backward(
            torch.tensor(llh), torch.tensor(lt), torch.tensor(li), torch.tensor(lf)
        )
        np.testing.assert_allclose(float(fb.log_z[0]), float(lz), rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(fb.log_alpha[0]), la.numpy(), rtol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(fb.log_beta[0]), lb.numpy(), rtol=1e-8, atol=1e-8
        )

    def test_assoc_scan_matches_sequential(self, rng):
        t_len, s, b = 33, 5, 3
        lt, li, lf = random_hmm_params(rng, s)
        llh = rng.normal(size=(b, t_len, s))
        lengths = np.array([33, 20, 7])
        mask = (np.arange(t_len)[None] < lengths[:, None]).astype(np.float64)
        la_seq, last_seq = semiring_scan.forward(
            jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li), jnp.asarray(mask)
        )
        la_par, last_par = semiring_scan.forward_assoc(
            jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li), jnp.asarray(mask)
        )
        np.testing.assert_allclose(
            np.asarray(last_seq), np.asarray(last_par), rtol=1e-8
        )
        for i, ln in enumerate(lengths):
            np.testing.assert_allclose(
                np.asarray(la_seq[i, :ln]), np.asarray(la_par[i, :ln]), rtol=1e-8
            )

    def test_assoc_scan_chunked_matches_sequential(self, rng):
        """Blockwise chunking (memory-bounded) is exact, incl. ragged
        chunk tails and chunk sizes that don't divide T."""
        t_len, s, b = 33, 5, 3
        lt, li, _ = random_hmm_params(rng, s)
        llh = rng.normal(size=(b, t_len, s))
        lengths = np.array([33, 20, 7])
        mask = (np.arange(t_len)[None] < lengths[:, None]).astype(np.float64)
        la_seq, last_seq = semiring_scan.forward(
            jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li), jnp.asarray(mask)
        )
        for chunk in (4, 8, 16, 33, 64):
            la_c, last_c = semiring_scan.forward_assoc(
                jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li),
                jnp.asarray(mask), chunk=chunk,
            )
            np.testing.assert_allclose(
                np.asarray(last_seq), np.asarray(last_c), rtol=1e-8,
                err_msg=f"chunk={chunk}",
            )
            for i, ln in enumerate(lengths):
                np.testing.assert_allclose(
                    np.asarray(la_seq[i, :ln]), np.asarray(la_c[i, :ln]),
                    rtol=1e-7, err_msg=f"chunk={chunk} seq={i}",
                )

    def test_masked_batch_equals_per_sequence(self, rng):
        s = 4
        lt, li, lf = random_hmm_params(rng, s)
        lengths = [11, 6, 3]
        t_max = max(lengths)
        seqs = [rng.normal(size=(ln, s)) for ln in lengths]
        llh = np.zeros((len(seqs), t_max, s))
        mask = np.zeros((len(seqs), t_max))
        for i, q in enumerate(seqs):
            llh[i, : len(q)] = q
            mask[i, : len(q)] = 1.0
        fb = semiring_scan.forward_backward(
            jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li), jnp.asarray(lf),
            jnp.asarray(mask),
        )
        for i, q in enumerate(seqs):
            fb1 = semiring_scan.forward_backward(
                jnp.asarray(q[None]), jnp.asarray(lt), jnp.asarray(li), jnp.asarray(lf)
            )
            np.testing.assert_allclose(
                float(fb.log_z[i]), float(fb1.log_z[0]), rtol=1e-9
            )
            np.testing.assert_allclose(
                np.asarray(fb.posteriors[i, : lengths[i]]),
                np.asarray(fb1.posteriors[0]),
                rtol=1e-7, atol=1e-10,
            )

    def test_viterbi_vs_bruteforce(self, rng):
        t_len, s = 6, 3
        lt, li, lf = random_hmm_params(rng, s)
        llh = rng.normal(size=(1, t_len, s)) * 2.0
        paths, scores = semiring_scan.viterbi(
            jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li), jnp.asarray(lf)
        )
        best, best_path = brute_force_best(llh[0], lt, li, lf)
        np.testing.assert_allclose(float(scores[0]), best, rtol=1e-10)
        np.testing.assert_array_equal(np.asarray(paths[0]), best_path)

    def test_expected_transition_counts(self, rng):
        """ξ-counts: rows of Σ_t ξ_t must equal state occupancies at t<T−1."""
        t_len, s = 9, 3
        lt, li, lf = random_hmm_params(rng, s)
        llh = rng.normal(size=(1, t_len, s))
        g = graph_mod.CompiledGraph(
            log_init=jnp.asarray(li), log_final=jnp.asarray(lf),
            log_trans=jnp.asarray(lt), pdf_ids=jnp.arange(s, dtype=jnp.int32),
            n_states=s, n_pdfs=s,
        )
        fb = semiring_scan.forward_backward_probs(
            jnp.asarray(llh), g.log_trans, g.log_init, g.log_final
        )
        hmm = HMM(graph=g, modelset=None)
        counts = hmm.expected_transition_counts(
            {"fb": fb, "llh_states": jnp.asarray(llh), "mask": None}
        )
        occ = np.asarray(fb.posteriors[0, :-1]).sum(0)
        np.testing.assert_allclose(np.asarray(counts).sum(1), occ, rtol=1e-8)


class TestGraph:
    def test_left_to_right(self):
        g = graph_mod.left_to_right(3, self_loop=0.5)
        cg = g.compile(jnp.float64)
        trans = np.exp(np.asarray(cg.log_trans))
        np.testing.assert_allclose(np.diag(trans), 0.5)
        np.testing.assert_allclose(trans[0, 1], 0.5)
        # rows sum to 1 including the final weight
        row_sums = trans.sum(1) + np.exp(np.asarray(cg.log_final))
        np.testing.assert_allclose(row_sums, 1.0)

    def test_phone_loop_stochastic(self):
        g = graph_mod.phone_loop_graph(4, 3)
        cg = g.compile(jnp.float64)
        trans = np.exp(np.asarray(cg.log_trans))
        row_sums = trans.sum(1) + np.exp(np.asarray(cg.log_final))
        np.testing.assert_allclose(row_sums, 1.0)
        np.testing.assert_allclose(np.exp(np.asarray(cg.log_init)).sum(), 1.0)
        assert cg.n_pdfs == 12


class TestHMMTraining:
    def make_sequences(self, rng, b=8, t_len=40, dtype=np.float64):
        """Left-to-right 3-state sequences with distinct emission means."""
        means = np.array([[-3.0], [0.0], [3.0]])
        xs, lens = [], []
        for _ in range(b):
            ln = int(rng.integers(t_len // 2, t_len + 1))
            # dwell roughly uniformly in each third
            states = np.clip((3 * np.arange(ln)) // ln, 0, 2)
            xs.append(means[states] + 0.5 * rng.normal(size=(ln, 1)))
            lens.append(ln)
        data = np.zeros((b, t_len, 1), dtype)
        mask = np.zeros((b, t_len), dtype)
        for i, (x, ln) in enumerate(zip(xs, lens)):
            data[i, :ln] = x
            mask[i, :ln] = 1
        return data, mask

    def test_elbo_monotone_and_recovers_means(self, rng):
        data, mask = self.make_sequences(rng)
        flat = data.reshape(-1, 1)[mask.reshape(-1) > 0]
        nset = beer_tpu.NormalSet.create(
            jnp.asarray(flat.mean(0)), jnp.asarray(np.cov(flat.T).reshape(1, 1)),
            size=3, cov_type="full", noise_std=1.0, key=jax.random.PRNGKey(5),
        )
        g = graph_mod.left_to_right(3, self_loop=0.5)
        hmm = HMM.create(g.compile(jnp.float64), nset)
        x, m = jnp.asarray(data), jnp.asarray(mask)
        elbos = []
        for _ in range(20):
            elbo, hmm = vb_step(hmm, x, mask=m)
            elbos.append(float(elbo) / mask.sum())
        diffs = np.diff(elbos)
        assert np.all(diffs > -1e-9), f"ELBO decreased: {elbos}"
        learned = np.sort(np.asarray(hmm.modelset.means()).ravel())
        np.testing.assert_allclose(learned, [-3.0, 0.0, 3.0], atol=0.3)

    def test_decode_segmentation(self, rng):
        data, mask = self.make_sequences(rng, b=4)
        flat = data.reshape(-1, 1)[mask.reshape(-1) > 0]
        nset = beer_tpu.NormalSet.create(
            jnp.asarray(flat.mean(0)), jnp.asarray(np.cov(flat.T).reshape(1, 1)),
            size=3, cov_type="full", noise_std=1.0, key=jax.random.PRNGKey(5),
        )
        hmm = HMM.create(
            graph_mod.left_to_right(3).compile(jnp.float64), nset
        )
        x, m = jnp.asarray(data), jnp.asarray(mask)
        for _ in range(20):
            _, hmm = vb_step(hmm, x, mask=m)
        paths, _ = hmm.decode(x, m)
        paths = np.asarray(paths)
        # paths must be monotone non-decreasing (left-to-right topology)
        for i in range(len(paths)):
            ln = int(mask[i].sum())
            assert np.all(np.diff(paths[i, :ln]) >= 0)
            assert paths[i, 0] == 0 and paths[i, ln - 1] == 2


def test_extreme_llh_magnitudes_stay_finite(rng):
    """Regression: poorly-matched models give llh ~ -2000/frame; the
    scaled-pass probability floor must not poison posteriors/xi-counts
    (seen as NaN stats on real fbank features, f32)."""
    t_len, s = 120, 6
    lt, li, lf = random_hmm_params(rng, s, dtype=np.float32)
    llh = (rng.normal(size=(2, t_len, s)) * 200 - 1500).astype(np.float32)
    mask = np.ones((2, t_len), np.float32)
    mask[1, 80:] = 0
    fb = semiring_scan.forward_backward(
        jnp.asarray(llh), jnp.asarray(lt.astype(np.float32)),
        jnp.asarray(li.astype(np.float32)), jnp.asarray(lf.astype(np.float32)),
        jnp.asarray(mask),
    )
    assert np.isfinite(np.asarray(fb.log_z)).all()
    post = np.asarray(fb.posteriors)
    assert np.isfinite(post).all()
    np.testing.assert_allclose(post[0].sum(-1), 1.0, rtol=1e-5)
    xi = semiring_scan.expected_transition_counts(
        fb.log_alpha, fb.log_beta, jnp.asarray(llh),
        jnp.asarray(lt.astype(np.float32)), fb.log_z, jnp.asarray(mask),
    )
    xi = np.asarray(xi)
    assert np.isfinite(xi).all() and (xi >= 0).all()
    # total transition mass = number of valid transitions
    np.testing.assert_allclose(xi.sum(), (mask[:, 1:]).sum(), rtol=1e-4)


def test_xi_block_restriction_matches_full(rng):
    """rows/cols-restricted xi equals the corresponding full sub-block."""
    t_len, s = 15, 5
    lt, li, lf = random_hmm_params(rng, s)
    llh = rng.normal(size=(2, t_len, s))
    fb = semiring_scan.forward_backward(
        jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li), jnp.asarray(lf)
    )
    full = semiring_scan.expected_transition_counts(
        fb.log_alpha, fb.log_beta, jnp.asarray(llh), jnp.asarray(lt), fb.log_z
    )
    rows = jnp.asarray([0, 2, 4])
    cols = jnp.asarray([1, 3])
    block = semiring_scan.expected_transition_counts(
        fb.log_alpha, fb.log_beta, jnp.asarray(llh), jnp.asarray(lt), fb.log_z,
        rows=rows, cols=cols,
    )
    np.testing.assert_allclose(
        np.asarray(block), np.asarray(full)[np.ix_([0, 2, 4], [1, 3])],
        rtol=1e-8,
    )


class TestBayesianTransitions:
    def test_learned_transitions_monotone_and_recover_dwell(self, rng):
        """learn_transitions: ELBO monotone; self-loop prob tracks dwell."""
        t_len, b = 60, 12
        means = np.array([[-3.0], [0.0], [3.0]])
        data = np.zeros((b, t_len, 1))
        mask = np.ones((b, t_len))
        # long dwell (~0.9 self-loop) unlike the 0.5 graph default
        for i in range(b):
            state, t = 0, 0
            while t < t_len:
                dwell = int(rng.integers(8, 14))
                dwell = min(dwell, t_len - t)
                data[i, t : t + dwell] = means[min(state, 2)] + 0.4 * rng.normal(
                    size=(dwell, 1)
                )
                state += 1
                t += dwell
        flat = data.reshape(-1, 1)
        nset = beer_tpu.NormalSet.create(
            jnp.asarray(flat.mean(0)), jnp.asarray(np.cov(flat.T).reshape(1, 1)),
            size=3, cov_type="full", noise_std=1.0, key=jax.random.PRNGKey(5),
        )
        hmm = HMM.create(
            graph_mod.left_to_right(3, self_loop=0.5).compile(jnp.float64),
            nset, learn_transitions=True,
        )
        x, m = jnp.asarray(data), jnp.asarray(mask)
        step = jax.jit(vb_step)
        elbos = []
        for _ in range(25):
            elbo, hmm = step(hmm, x, mask=m)
            elbos.append(float(elbo) / mask.sum())
        diffs = np.diff(elbos)
        assert np.all(diffs > -1e-8), f"min diff {diffs.min()}"
        # some non-final state must have learned a long dwell (>0.7
        # self-loop vs the 0.5 graph default); which one carries it
        # depends on the alignment optimum
        a = np.asarray(hmm.trans_alpha_post)
        allowed = np.asarray(hmm.trans_alpha_prior) > 0
        probs = np.where(allowed, a, 0)
        probs = probs / probs.sum(1, keepdims=True)
        self_loops = np.diag(probs)[:-1]  # last state's row is trivial
        assert self_loops.max() > 0.7, f"no long dwell learned: {np.diag(probs)}"
        # and the posterior moved away from the prior's 0.5 everywhere it
        # had data support
        assert abs(self_loops - 0.5).max() > 0.2

    def test_fixed_transitions_unchanged(self, rng):
        """Default (fixed) path has no transition parameters."""
        nset = beer_tpu.NormalSet.create(
            jnp.zeros(1), jnp.ones((1, 1)), size=3, cov_type="full",
            key=jax.random.PRNGKey(0),
        )
        hmm = HMM.create(graph_mod.left_to_right(3).compile(), nset)
        assert hmm.trans_alpha_post is None
        assert float(hmm._trans_kl()) == 0.0


def test_probs_path_matches_log_path(rng):
    """forward_backward_probs / expected_transition_counts_probs are the
    hot-path reformulation of the log-space smoothing — posteriors,
    log Z, and xi-counts must agree with the FBResult path exactly (same
    recursions, only the recovery algebra differs)."""
    t_len, s = 40, 7
    lt, li, lf = random_hmm_params(rng, s)
    llh = rng.normal(size=(3, t_len, s)) * 3
    lengths = [t_len, 25, 1]
    mask = np.zeros((3, t_len))
    for i, ln in enumerate(lengths):
        mask[i, :ln] = 1.0
    args = (jnp.asarray(llh), jnp.asarray(lt), jnp.asarray(li),
            jnp.asarray(lf), jnp.asarray(mask))
    fb = semiring_scan.forward_backward(*args)
    fbp = semiring_scan.forward_backward_probs(*args)
    np.testing.assert_allclose(
        np.asarray(fbp.log_z), np.asarray(fb.log_z), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(fbp.posteriors), np.asarray(fb.posteriors),
        rtol=1e-8, atol=1e-12,
    )
    xi_log = semiring_scan.expected_transition_counts(
        fb.log_alpha, fb.log_beta, jnp.asarray(llh), jnp.asarray(lt),
        fb.log_z, jnp.asarray(mask),
    )
    xi_probs = semiring_scan.expected_transition_counts_probs(
        fbp, jnp.asarray(lt), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(xi_probs), np.asarray(xi_log), rtol=1e-8, atol=1e-12
    )
    rows, cols = jnp.asarray([1, 3]), jnp.asarray([0, 2, 4])
    xi_blk = semiring_scan.expected_transition_counts_probs(
        fbp, jnp.asarray(lt), jnp.asarray(mask), rows=rows, cols=cols
    )
    np.testing.assert_allclose(
        np.asarray(xi_blk), np.asarray(xi_log)[np.ix_([1, 3], [0, 2, 4])],
        rtol=1e-8,
    )


def test_probs_path_extreme_llh_finite(rng):
    """The probs path must keep the same f32 floor robustness as the
    log path on badly-matched models (llh ~ -2000/frame)."""
    t_len, s = 60, 5
    lt, li, lf = random_hmm_params(rng, s, dtype=np.float32)
    llh = (rng.normal(size=(2, t_len, s)) * 200 - 1500).astype(np.float32)
    mask = np.ones((2, t_len), np.float32)
    mask[1, 40:] = 0
    fbp = semiring_scan.forward_backward_probs(
        jnp.asarray(llh), jnp.asarray(lt.astype(np.float32)),
        jnp.asarray(li.astype(np.float32)), jnp.asarray(lf.astype(np.float32)),
        jnp.asarray(mask),
    )
    assert np.isfinite(np.asarray(fbp.log_z)).all()
    post = np.asarray(fbp.posteriors)
    assert np.isfinite(post).all()
    np.testing.assert_allclose(post[0].sum(-1), 1.0, rtol=1e-5)
    xi = np.asarray(semiring_scan.expected_transition_counts_probs(
        fbp, jnp.asarray(lt.astype(np.float32)), jnp.asarray(mask)
    ))
    assert np.isfinite(xi).all() and (xi >= 0).all()
    np.testing.assert_allclose(xi.sum(), (mask[:, 1:]).sum(), rtol=1e-4)


def test_hmm_posteriors_entry_point(rng):
    """`DiscreteLatentModel.posteriors` analogue on HMM: per-frame state
    occupancies, rows sum to 1, match the infer cache's general path."""
    t_len, s, b = 12, 3, 2
    data = rng.normal(size=(b, t_len, 1)).astype(np.float32)
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(1), jnp.eye(1), size=s, cov_type="full",
        noise_std=1.0, key=jax.random.PRNGKey(3),
    )
    hmm = HMM.create(graph_mod.left_to_right(s).compile(), nset)
    mask = np.ones((b, t_len), np.float32)
    mask[1, 7:] = 0
    post = np.asarray(hmm.posteriors(jnp.asarray(data), jnp.asarray(mask)))
    assert post.shape == (b, t_len, s)
    np.testing.assert_allclose(post[0].sum(-1), 1.0, rtol=1e-5)
    _, cache = hmm.infer(hmm.sufficient_statistics(jnp.asarray(data)),
                         jnp.asarray(mask))
    if "posteriors" in cache:  # general path (CPU)
        np.testing.assert_allclose(post, np.asarray(cache["posteriors"]),
                                   rtol=1e-6, atol=1e-7)
