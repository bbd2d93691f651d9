"""HMM recursions as batched scans in the log semiring.

Reference parity: ``beer/models/hmm.py`` forward/backward/viterbi — but
where the reference runs a Python ``for t in range(T)`` loop of
``logsumexp`` steps per utterance (its single biggest performance sin,
SURVEY.md §3.2), these are whole-batch XLA programs:

* :func:`forward_backward` — the **scaled** recursions: carries are
  normalized probabilities plus a per-sequence log-scale, the per-step
  (B, S) @ (S, S) product rides the MXU, exp(llh) is hoisted out of the
  scan, and the only in-step transcendental is one log on the (B, 1)
  normalizer.  On TPU the whole T-loop runs as a single Pallas kernel
  (:mod:`beer_tpu.ops.pallas_scan`); per-utterance-graph batches use the
  ``lax.scan`` path.  Posteriors are per-frame softmaxes of α+β and
  ξ-counts use per-frame-normalized factors — both independent of any
  probability floor the scaled carries introduce.
* :func:`forward_assoc` — ``lax.associative_scan`` over log-transition
  operators (O(log T) depth, per "Temporal Parallelization of Inference
  in HMMs", arXiv:2102.05743) for few-long-sequences workloads.
* :func:`viterbi` — (max, +) scan with backpointers and a reverse-scan
  backtrace, fully jittable.

Ragged batches use pad-and-mask: masked steps are identity (carry passes
through), so the final carry equals the value at each sequence's true
length — no gather needed.

Conventions: ``llh`` (B, T, S) frame log-likelihoods; ``log_trans``
(S, S) with [i, j] = log p(j | i) — or (B, S, S) for *per-utterance*
graphs (supervised training on transcription-specific graphs);
``log_init`` / ``log_final`` (S,) or (B, S); ``mask`` (B, T) 1.0 for
real frames.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # avoids (-inf) - (-inf) = nan in masked/unreachable states


class FBResult(NamedTuple):
    log_alpha: jnp.ndarray   # (B, T, S)
    log_beta: jnp.ndarray    # (B, T, S)
    log_z: jnp.ndarray       # (B,)
    posteriors: jnp.ndarray  # (B, T, S), zero on padded frames


class FBProbs(NamedTuple):
    """Probability-space smoothing result (the training hot path).

    All fields come straight out of the scaled forward pass and the
    fused v-space backward/smoothing pass — **no (B, T, S) log/exp
    passes and no log_α/log_β materialization**:

      posteriors γ_t = α̂_t·β̂_t / Σ_s α̂_t·β̂_t   (≡ softmax(logα+logβ))
      ξ_t ∝ outer(α̂_t, probs_w_{t+1}) ⊙ A        with the exact uᵀAw
            normalizer recovered from (fwd_log_scales, post_norm,
            w_sums) — see :func:`expected_transition_counts_probs`.
    """

    probs_fwd: jnp.ndarray   # (B, T, S) α̂ (per-frame normalized)
    posteriors: jnp.ndarray  # (B, T, S) γ, zero on padded frames
    probs_w: jnp.ndarray     # (B, T, S) normalize(e_llh·β̂) per frame
    w_sums: jnp.ndarray      # (B, T) Σ_s e_llh_t(s)·β̂_t(s)
    post_norm: jnp.ndarray   # (B, T) Σ_s α̂_t(s)·β̂_t(s) (pre-mask)
    fwd_log_scales: jnp.ndarray  # (B, T) cumulative log-scale of α̂
    log_z: jnp.ndarray       # (B,)


def _clamp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, _NEG_INF)


def forward(
    llh: jnp.ndarray,
    log_trans: jnp.ndarray,
    log_init: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched forward recursion (log-carry variant).

    Returns (log_alpha (B, T, S), final carry (B, S)).  The scaled
    variant :func:`forward_scaled` is the fast path used by
    :func:`forward_backward`; this one is kept as the readable reference
    (tests assert they match).
    """
    b, t_len, s = llh.shape
    if mask is None:
        mask = jnp.ones((b, t_len), llh.dtype)
    trans = jnp.exp(log_trans)  # probabilities in [0, 1] — safe to exp
    batched_trans = trans.ndim == 3  # per-utterance graphs (B, S, S)
    alpha0 = _clamp(log_init + llh[:, 0]) * mask[:, 0:1] + (1 - mask[:, 0:1]) * 0.0

    def step(carry, inp):
        llh_t, m_t = inp  # (B, S), (B, 1)
        shift = jnp.max(carry, axis=-1, keepdims=True)
        scaled = jnp.exp(carry - shift)
        if batched_trans:
            prod = jnp.einsum(
                "bs,bst->bt", scaled, trans,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            prod = jnp.matmul(scaled, trans, precision=jax.lax.Precision.HIGHEST)
        prop = jnp.log(jnp.maximum(prod, jnp.finfo(llh.dtype).tiny))
        new = _clamp(llh_t + shift + prop)
        carry = m_t * new + (1 - m_t) * carry
        return carry, carry

    carry, alphas = jax.lax.scan(
        step,
        alpha0,
        (jnp.swapaxes(llh[:, 1:], 0, 1), jnp.swapaxes(mask[:, 1:, None], 0, 1)),
    )
    log_alpha = jnp.concatenate(
        [alpha0[:, None], jnp.swapaxes(alphas, 0, 1)], axis=1
    )
    return log_alpha, carry


def backward(
    llh: jnp.ndarray,
    log_trans: jnp.ndarray,
    log_final: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batched backward recursion; returns log_beta (B, T, S).

    With masking, padded positions (t beyond a sequence's length) carry
    the *final-state* vector backwards unchanged, so β at the last real
    frame equals log_final exactly as in the unpadded recursion.
    """
    b, t_len, s = llh.shape
    if mask is None:
        mask = jnp.ones((b, t_len), llh.dtype)
    trans_t = jnp.swapaxes(jnp.exp(log_trans), -1, -2)
    batched_trans = trans_t.ndim == 3
    beta_last = jnp.broadcast_to(_clamp(log_final), (b, s)).astype(llh.dtype)

    def step(carry, inp):
        llh_t1, m_t1 = inp  # llh at t+1, mask at t+1
        v = _clamp(llh_t1 + carry)
        shift = jnp.max(v, axis=-1, keepdims=True)
        scaled = jnp.exp(v - shift)
        if batched_trans:
            prod = jnp.einsum(
                "bs,bst->bt", scaled, trans_t,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            prod = jnp.matmul(scaled, trans_t, precision=jax.lax.Precision.HIGHEST)
        prop = jnp.log(jnp.maximum(prod, jnp.finfo(llh.dtype).tiny))
        new = _clamp(shift + prop)
        carry = m_t1 * new + (1 - m_t1) * carry
        return carry, carry

    _, betas = jax.lax.scan(
        step,
        beta_last,
        (jnp.swapaxes(llh[:, 1:], 0, 1), jnp.swapaxes(mask[:, 1:, None], 0, 1)),
        reverse=True,
    )
    return jnp.concatenate([jnp.swapaxes(betas, 0, 1), beta_last[:, None]], axis=1)


def _scaled_pass(e_llh, trans, init_vec, mask, reverse: bool):
    """Shared scaled recursion: carries normalized probabilities + log-scale.

    The classic scaled forward/backward: per step one (B, S) @ (S, S)
    matmul, a row-sum, and a single log on the (B,) normalizer — the
    per-element exp/log of the log-domain step are hoisted out of the
    scan entirely (exp(llh) precomputed, log taken once on the outputs).
    """
    b, t_len, s = e_llh.shape
    tiny = jnp.finfo(e_llh.dtype).tiny
    batched = trans.ndim == 3

    if reverse:
        prob0 = init_vec  # unnormalized final vector (already exp'd)
    else:
        prob0 = init_vec * e_llh[:, 0]
    norm0 = jnp.maximum(prob0.sum(-1, keepdims=True), tiny)
    carry0 = (prob0 / norm0, jnp.log(norm0[..., 0]))

    def step(carry, inp):
        prob, logc = carry
        e_t, m_t = inp
        if reverse:
            v = prob * e_t
            if batched:
                raw = jnp.einsum("bs,bst->bt", v,
                                 jnp.swapaxes(trans, -1, -2),
                                 precision=jax.lax.Precision.HIGHEST)
            else:
                raw = jnp.matmul(v, trans.T,
                                 precision=jax.lax.Precision.HIGHEST)
        else:
            if batched:
                raw = jnp.einsum("bs,bst->bt", prob, trans,
                                 precision=jax.lax.Precision.HIGHEST)
            else:
                raw = jnp.matmul(prob, trans,
                                 precision=jax.lax.Precision.HIGHEST)
            raw = raw * e_t
        norm = jnp.maximum(raw.sum(-1, keepdims=True), tiny)
        new = (raw / norm, logc + jnp.log(norm[..., 0]))
        prob_out = m_t * new[0] + (1 - m_t) * prob
        logc_out = m_t[..., 0] * new[1] + (1 - m_t[..., 0]) * logc
        return (prob_out, logc_out), (prob_out, logc_out)

    xs = (
        jnp.swapaxes(e_llh[:, 1:], 0, 1),
        jnp.swapaxes(mask[:, 1:, None], 0, 1),
    )
    carry, (probs, logcs) = jax.lax.scan(step, carry0, xs, reverse=reverse)
    if reverse:
        probs = jnp.concatenate([probs, carry0[0][None]], axis=0)
        logcs = jnp.concatenate([logcs, carry0[1][None]], axis=0)
    else:
        probs = jnp.concatenate([carry0[0][None], probs], axis=0)
        logcs = jnp.concatenate([carry0[1][None], logcs], axis=0)
    probs = jnp.swapaxes(probs, 0, 1)          # (B, T, S)
    logcs = jnp.swapaxes(logcs, 0, 1)          # (B, T)
    return probs, logcs, carry


def _smoothing_scan(e_llh, trans, final_vec, mask, a_probs):
    """jnp fallback of ``pallas_scan.backward_smoothing_pass``.

    v-space backward recursion (carry v̂_t ∝ e_t·β_t, normalized) with
    the smoothing outputs computed in-step; bit-identical semantics to
    the Pallas kernel (tests assert agreement).  Handles per-utterance
    (B, S, S) transition matrices via einsum.
    """
    b, t_len, s = e_llh.shape
    tiny = jnp.finfo(e_llh.dtype).tiny
    batched = trans.ndim == 3
    trans_t = jnp.swapaxes(trans, -1, -2)
    final = jnp.broadcast_to(final_vec, (b, s)).astype(e_llh.dtype)
    mask_next = jnp.concatenate(
        [mask[:, 1:], jnp.zeros((b, 1), mask.dtype)], axis=1
    )
    v0 = final / jnp.maximum(final.sum(-1, keepdims=True), tiny)

    def step(v_hat, inp):
        e_t, a_t, m_t, mn_t = inp
        is_last = m_t * (1.0 - mn_t)
        if batched:
            u1 = jnp.einsum("bs,bst->bt", v_hat, trans_t,
                            precision=jax.lax.Precision.HIGHEST)
        else:
            u1 = jnp.matmul(v_hat, trans_t,
                            precision=jax.lax.Precision.HIGHEST)
        u1 = is_last * final + (1.0 - is_last) * u1
        nu = jnp.maximum(u1.sum(-1, keepdims=True), tiny)
        b_hat = u1 / nu
        ab = a_t * b_hat
        pn = ab.sum(-1, keepdims=True)
        gamma = (ab / jnp.maximum(pn, tiny)) * m_t
        v = e_t * u1
        sv = jnp.maximum(v.sum(-1, keepdims=True), tiny)
        w = v / sv
        v_new = m_t * w + (1.0 - m_t) * v_hat
        return v_new, (gamma, w, (sv / nu)[..., 0], pn[..., 0])

    xs = (
        jnp.swapaxes(e_llh, 0, 1),
        jnp.swapaxes(a_probs, 0, 1),
        jnp.swapaxes(mask[..., None], 0, 1),
        jnp.swapaxes(mask_next[..., None], 0, 1),
    )
    _, (gamma, w, wsum, pnorm) = jax.lax.scan(step, v0, xs, reverse=True)
    return (
        jnp.swapaxes(gamma, 0, 1),
        jnp.swapaxes(w, 0, 1),
        jnp.swapaxes(wsum, 0, 1),
        jnp.swapaxes(pnorm, 0, 1),
    )


def _make_smoothing_diffable(time_major: bool):
    """Pallas smoothing pass wrapped in ``custom_vjp`` (jnp-scan VJP)."""

    def reference(e_llh, trans, final_vec, mask, a_probs):
        if not time_major:
            return _smoothing_scan(e_llh, trans, final_vec, mask, a_probs)
        g, w, ws, pn = _smoothing_scan(
            jnp.swapaxes(e_llh, 0, 1), trans, final_vec, mask,
            jnp.swapaxes(a_probs, 0, 1),
        )
        return (jnp.swapaxes(g, 0, 1), jnp.swapaxes(w, 0, 1), ws.T, pn.T)

    @jax.custom_vjp
    def run(e_llh, trans, final_vec, mask, a_probs):
        from beer_tpu.ops import pallas_scan

        return pallas_scan.backward_smoothing_pass(
            e_llh, trans, final_vec, mask, a_probs, time_major=time_major
        )

    def fwd(*args):
        return run(*args), args

    def bwd(res, ct):
        _, vjp = jax.vjp(reference, *res)
        return vjp(ct)

    run.defvjp(fwd, bwd)
    return run


_smoothing_pallas = _make_smoothing_diffable(False)
_smoothing_pallas_tm = _make_smoothing_diffable(True)


@jax.custom_vjp
def forward_llh(llh_tm, trans, init_vec, mask):
    """Pallas scaled forward from raw time-major llh (no HBM e_llh);
    returns (α̂ (T, B, S), per-step norms (T, B), masked rowmax shifts
    (T, B)).  custom_vjp recomputes through the jnp scan (SVAE
    ∂log Z/∂llh)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.forward_llh_pass(llh_tm, trans, init_vec, mask)


def _fwd_llh_reference(llh_tm, trans, init_vec, mask):
    llh = jnp.swapaxes(llh_tm, 0, 1)
    m_llh = jnp.max(llh, axis=-1, keepdims=True)
    e = jnp.exp(llh - m_llh) * mask[..., None] + (1 - mask[..., None])
    p, l, _ = _scaled_pass(e, trans, init_vec, mask, reverse=False)
    # cumulative log-scales → per-step norms (1 on masked frames)
    dlc = jnp.diff(l, axis=1, prepend=jnp.zeros_like(l[:, :1]))
    norms = jnp.exp(dlc)
    return (jnp.swapaxes(p, 0, 1), norms.T, (m_llh[..., 0] * mask).T)


def _fwd_llh_fwd(*args):
    return forward_llh(*args), args


def _fwd_llh_bwd(res, ct):
    _, vjp = jax.vjp(_fwd_llh_reference, *res)
    return vjp(ct)


forward_llh.defvjp(_fwd_llh_fwd, _fwd_llh_bwd)


def scan_time_pad(t_len: int, b: int, s: int) -> int:
    """The padded time length the fused scan kernels use at this block
    shape.  Callers that pre-pad their (T, B, ·) streams (and mask) to
    this length make the per-pass ``_pad_tm`` a no-op — otherwise EACH
    kernel pass pays a full-array pad copy (~0.75 ms per pass at the
    bench shape; the pad is cheapest fused into the ELLH matmul's stats
    input, see PhoneLoop.infer)."""
    from beer_tpu.ops import pallas_scan

    k = pallas_scan._steps_per_block(b, s)
    return -(-t_len // k) * k


@jax.custom_vjp
def forward_llh_ckpt(llh_tm, trans, init_vec, mask):
    """Pallas scaled forward emitting block-entry CHECKPOINTS instead of
    the full α̂ stream (the stream is the kernel's dominant HBM cost —
    docs/PERFORMANCE.md).  Returns (ckpts (n_blocks, B, S), last (B, S),
    logz_base (B,) = Σ_t log c_t + Σ_t mllh_t); ``log Z = logz_base +
    log Σ last·final``.  custom_vjp recomputes through the jnp scan
    (SVAE ∂log Z/∂llh)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.forward_llh_ckpt_pass(llh_tm, trans, init_vec, mask)


def _fwd_llh_ckpt_reference(llh_tm, trans, init_vec, mask):
    from beer_tpu.ops import pallas_scan

    p, norms, mllh = _fwd_llh_reference(llh_tm, trans, init_vec, mask)
    t_len, b, s = llh_tm.shape
    k = pallas_scan._steps_per_block(b, s)
    n_blocks = -(-t_len // k)
    entries = [jnp.broadcast_to(init_vec, (b, s)).astype(llh_tm.dtype)]
    for g in range(1, n_blocks):
        entries.append(p[g * k - 1])
    logz_base = (jnp.log(norms) * mask.T).sum(0) + mllh.sum(0)
    return jnp.stack(entries), p[-1], logz_base


def _fwd_llh_ckpt_fwd(*args):
    return forward_llh_ckpt(*args), args


def _fwd_llh_ckpt_bwd(res, ct):
    _, vjp = jax.vjp(_fwd_llh_ckpt_reference, *res)
    return vjp(ct)


forward_llh_ckpt.defvjp(_fwd_llh_ckpt_fwd, _fwd_llh_ckpt_bwd)


@jax.custom_vjp
def forward_llh_ckpt_banded(llh_tm, bands, trans, init_vec, mask):
    """:func:`forward_llh_ckpt` with the phone-loop band + rank-1
    transition structure (``bands = (a_self, a_adv, exit, w)``, each
    (S,)) — the per-step product runs on the VPU, measured 2.3× faster
    than the dense (S, S) MXU step (docs/PERFORMANCE.md).  ``trans``
    (the equivalent dense matrix) feeds only the custom_vjp recompute;
    the vjp is ∂/∂llh (SVAE) — the transition-structure cotangent is
    zero by construction (conjugate transition updates are closed-form,
    never autograd)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.forward_llh_ckpt_pass(
        llh_tm, None, init_vec, mask, bands=bands,
    )


def _fwd_llh_ckpt_banded_fwd(*args):
    return forward_llh_ckpt_banded(*args), args


def _fwd_llh_ckpt_banded_bwd(res, ct):
    llh_tm, bands, trans, init_vec, mask = res
    _, vjp = jax.vjp(_fwd_llh_ckpt_reference, llh_tm, trans, init_vec, mask)
    d_llh, d_trans, d_init, d_mask = vjp(ct)
    return (d_llh, jax.tree.map(jnp.zeros_like, bands), d_trans,
            d_init, d_mask)


forward_llh_ckpt_banded.defvjp(_fwd_llh_ckpt_banded_fwd,
                               _fwd_llh_ckpt_banded_bwd)


def hmm_estep_ckpt(llh_tm, ckpts, trans, final_vec, mask):
    """Checkpointed fused E-step for a GENERAL shared-graph HMM: like
    :func:`phone_loop_estep_ckpt` but with FULL (S, S) ξ — identity
    selections make the selection matmuls vanish, so the kernel directly
    accumulates Σ_t weight_t · α̂_t ⊗ ŵ_{t+1}.  Returns
    (γ (T, B, S), xi_raw (S, S)); transition counts =
    ``xi_raw * exp(log_trans)`` (the same outer-times-arc form as
    :func:`expected_transition_counts_probs`).  Not differentiable
    (stop-gradient inputs)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, ckpts, trans, final_vec, mask, None, None,
    )


def phone_loop_estep_ckpt_banded(llh_tm, bands, ckpts, final_vec, mask,
                                 sel_r, sel_c):
    """Banded variant of :func:`phone_loop_estep_ckpt` — both in-kernel
    chains (α̂ recompute + v-space backward) use the band + rank-1
    propagators, matching :func:`forward_llh_ckpt_banded` so the α̂
    regeneration stays bit-identical.  Not differentiable (stop-gradient
    inputs)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, ckpts, None, final_vec, mask, sel_r, sel_c,
        bands=bands,
    )


@jax.custom_vjp
def forward_llh_ckpt_banded_lm(llh_lm, bands, trans, init_vec, mask):
    """Lane-major (S, B) variant of :func:`forward_llh_ckpt_banded`:
    at small state counts S pads to whole 128-lane groups in the
    batch-major tiles (41% dead lanes at the bench S=150) while B fills
    lanes exactly — the (S, B) orientation cuts the serial chains' VPU
    work ~40% (tools/exp_lane_major.py).  ``llh_lm`` (T, S, B),
    ``init_vec`` (S, B); returns (ckpts (n_blocks, S, B), last (S, B),
    logz_base (B,)).  ``trans`` feeds only the custom_vjp recompute
    (∂/∂llh, SVAE)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.forward_llh_ckpt_pass_lm(
        llh_lm, bands, init_vec, mask,
    )


def _fwd_llh_ckpt_banded_lm_fwd(*args):
    return forward_llh_ckpt_banded_lm(*args), args


def _fwd_llh_ckpt_banded_lm_bwd(res, ct):
    llh_lm, bands, trans, init_vec, mask = res
    ct_ckpts, ct_last, ct_logz = ct
    _, vjp = jax.vjp(
        _fwd_llh_ckpt_reference, jnp.swapaxes(llh_lm, 1, 2), trans,
        init_vec.T, mask,
    )
    d_llh, d_trans, d_init, d_mask = vjp(
        (jnp.swapaxes(ct_ckpts, 1, 2), ct_last.T, ct_logz))
    return (jnp.swapaxes(d_llh, 1, 2), jax.tree.map(jnp.zeros_like, bands),
            d_trans, d_init.T, d_mask)


forward_llh_ckpt_banded_lm.defvjp(_fwd_llh_ckpt_banded_lm_fwd,
                                  _fwd_llh_ckpt_banded_lm_bwd)


def phone_loop_estep_ckpt_lm(llh_lm, bands, ckpts, final_vec, mask,
                             sel_r_t, sel_c_t):
    """Lane-major fused smoothing + restricted ξ
    (:func:`pallas_scan.phone_loop_estep_ckpt_pass_lm`); pairs with
    :func:`forward_llh_ckpt_banded_lm`.  Returns (γ (T, S, B),
    xi_raw (n_r, n_c)).  Not differentiable (stop-gradient inputs)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.phone_loop_estep_ckpt_pass_lm(
        llh_lm, ckpts, bands, final_vec, mask, sel_r_t, sel_c_t,
    )


def phone_loop_estep_ckpt_acc_lm(llh_lm, bands, ckpts, final_vec, mask,
                                 sel_r_t, sel_c_t, stats_lm,
                                 w=None, bias=None):
    """Accumulating lane-major fused E-step
    (:func:`pallas_scan.phone_loop_estep_ckpt_acc_lm`): smoothing +
    restricted ξ + in-VMEM γᵀ@stats — the (T, S, B) γ array never
    touches HBM.  With ``w (S, P)`` / ``bias (S,)``, llh is computed in
    VMEM from the same stats stream and ``llh_lm`` is ignored (pass
    None).  Returns (acc2 (S, P), counts (S,), γ0 (S, B),
    xi_raw (n_r, n_c)).  Not differentiable (stop-gradient inputs)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.phone_loop_estep_ckpt_acc_lm(
        llh_lm, ckpts, bands, final_vec, mask, sel_r_t, sel_c_t,
        stats_lm, w=w, bias=bias,
    )


def phone_loop_estep_ckpt_acc_alpha_lm(bands, final_vec, mask, sel_r_t,
                                       sel_c_t, stats_lm, w, bias,
                                       alphas, norms):
    """Stored-α̂ accumulating fused E-step: the forward trajectory from
    :func:`phone_loop_logz_stats_alpha_lm` streams into the smoothing
    kernel instead of being recomputed from block checkpoints — the
    serial loop carries only the backward chain (pallas_scan
    STORE_ALPHA).  Outputs bit-identical to
    :func:`phone_loop_estep_ckpt_acc_lm`.  Not differentiable
    (stop-gradient inputs)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.phone_loop_estep_ckpt_acc_lm(
        None, None, bands, final_vec, mask, sel_r_t, sel_c_t,
        stats_lm, w=w, bias=bias, alphas=alphas, norms=norms,
    )


def _logz_from_kernels(stats_lm, bands, w, bias, trans, init_lm,
                       final_lm, mask, store_alpha: bool = False):
    """Shared forward: (log_z, *seed) where seed is (ckpts,) or
    (alphas, norms) under ``store_alpha`` — one epilogue for both
    routes so the tiny-clamp / zero-length handling cannot diverge."""
    from beer_tpu.ops import pallas_scan

    out = pallas_scan.forward_llh_ckpt_pass_lm(
        stats_lm, bands, init_lm, mask,
        trans=None if bands is not None else trans, w=w, bias=bias,
        store_alpha=store_alpha,
    )
    *seed, a_last, logz_base = out
    tiny = jnp.finfo(logz_base.dtype).tiny
    log_z = logz_base + jnp.log(
        jnp.maximum((a_last * final_lm).sum(0), tiny))
    return (log_z * (mask.sum(-1) > 0), *seed)


def _logz_stats_lm_bwd_impl(res, ct):
    """Fisher-identity backward: ∂log Z_b/∂llh[t,s,b] = γ[t,s,b], so
    one fused smoothing pass replaces the serial reference-scan vjp
    (measured 1.9 ms vs ~0.1 ms at the SVAE latent shape).  With
    llh = W@stats + bias the chain rule gives ∂/∂stats = Wᵀ(γ·ct),
    ∂/∂W = (γ·ct)ᵀ⊗stats, ∂/∂bias = Σ(γ·ct).  Transition/boundary
    parameters (bands/trans/init/final) get ZERO cotangents by design:
    this framework trains them conjugately, never by gradient
    (reference beer semantics)."""
    from beer_tpu.ops import pallas_scan

    stats_lm, bands, w, bias, trans, init_lm, final_lm, mask, ckpts = res
    ct_logz, _ct_ckpts = ct            # ckpts output: non-differentiable
    s = w.shape[0]
    sel1 = jnp.zeros((1, s), stats_lm.dtype).at[0, 0].set(1.0)
    gamma, _ = pallas_scan.phone_loop_estep_ckpt_pass_lm(
        stats_lm, ckpts, bands, final_lm, mask, sel1, sel1,
        trans=None if bands is not None else trans, w=w, bias=bias,
    )
    hi = jax.lax.Precision.HIGHEST
    g = gamma * ct_logz[None, None, :]
    d_stats = jnp.einsum("sp,tsb->tpb", w, g, precision=hi)
    d_w = jnp.einsum("tsb,tpb->sp", g, stats_lm, precision=hi)
    d_bias = g.sum((0, 2))
    zeros = lambda x: jax.tree.map(jnp.zeros_like, x)
    return (d_stats, zeros(bands), d_w, d_bias, zeros(trans),
            zeros(init_lm), zeros(final_lm), zeros(mask))


@jax.custom_vjp
def phone_loop_logz_stats_lm(stats_lm, bands, w, bias, trans, init_lm,
                             final_lm, mask):
    """Differentiable log Z through the stats-streaming lane-major
    kernels (banded phone-loop transitions): llh = W@stats + bias is
    computed in VMEM, and the BACKWARD uses the HMM Fisher identity
    ∂log Z/∂llh = γ via one fused smoothing pass — no serial
    reference-scan vjp.  Returns (log_z (B,), ckpts (n, S, B)); the
    ckpts output exists to seed the stop-gradient accumulate pass and
    is non-differentiable (its cotangent is dropped).  Gradients flow
    to stats/w/bias only; transition and boundary parameters are
    conjugate-trained in this framework and get zero cotangents."""
    return _logz_from_kernels(stats_lm, bands, w, bias, trans, init_lm,
                              final_lm, mask)


def _pl_logz_stats_lm_fwd(*args):
    out = phone_loop_logz_stats_lm(*args)
    return out, args + (out[1],)


phone_loop_logz_stats_lm.defvjp(_pl_logz_stats_lm_fwd,
                                _logz_stats_lm_bwd_impl)


@jax.custom_vjp
def phone_loop_logz_stats_alpha_lm(stats_lm, bands, w, bias, trans,
                                   init_lm, final_lm, mask):
    """Stored-α̂ variant of :func:`phone_loop_logz_stats_lm`: the
    forward kernel emits the full α̂ trajectory + per-step normalizers
    (returns ``(log_z, alphas, norms)``) so the accumulate pass can
    skip its serial forward recompute
    (:func:`phone_loop_estep_ckpt_acc_alpha_lm`).  The alphas/norms
    outputs are non-differentiable seeds; the Fisher-identity backward
    is identical to the ckpt route's (block checkpoints are a cheap
    slice of the stored trajectory)."""
    return _logz_from_kernels(stats_lm, bands, w, bias, trans,
                              init_lm, final_lm, mask, store_alpha=True)


def _pl_logz_stats_alpha_lm_fwd(*args):
    out = phone_loop_logz_stats_alpha_lm(*args)
    return out, args + (out[1],)


def _pl_logz_stats_alpha_lm_bwd(res, ct):
    from beer_tpu.ops import pallas_scan

    (stats_lm, bands, w, bias, trans, init_lm, final_lm, mask,
     alphas) = res
    ct_logz, _ct_a, _ct_n = ct
    b = stats_lm.shape[2]
    s = w.shape[0]
    k_steps = pallas_scan._steps_per_block(b, s)
    # block-entry checkpoints = init + every k-th stored α̂ (bit-equal
    # to the ckpt kernel's ckpt_out by construction)
    ckpts = jnp.concatenate(
        [init_lm[None].astype(alphas.dtype),
         alphas[k_steps - 1 :: k_steps][:-1]], axis=0)
    full = (stats_lm, bands, w, bias, trans, init_lm, final_lm, mask,
            ckpts)
    return _logz_stats_lm_bwd_impl(full, (ct_logz, None))


phone_loop_logz_stats_alpha_lm.defvjp(_pl_logz_stats_alpha_lm_fwd,
                                      _pl_logz_stats_alpha_lm_bwd)


@jax.custom_vjp
def hmm_logz_stats_lm(stats_lm, w, bias, trans, init_lm, final_lm,
                      mask):
    """Dense-transition mirror of :func:`phone_loop_logz_stats_lm`
    (general shared-graph HMM)."""
    return _logz_from_kernels(stats_lm, None, w, bias, trans, init_lm,
                              final_lm, mask)


def _hmm_logz_stats_lm_fwd(*args):
    out = hmm_logz_stats_lm(*args)
    return out, args + (out[1],)


def _hmm_logz_stats_lm_bwd(res, ct):
    stats_lm, w, bias, trans, init_lm, final_lm, mask, ckpts = res
    full = (stats_lm, None, w, bias, trans, init_lm, final_lm, mask,
            ckpts)
    (d_stats, _none, d_w, d_bias, d_trans, d_init, d_final,
     d_mask) = _logz_stats_lm_bwd_impl(full, ct)
    return (d_stats, d_w, d_bias, d_trans, d_init, d_final, d_mask)


hmm_logz_stats_lm.defvjp(_hmm_logz_stats_lm_fwd, _hmm_logz_stats_lm_bwd)


@jax.custom_vjp
def hmm_logz_stats_alpha_lm(stats_lm, w, bias, trans, init_lm, final_lm,
                            mask):
    """Dense-transition mirror of
    :func:`phone_loop_logz_stats_alpha_lm` (general shared-graph HMM):
    returns ``(log_z, alphas, norms)`` for the recompute-free
    accumulate pass."""
    return _logz_from_kernels(stats_lm, None, w, bias, trans,
                              init_lm, final_lm, mask, store_alpha=True)


def _hmm_logz_stats_alpha_lm_fwd(*args):
    out = hmm_logz_stats_alpha_lm(*args)
    return out, args + (out[1],)


def _hmm_logz_stats_alpha_lm_bwd(res, ct):
    stats_lm, w, bias, trans, init_lm, final_lm, mask, alphas = res
    full = (stats_lm, None, w, bias, trans, init_lm, final_lm, mask,
            alphas)
    (d_stats, _none, d_w, d_bias, d_trans, d_init, d_final,
     d_mask) = _pl_logz_stats_alpha_lm_bwd(full, ct)
    return (d_stats, d_w, d_bias, d_trans, d_init, d_final, d_mask)


hmm_logz_stats_alpha_lm.defvjp(_hmm_logz_stats_alpha_lm_fwd,
                               _hmm_logz_stats_alpha_lm_bwd)


def hmm_estep_ckpt_acc_alpha_lm(stats_lm, trans, final_vec, mask, w,
                                bias, alphas, norms):
    """Stored-α̂ mirror of :func:`hmm_estep_ckpt_acc_lm` (full (S, S)
    ξ, dense transitions): the forward trajectory streams in, the
    kernel's serial loop is backward-only.  Outputs bit-identical.
    Not differentiable (stop-gradient inputs)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.phone_loop_estep_ckpt_acc_lm(
        None, None, None, final_vec, mask, None, None, stats_lm,
        trans=trans, w=w, bias=bias, alphas=alphas, norms=norms,
    )


@jax.custom_vjp
def forward_llh_ckpt_lm(llh_lm, trans, init_vec, mask):
    """Lane-major (S, B) variant of :func:`forward_llh_ckpt` (dense
    (S, S) transitions, general shared-graph HMM): at small state
    counts the batch-major tiles waste most of their 128-lane groups
    (S=30 → 77% dead lanes) — see :func:`forward_llh_ckpt_banded_lm`.
    ``llh_lm`` (T, S, B), ``init_vec`` (S, B); returns
    (ckpts (n_blocks, S, B), last (S, B), logz_base (B,))."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.forward_llh_ckpt_pass_lm(
        llh_lm, None, init_vec, mask, trans=trans,
    )


def _fwd_llh_ckpt_lm_fwd(*args):
    return forward_llh_ckpt_lm(*args), args


def _fwd_llh_ckpt_lm_bwd(res, ct):
    llh_lm, trans, init_vec, mask = res
    ct_ckpts, ct_last, ct_logz = ct
    _, vjp = jax.vjp(
        _fwd_llh_ckpt_reference, jnp.swapaxes(llh_lm, 1, 2), trans,
        init_vec.T, mask,
    )
    d_llh, d_trans, d_init, d_mask = vjp(
        (jnp.swapaxes(ct_ckpts, 1, 2), ct_last.T, ct_logz))
    return (jnp.swapaxes(d_llh, 1, 2), d_trans, d_init.T, d_mask)


forward_llh_ckpt_lm.defvjp(_fwd_llh_ckpt_lm_fwd, _fwd_llh_ckpt_lm_bwd)


def hmm_estep_ckpt_lm(llh_lm, ckpts, trans, final_vec, mask):
    """Lane-major mirror of :func:`hmm_estep_ckpt`: full (S, S) ξ with
    identity selections on (S, B) tiles.  Returns (γ (T, S, B),
    xi_raw (S, S)).  Not differentiable (stop-gradient inputs)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.phone_loop_estep_ckpt_pass_lm(
        llh_lm, ckpts, None, final_vec, mask, None, None, trans=trans,
    )


def hmm_estep_ckpt_acc_lm(stats_lm, ckpts, trans, final_vec, mask,
                          w, bias):
    """Accumulating + fused-ELLH lane-major general-HMM E-step: full
    (S, S) ξ, llh computed in VMEM from the stats stream, γ reduced
    in-kernel to (Σγᵀstats, counts) — neither llh nor γ exists in HBM.
    ``w (S, P)`` rows are the PER-STATE affine map (pdf selection
    folded into the columns of :meth:`NormalSet.ellh_matrix`).
    Returns (acc2 (S, P), counts (S,), γ0 (S, B), xi_raw (S, S)).
    Not differentiable (stop-gradient inputs)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.phone_loop_estep_ckpt_acc_lm(
        None, ckpts, None, final_vec, mask, None, None, stats_lm,
        trans=trans, w=w, bias=bias,
    )




@jax.custom_vjp
def forward_stats_ckpt(stats_tm, w, bias, trans, init_vec, mask):
    """Fused-ELLH checkpointed forward: streams the reduced sufficient
    statistics (T, B, P) and computes ``llh = stats @ W + bias`` on the
    MXU inside the kernel — the (T, B, S) llh array never exists in HBM
    (it is the scan kernels' dominant stream; docs/PERFORMANCE.md).
    Same returns as :func:`forward_llh_ckpt`.  custom_vjp recomputes
    through the matmul + jnp scan (SVAE ∂log Z/∂stats)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.forward_llh_ckpt_pass(
        stats_tm, trans, init_vec, mask, w=w, bias=bias,
    )


def _fwd_stats_ckpt_reference(stats_tm, w, bias, trans, init_vec, mask):
    from beer_tpu.ops import pallas_scan

    llh_tm = jnp.matmul(
        stats_tm, w, precision=jax.lax.Precision.HIGHEST
    ) + bias
    p, norms, mllh = _fwd_llh_reference(llh_tm, trans, init_vec, mask)
    t_len, b, p_dim = stats_tm.shape
    s = w.shape[1]
    k = pallas_scan._steps_per_block(b, max(s, p_dim))
    n_blocks = -(-t_len // k)
    entries = [jnp.broadcast_to(init_vec, (b, s)).astype(llh_tm.dtype)]
    for g in range(1, n_blocks):
        entries.append(p[g * k - 1])
    logz_base = (jnp.log(norms) * mask.T).sum(0) + mllh.sum(0)
    return jnp.stack(entries), p[-1], logz_base


def _fwd_stats_ckpt_fwd(*args):
    return forward_stats_ckpt(*args), args


def _fwd_stats_ckpt_bwd(res, ct):
    _, vjp = jax.vjp(_fwd_stats_ckpt_reference, *res)
    return vjp(ct)


forward_stats_ckpt.defvjp(_fwd_stats_ckpt_fwd, _fwd_stats_ckpt_bwd)


def phone_loop_estep_ckpt_acc(llh_tm, stats_tm, ckpts, trans,
                              final_vec, mask, sel_r, sel_c):
    """γ-fused variant of :func:`phone_loop_estep_ckpt`: the (T, B, S)
    γ stream is replaced by its accumulated training consumers —
    returns (xi_raw (n_r, n_c), emission moment Σγᵀstats (S, P),
    per-state counts (S,), γ(t=0) (B, S)).  γ never exists in HBM;
    the per-block transpose-dot hides behind the stream
    (tools/exp_inkernel_acc.py).  Not differentiable (stop-gradient
    inputs)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, ckpts, trans, final_vec, mask, sel_r, sel_c,
        stats_tm=stats_tm,
    )


def phone_loop_estep_stats_ckpt(stats_tm, w, bias, ckpts, trans,
                                final_vec, mask, sel_r, sel_c):
    """Fused-ELLH variant of :func:`phone_loop_estep_ckpt`: streams the
    reduced stats and regenerates llh in-kernel with the same MXU op as
    the fused forward (bit-identical α̂ recompute).  Not differentiable
    (stop-gradient inputs)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.phone_loop_estep_ckpt_pass(
        stats_tm, ckpts, trans, final_vec, mask, sel_r, sel_c,
        w=w, bias=bias,
    )


def phone_loop_estep_ckpt(llh_tm, ckpts, trans, final_vec, mask,
                          sel_r, sel_c):
    """Fused phone-loop smoothing + restricted ξ from forward
    checkpoints — the α̂ tile and per-step norms are regenerated in VMEM
    (bit-identical ops), so only llh, the checkpoints, and γ cross HBM.
    Not differentiable (stop-gradient inputs, as
    :func:`phone_loop_estep`)."""
    from beer_tpu.ops import pallas_scan

    return pallas_scan.phone_loop_estep_ckpt_pass(
        llh_tm, ckpts, trans, final_vec, mask, sel_r, sel_c,
    )


def phone_loop_estep(llh_tm, a_tm, norms_tm, trans, final_vec,
                     mask, sel_r, sel_c):
    """Fused phone-loop smoothing + in-kernel restricted ξ (Pallas; TPU
    only); returns (γ (T, B, S), raw ξ outer (n_r, n_c)).

    See :func:`beer_tpu.ops.pallas_scan.phone_loop_estep_pass`.  Not
    differentiable — conjugate statistics never carry gradients; callers
    stop-gradient the inputs.  jnp reference for tests:
    :func:`phone_loop_estep_reference`.
    """
    from beer_tpu.ops import pallas_scan

    return pallas_scan.phone_loop_estep_pass(
        llh_tm, a_tm, norms_tm, trans, final_vec, mask, sel_r, sel_c,
    )


def phone_loop_estep_reference(llh, log_trans, log_init, log_final,
                               mask, rows, cols):
    """jnp composition equal to the fused E-step kernel (batch-major
    llh): (γ posteriors (B, T, S), raw ξ outer (R, C))."""
    fbp = forward_backward_probs(llh, log_trans, log_init, log_final, mask)
    xi = expected_transition_counts_probs(
        fbp, log_trans, mask, rows=rows, cols=cols
    )
    trans_blk = jnp.exp(log_trans)[rows][:, cols]
    xi_raw = xi / jnp.maximum(trans_blk, jnp.finfo(llh.dtype).tiny)
    xi_raw = jnp.where(trans_blk > 0, xi_raw, 0.0)
    return fbp.posteriors, xi_raw


def bands_to_dense(bands) -> jnp.ndarray:
    """(a_self, a_adv, exit, w) → the dense (S, S) probability matrix
    ``diag(a_self) + superdiag(a_adv) + outer(exit, w)``."""
    a_self, a_adv, exit_v, w_v = bands
    s = a_self.shape[0]
    return (
        jnp.diag(a_self)
        + jnp.diag(a_adv[:-1], 1)
        + exit_v[:, None] * w_v[None, :]
    )


@jax.custom_vjp
def _banded_fwd_pallas(e_llh, bands, vec, mask):
    from beer_tpu.ops import pallas_scan

    probs, logcs, _ = pallas_scan.forward_pass_banded(e_llh, bands, vec, mask)
    return probs, logcs


def _banded_fwd_fwd(*args):
    return _banded_fwd_pallas(*args), args


def _banded_fwd_bwd(res, ct):
    _, vjp = jax.vjp(
        lambda e, b, v, m: _scaled_pass(e, bands_to_dense(b), v, m, False)[:2],
        *res,
    )
    return vjp(ct)


_banded_fwd_pallas.defvjp(_banded_fwd_fwd, _banded_fwd_bwd)


@jax.custom_vjp
def _banded_smoothing_pallas(e_llh, bands, final_vec, mask, a_probs):
    from beer_tpu.ops import pallas_scan

    return pallas_scan.backward_smoothing_banded(
        e_llh, bands, final_vec, mask, a_probs
    )


def _banded_smooth_fwd(*args):
    return _banded_smoothing_pallas(*args), args


def _banded_smooth_bwd(res, ct):
    _, vjp = jax.vjp(
        lambda e, b, f, m, a: _smoothing_scan(e, bands_to_dense(b), f, m, a),
        *res,
    )
    return vjp(ct)


_banded_smoothing_pallas.defvjp(_banded_smooth_fwd, _banded_smooth_bwd)


def _make_pallas_diffable(reverse: bool, time_major: bool = False):
    """Pallas pass wrapped in ``custom_vjp``: kernel forward, jnp backward.

    The Pallas kernels have no JVP rule, but callers may differentiate
    through the recursions (the sequence SVAE's encoder gradient needs
    ∂log Z/∂llh).  The VJP recomputes the pass with the differentiable
    ``_scaled_pass`` scan — bit-equivalent semantics, and the backward
    only runs when something actually differentiates through the pass.
    """

    def reference(e, t, v, m):
        if not time_major:
            return _scaled_pass(e, t, v, m, reverse)[:2]
        p, l, _ = _scaled_pass(jnp.swapaxes(e, 0, 1), t, v, m, reverse)
        return jnp.swapaxes(p, 0, 1), l.T

    @jax.custom_vjp
    def run(e_llh, trans, vec, mask):
        from beer_tpu.ops import pallas_scan

        if reverse:
            probs, logcs, _ = pallas_scan.backward_pass(
                e_llh, trans, vec, mask
            )
        else:
            probs, logcs, _ = pallas_scan.forward_pass(
                e_llh, trans, vec, mask, time_major=time_major
            )
        return probs, logcs

    def fwd(e_llh, trans, vec, mask):
        return run(e_llh, trans, vec, mask), (e_llh, trans, vec, mask)

    def bwd(res, ct):
        _, vjp = jax.vjp(reference, *res)
        return vjp(ct)

    run.defvjp(fwd, bwd)
    return run


_PALLAS_FWD = _make_pallas_diffable(False)
_PALLAS_BWD = _make_pallas_diffable(True)
_PALLAS_FWD_TM = _make_pallas_diffable(False, time_major=True)


def _select_pass(trans):
    """Pallas fused kernel on TPU (shared graphs); jnp scan elsewhere.

    Per-utterance (B, S, S) transition matrices fall back to the scan —
    the kernel keeps one (S, S) matrix resident in VMEM.  Both paths
    return ``(probs, logcs, (last_prob, last_logc))``; the last-valid
    values equal the final stored row because masked steps copy the
    carry into the outputs.
    """
    from beer_tpu.ops import pallas_scan

    if trans.ndim == 2 and pallas_scan.available():
        def run(e_llh, trans, vec, mask, reverse):
            f = _PALLAS_BWD if reverse else _PALLAS_FWD
            probs, logcs = f(e_llh, trans, vec, mask)
            return probs, logcs, (probs[:, -1], logcs[:, -1])

        return run
    return _scaled_pass


def forward_backward(
    llh: jnp.ndarray,
    log_trans: jnp.ndarray,
    log_init: jnp.ndarray,
    log_final: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> FBResult:
    """Full smoothing pass: α, β, log Z, and per-frame state posteriors.

    Uses the scaled recursion (probability carries, one log per step on
    the normalizer); log-space α/β for downstream ξ-counts are recovered
    with a single vectorized log over the stored scan outputs.
    """
    b, t_len, s = llh.shape
    if mask is None:
        mask = jnp.ones((b, t_len), llh.dtype)
    tiny = jnp.finfo(llh.dtype).tiny
    # exp(llh - per-frame max): hoisted out of the scans, one shot over T
    m_llh = jnp.max(llh, axis=-1, keepdims=True)
    e_llh = jnp.exp(llh - m_llh) * mask[..., None] + (1 - mask[..., None]) * 1.0
    # cumulative per-frame shifts enter the log-scales
    shift_fwd = jnp.cumsum(m_llh[..., 0] * mask, axis=1)

    trans = jnp.exp(log_trans)
    init_vec = jnp.broadcast_to(jnp.exp(_clamp(log_init)), (b, s)).astype(llh.dtype)
    run = _select_pass(trans)
    a_probs, a_logcs, (a_last, a_logc_last) = run(
        e_llh, trans, init_vec, mask, reverse=False
    )
    log_alpha = jnp.log(jnp.maximum(a_probs, tiny)) + (
        a_logcs + shift_fwd
    )[..., None]

    final_vec = jnp.broadcast_to(jnp.exp(_clamp(log_final)), (b, s)).astype(llh.dtype)
    # backward pass consumes e_llh at t+1; shift bookkeeping mirrors fwd
    b_probs, b_logcs, _ = run(e_llh, trans, final_vec, mask, reverse=True)
    # shift for beta_t: sum of m_llh over (t+1 .. T-1) on valid frames
    total_shift = shift_fwd[:, -1:]
    shift_bwd = total_shift - shift_fwd
    log_beta = jnp.log(jnp.maximum(b_probs, tiny)) + (
        b_logcs + shift_bwd
    )[..., None]

    log_z = a_logc_last + shift_fwd[:, -1] + jnp.log(
        jnp.maximum((a_last * final_vec).sum(-1), tiny)
    )
    # Per-frame softmax: γ_t ∝ α_t·β_t normalized over states.  Exact in
    # exact arithmetic and — unlike exp(α+β−logZ) — immune to the
    # probability floor of the scaled passes (floored states sit ~e^-87
    # below the per-frame max and softmax to ~0 instead of overflowing).
    posteriors = jax.nn.softmax(log_alpha + log_beta, axis=-1) * mask[..., None]
    return FBResult(log_alpha, log_beta, log_z, posteriors)


def forward_backward_probs(
    llh: jnp.ndarray,
    log_trans: jnp.ndarray,
    log_init: jnp.ndarray,
    log_final: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    time_major: bool = False,
    structured_trans=None,
) -> FBProbs:
    """Probability-space smoothing — the training hot path.

    Same recursions as :func:`forward_backward`, but the (B, T, S)
    log/exp/softmax recovery passes are skipped entirely: the scaled
    carries α̂/β̂ are already per-frame normalized, so

      γ_t = α̂_t·β̂_t / Σ_s α̂_t(s)·β̂_t(s)

    is *exactly* ``softmax(log_alpha + log_beta)`` (the per-(b, t)
    log-scale constants cancel in the normalization).  The backward
    recursion runs fused with the smoothing (γ, ξ-factors, and their
    normalizers emitted in-step — one Pallas kernel on TPU, the
    ``_smoothing_scan`` jnp scan elsewhere).  ξ-counts come from
    :func:`expected_transition_counts_probs` on the same by-products.
    Tests assert agreement with the log path; :class:`FBResult` remains
    available via :func:`forward_backward` for log-domain consumers.

    ``time_major=True`` takes llh as (T, B, S) and returns every (·, ·,
    S) / per-frame field time-major ((T, B, S) / (T, B)); mask stays
    (B, T).  This is the fastest layout on TPU — the kernels are
    time-major natively, so no (B, T, S) transposes run at all; pass
    the flag through to :func:`expected_transition_counts_probs`.
    """
    from beer_tpu.ops import pallas_scan

    if time_major:
        t_len, b, s = llh.shape
    else:
        b, t_len, s = llh.shape
    if mask is None:
        mask = jnp.ones((b, t_len), llh.dtype)
    tiny = jnp.finfo(llh.dtype).tiny
    m_e = mask.T[..., None] if time_major else mask[..., None]
    m_llh = jnp.max(llh, axis=-1, keepdims=True)
    e_llh = jnp.exp(llh - m_llh) * m_e + (1 - m_e) * 1.0
    shift_total = (m_llh[..., 0] * m_e[..., 0]).sum(0 if time_major else 1)

    trans = jnp.exp(log_trans)
    init_vec = jnp.broadcast_to(jnp.exp(_clamp(log_init)), (b, s)).astype(llh.dtype)
    final_vec = jnp.broadcast_to(jnp.exp(_clamp(log_final)), (b, s)).astype(llh.dtype)
    use_pallas = trans.ndim == 2 and pallas_scan.available()
    if use_pallas and structured_trans is not None and not time_major:
        # Band + rank-1 transition structure (phone loops): the kernels
        # replace the per-step (B, S) @ (S, S) MXU matmul with five VPU
        # passes.  ``structured_trans`` must densify to exp(log_trans)
        # (PhoneLoop guarantees it; tests assert equality).
        a_probs, a_logcs = _banded_fwd_pallas(
            e_llh, structured_trans, init_vec, mask
        )
        a_last, a_logc_last = a_probs[:, -1], a_logcs[:, -1]
        gamma, w, wsum, pnorm = _banded_smoothing_pallas(
            e_llh, structured_trans, final_vec, mask, a_probs
        )
    elif use_pallas:
        fwd_run = _PALLAS_FWD_TM if time_major else _PALLAS_FWD
        a_probs, a_logcs = fwd_run(e_llh, trans, init_vec, mask)
        a_last = a_probs[-1] if time_major else a_probs[:, -1]
        a_logc_last = a_logcs[-1] if time_major else a_logcs[:, -1]
        gamma, w, wsum, pnorm = (
            _smoothing_pallas_tm if time_major else _smoothing_pallas
        )(e_llh, trans, final_vec, mask, a_probs)
    else:
        e_bm = jnp.swapaxes(e_llh, 0, 1) if time_major else e_llh
        a_probs, a_logcs, (a_last, a_logc_last) = _scaled_pass(
            e_bm, trans, init_vec, mask, reverse=False
        )
        gamma, w, wsum, pnorm = _smoothing_scan(
            e_bm, trans, final_vec, mask, a_probs
        )
        if time_major:
            a_probs = jnp.swapaxes(a_probs, 0, 1)
            a_logcs = a_logcs.T
            gamma = jnp.swapaxes(gamma, 0, 1)
            w = jnp.swapaxes(w, 0, 1)
            wsum, pnorm = wsum.T, pnorm.T
    log_z = a_logc_last + shift_total + jnp.log(
        jnp.maximum((a_last * final_vec).sum(-1), tiny)
    )
    return FBProbs(a_probs, gamma, w, wsum, pnorm, a_logcs, log_z)


def expected_transition_counts_probs(
    fbp: FBProbs,
    log_trans: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    rows: Optional[jnp.ndarray] = None,
    cols: Optional[jnp.ndarray] = None,
    time_major: bool = False,
) -> jnp.ndarray:
    """ξ-counts from the probability-space carries of
    :func:`forward_backward_probs` — the fast path of
    :func:`expected_transition_counts`.

    ``u_t = softmax(log_alpha_t)`` is exactly the per-frame-normalized
    forward carry α̂_t (no softmax needed), and ``w_t =
    softmax(llh_t + log_beta_t)`` is ``normalize(e_llh_t · β̂_t)`` (the
    per-frame max shift of e_llh and the β̂ log-scale are constants that
    cancel).

    The per-frame normalizer uᵀAw — a full (B, T, S²) contraction in the
    log-space formula — is recovered *for free* from pass by-products:
    substituting α̂_{t+1} = (α̂_t A) ⊙ e_{t+1} / c_{t+1} (the forward
    recursion, c = the per-step scale) gives the exact identity

        u_tᵀ A w_{t+1} = c_{t+1} · Σ_j α̂_{t+1}(j) β̂_{t+1}(j)
                                  / Σ_j e_{t+1}(j) β̂_{t+1}(j)

    where c_{t+1} = exp(logc_{t+1} − logc_t) and Σ α̂β̂ is the posterior
    normalizer — both already computed.  (Masked steps copy the carries,
    so c = 1 there; their weight is zeroed by the mask anyway.)
    """
    tiny = jnp.finfo(fbp.probs_fwd.dtype).tiny
    logcs = fbp.fwd_log_scales
    if time_major:
        t_len, b = fbp.w_sums.shape
        u = fbp.probs_fwd[:-1]                         # (T-1, B, S)
        w = fbp.probs_w[1:]
        step_norm = jnp.exp(logcs[1:] - logcs[:-1])    # c_{t+1}, (T-1, B)
        denom = step_norm * fbp.post_norm[1:] / jnp.maximum(
            fbp.w_sums[1:], tiny
        )
        m_tail = jnp.ones((t_len - 1, b), u.dtype) if mask is None \
            else mask.T[1:]
    else:
        b, t_len = fbp.w_sums.shape
        u = fbp.probs_fwd[:, :-1]                      # (B, T-1, S)
        w = fbp.probs_w[:, 1:]
        step_norm = jnp.exp(logcs[:, 1:] - logcs[:, :-1])
        denom = step_norm * fbp.post_norm[:, 1:] / jnp.maximum(
            fbp.w_sums[:, 1:], tiny
        )
        m_tail = jnp.ones((b, t_len - 1), u.dtype) if mask is None \
            else mask[:, 1:]
    weight = jnp.where(denom > 1e-30, m_tail / jnp.maximum(denom, 1e-30), 0.0)
    return _xi_outer(u, w, weight, jnp.exp(log_trans), rows, cols,
                     "tbi,tbj,tb->ij" if time_major else "bti,btj,bt->ij")


def _xi_outer(u, w, weight, trans_prob, rows, cols,
              spec: str = "bti,btj,bt->ij"):
    """Σ_t weight_t · outer(u_t, w_t) ⊙ A, optionally restricted.

    Restriction uses one-hot selection *matmuls*, not fancy-index
    gathers: a strided gather along the minor (lane) axis of a (B, T, S)
    array is a per-element op on TPU — orders of magnitude slower than
    the equivalent (B·T, S) @ (S, n) MXU contraction.  The (batch, time)
    axes are contracted in place (no reshape — an explicit flatten of
    the sliced operands forces full-size copies XLA otherwise fuses
    away).
    """
    if rows is not None:
        s = u.shape[-1]
        sel_r = jax.nn.one_hot(rows, s, dtype=u.dtype)     # (n_r, S)
        sel_c = jax.nn.one_hot(cols, s, dtype=u.dtype)     # (n_c, S)
        u = jnp.matmul(u, sel_r.T, precision=jax.lax.Precision.HIGHEST)
        w = jnp.matmul(w, sel_c.T, precision=jax.lax.Precision.HIGHEST)
        # the (S, S) block restriction stays a *gather* — it is tiny, and
        # a selection matmul at default precision rounds the transition
        # probabilities to bf16 (~0.3% ξ bias, caught against an f64
        # brute-force forward-backward oracle)
        trans_prob = trans_prob[rows][:, cols]
    outer = jnp.einsum(
        spec, u, w, weight,
        precision=jax.lax.Precision.HIGHEST,
    )
    return outer * trans_prob


def expected_transition_counts(
    log_alpha: jnp.ndarray,
    log_beta: jnp.ndarray,
    llh: jnp.ndarray,
    log_trans: jnp.ndarray,
    log_z: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    chunk: int = 16,
    rows: Optional[jnp.ndarray] = None,
    cols: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Σ_t ξ_t summed over the batch: E[#transitions i→j], (S, S).

    ξ_t(i, j) = exp(α_t(i) + log A(i, j) + llh_{t+1}(j) + β_{t+1}(j) − log Z).

    Computed from *per-frame-normalized* α and (llh+β) factors with the
    exact per-frame normalizer Σ_ij (a much cheaper matvec), so the
    result is independent of any absolute scale/floor the recursions
    carry and no exponential can overflow:

        ξ_t = outer(u_t, w_t) ⊙ A / (u_tᵀ A w_t),  u, w per-frame softmaxed.

    The accumulation over (b, t) is one einsum (MXU contraction); no
    (T, S, S) tensor is ever materialized.

    ``rows``/``cols`` (int arrays) restrict the *output* to the sub-block
    ξ[rows, cols] — e.g. the phone loop only needs the (unit-ends ×
    unit-starts) arcs — while the normalizer still runs over all arcs.
    """
    del chunk  # kept for API compatibility; no longer needed
    b, t_len, s = llh.shape
    if mask is None:
        mask = jnp.ones((b, t_len), llh.dtype)
    alpha = log_alpha[:, :-1]                          # (B, T-1, S)
    v = _clamp(llh[:, 1:] + log_beta[:, 1:])           # (B, T-1, S)
    u = jax.nn.softmax(alpha, axis=-1)
    w = jax.nn.softmax(v, axis=-1)
    trans_prob = jnp.exp(log_trans)
    denom = jnp.einsum(
        "bti,ij,btj->bt", u, trans_prob, w,
        precision=jax.lax.Precision.HIGHEST,
    )
    weight = jnp.where(denom > 1e-30, mask[:, 1:] / jnp.maximum(denom, 1e-30), 0.0)
    return _xi_outer(u, w, weight, trans_prob, rows, cols)


# ----------------------------------------------------------------------
# Associative-scan variant (O(log T) depth)
# ----------------------------------------------------------------------
def _semiring_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(logsumexp, +) matrix product of batched (..., S, S) log-matrices."""
    a_shift = jnp.max(a, axis=-1, keepdims=True)  # rows of a
    b_shift = jnp.max(b, axis=-2, keepdims=True)  # cols of b
    prod = jnp.einsum(
        "...ik,...kj->...ij", jnp.exp(a - a_shift), jnp.exp(b - b_shift),
        precision=jax.lax.Precision.HIGHEST,
    )
    return _clamp(a_shift + b_shift + jnp.log(jnp.maximum(prod, 1e-37)))


def forward_assoc(
    llh: jnp.ndarray,
    log_trans: jnp.ndarray,
    log_init: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """log_alpha via ``lax.associative_scan`` over transition operators.

    ``chunk=None`` materializes (B, T, S, S) operators — fine for
    moderate T·S².  ``chunk=C`` bounds memory at (B, C, S, S) (SURVEY §7
    "blockwise scan": sequential ``lax.scan`` over T/C blocks, O(log C)
    associative scan within each block) — the long-sequence /
    small-state CP analogue of SURVEY §5.7.
    """
    b, t_len, s = llh.shape
    if mask is None:
        mask = jnp.ones((b, t_len), llh.dtype)
    eye = jnp.where(jnp.eye(s, dtype=bool), 0.0, _NEG_INF).astype(llh.dtype)

    if chunk is None or chunk >= t_len:
        # Operator for step t>0: M_t[i, j] = log A[i, j] + llh[t, j];
        # padded steps use the identity operator (0 diag, -inf off-diag).
        ops = log_trans[None, None] + llh[:, :, None, :]
        ops = jnp.where(mask[:, :, None, None] > 0, ops, eye[None, None])
        # Fold the init into the t=0 operator: row i -> alpha_0 (constant).
        alpha0 = _clamp(log_init + llh[:, 0])  # (B, S)
        ops = ops.at[:, 0].set(jnp.broadcast_to(alpha0[:, None, :], (b, s, s)))
        prefix = jax.lax.associative_scan(_semiring_matmul, ops, axis=1)
        # alpha_t = prefix_t[i, :] for any i (t=0 row was constant in i).
        log_alpha = prefix[:, :, 0, :]
    else:
        n_chunks = -(-t_len // chunk)
        pad = n_chunks * chunk - t_len
        llh_p = jnp.pad(llh, ((0, 0), (0, pad), (0, 0)))
        mask_p = jnp.pad(mask, ((0, 0), (0, pad)))
        # t=0 is handled by a rows-constant operator + a carry whose
        # logsumexp is 0 (−log S per state), so alpha_0 comes out exact.
        alpha0 = _clamp(log_init + llh_p[:, 0])
        carry0 = jnp.full((b, s), -math.log(s), llh.dtype)

        llh_c = llh_p.reshape(b, n_chunks, chunk, s).swapaxes(0, 1)
        mask_c = mask_p.reshape(b, n_chunks, chunk).swapaxes(0, 1)
        first = jnp.broadcast_to(alpha0[:, None, :], (b, s, s))

        def block(carry, inp):
            i, llh_b, m_b = inp              # (B, C, S), (B, C)
            ops = log_trans[None, None] + llh_b[:, :, None, :]
            ops = jnp.where(m_b[:, :, None, None] > 0, ops, eye[None, None])
            ops = jnp.where(
                (i == 0) & (jnp.arange(chunk) == 0)[None, :, None, None],
                first[:, None], ops,
            )
            prefix = jax.lax.associative_scan(_semiring_matmul, ops, axis=1)
            # alpha within block: carry ⊗ prefix (log mat-vec per t)
            alpha_b = jax.scipy.special.logsumexp(
                carry[:, None, :, None] + prefix, axis=2
            )
            return alpha_b[:, -1], alpha_b

        _, blocks = jax.lax.scan(
            block, carry0,
            (jnp.arange(n_chunks), llh_c, mask_c),
        )                                     # (nc, B, C, S)
        log_alpha = blocks.swapaxes(0, 1).reshape(b, n_chunks * chunk, s)
        log_alpha = log_alpha[:, :t_len]

    last = (mask.sum(1) - 1).astype(jnp.int32)
    alpha_last = jnp.take_along_axis(
        log_alpha, last[:, None, None].repeat(s, -1), axis=1
    )[:, 0]
    return log_alpha, alpha_last


# ----------------------------------------------------------------------
# Viterbi
# ----------------------------------------------------------------------
def viterbi(
    llh: jnp.ndarray,
    log_trans: jnp.ndarray,
    log_init: jnp.ndarray,
    log_final: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched best-path decoding.

    Returns (paths (B, T) int32 — state ids, valid where mask=1 —, and
    best-path log-probability (B,)).
    """
    b, t_len, s = llh.shape
    if mask is None:
        mask = jnp.ones((b, t_len), llh.dtype)
    score0 = _clamp(log_init + llh[:, 0])
    ids = jnp.arange(s, dtype=jnp.int32)
    lt = log_trans if log_trans.ndim == 3 else log_trans[None]

    def fwd_step(carry, inp):
        llh_t, m_t = inp
        cand = carry[:, :, None] + lt  # (B, S_prev, S_next)
        best_prev = jnp.argmax(cand, axis=1).astype(jnp.int32)  # (B, S)
        new = _clamp(llh_t + jnp.max(cand, axis=1))
        carry_new = m_t * new + (1 - m_t) * carry
        bp = jnp.where(m_t > 0, best_prev, ids[None, :])  # identity on pads
        return carry_new, bp

    score_last, bps = jax.lax.scan(
        fwd_step,
        score0,
        (jnp.swapaxes(llh[:, 1:], 0, 1), jnp.swapaxes(mask[:, 1:, None], 0, 1)),
    )  # bps: (T-1, B, S)
    best_last = jnp.argmax(score_last + log_final, axis=-1).astype(jnp.int32)
    best_score = jnp.max(score_last + log_final, axis=-1)

    def back_step(state, bp_t):
        prev = jnp.take_along_axis(bp_t, state[:, None], axis=1)[:, 0]
        return prev, prev

    _, path_rev = jax.lax.scan(back_step, best_last, bps, reverse=True)
    paths = jnp.concatenate([path_rev, best_last[None]], axis=0)  # (T, B)
    return jnp.swapaxes(paths, 0, 1), best_score


def viterbi_banded(
    llh: jnp.ndarray,
    bands,
    log_init: jnp.ndarray,
    log_final: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best-path decoding through the band + rank-1 factorization.

    ``bands = (a_self, a_adv, exit, w)`` probability-space vectors with
    ``bands_to_dense(bands) == exp(log_trans)`` exactly and NO
    overlapping contributions (the phone-loop guarantee,
    ``PhoneLoop._structured_trans``).  Per step this is O(B*S) VPU work
    — the dense :func:`viterbi` builds a (B, S, S) candidate tensor —
    and the backtrace state is 1 int8 choice per (t, b, s) plus one
    exit argmax per (t, b) instead of an int32 backpointer per state.

    Returns ``(paths (B, T) int32, best log-prob (B,))``; identical to
    the dense path (score ties aside, which are measure-zero for float
    inputs).
    """
    a_self, a_adv, exit_scat, w_scat = bands
    b, t_len, s = llh.shape
    dt = llh.dtype
    if mask is None:
        mask = jnp.ones((b, t_len), dt)

    def logv(v):
        return jnp.where(v > 0, jnp.log(jnp.maximum(v, 1e-37)), _NEG_INF)

    ls, la, le, lw = (logv(v.astype(dt)) for v in
                      (a_self, a_adv, exit_scat, w_scat))

    from beer_tpu.ops import pallas_scan

    if pallas_scan.available() and t_len > 1 and s >= 64:
        # kernel forward + kernel one-hot backtrace: the whole (max,+)
        # chain and the reverse pointer chase run in VMEM — ~1000
        # serial XLA dispatches collapse into time-blocked kernels.
        # (s >= 64: below that the kernels waste most of every vreg —
        # measured slower than dense at S=36, tools/exp_align_bench.py)
        ch, ex_args, alpha_last = pallas_scan.viterbi_fwd_banded(
            llh, (ls, la, le, lw), _clamp(log_init), mask)
        final_sc = alpha_last + log_final
        best_last = jnp.argmax(final_sc, axis=-1).astype(jnp.int32)
        best_score = jnp.max(final_sc, axis=-1)
        last_onehot = jax.nn.one_hot(best_last, s, dtype=jnp.float32)
        paths = pallas_scan.viterbi_backtrace_banded(
            ch, ex_args, last_onehot)
        return paths, best_score
    else:
        neg = jnp.full((b, 1), _NEG_INF, dt)

        def fwd_step(alpha, inp):
            llh_t, m_t = inp
            c_self = alpha + ls
            c_adv = jnp.concatenate([neg, (alpha + la)[:, :-1]], axis=1)
            ex = alpha + le
            ex_arg = jnp.argmax(ex, axis=-1).astype(jnp.int32)   # (B,)
            c_loop = jnp.max(ex, axis=-1, keepdims=True) + lw
            stacked = jnp.stack([c_self, c_adv, c_loop])         # (3, B, S)
            choice = jnp.argmax(stacked, axis=0).astype(jnp.int8)
            new = _clamp(llh_t + jnp.max(stacked, axis=0))
            alpha_new = m_t * new + (1 - m_t) * alpha
            choice = jnp.where(m_t > 0, choice, jnp.int8(0))     # pads: stay
            ex_arg = jnp.where(m_t[:, 0] > 0, ex_arg, 0)
            return alpha_new, (choice, ex_arg)

        alpha_last, (choices, ex_args) = jax.lax.scan(
            fwd_step,
            _clamp(log_init + llh[:, 0]),
            (jnp.swapaxes(llh[:, 1:], 0, 1),
             jnp.swapaxes(mask[:, 1:, None], 0, 1)),
        )
    best_last = jnp.argmax(alpha_last + log_final, axis=-1).astype(jnp.int32)
    best_score = jnp.max(alpha_last + log_final, axis=-1)

    def back_step(state, inp):
        ch_t, exarg_t = inp
        c = jnp.take_along_axis(ch_t, state[:, None], axis=1)[:, 0]
        prev = jnp.where(
            c == 0, state, jnp.where(c == 1, state - 1, exarg_t))
        return prev, prev

    _, path_rev = jax.lax.scan(
        back_step, best_last, (choices, ex_args), reverse=True)
    paths = jnp.concatenate([path_rev, best_last[None]], axis=0)
    return jnp.swapaxes(paths, 0, 1), best_score
