"""Pallas TPU kernel for the scaled HMM forward/backward recursions.

The framework's hottest sequential op (SURVEY §3.2).  ``lax.scan`` pays
per-iteration XLA loop overhead and bounces the carry through HBM-visible
buffers every step; here the whole T-loop is ONE kernel:

* grid over time with **time-major (T, B, S) layout** (so each block is
  (K, B, S) — last two dims satisfy the TPU (8, 128) tiling rule);
  Pallas auto-pipelines the e_llh/mask tiles (HBM→VMEM double-buffering)
  while the MXU runs the (B, S) @ (S, S) step matmul,
* **K = STEPS_PER_BLOCK time steps run inside one kernel invocation**
  (unrolled), so the per-grid-step dispatch/semaphore overhead — the
  dominant cost at small S — is paid once per K steps instead of every
  step,
* the carry (normalized probabilities + per-sequence log-scale) lives in
  VMEM scratch across grid steps — it never touches HBM,
* per step the only transcendental is one log on the (B, 1) normalizer
  (the scaled-algorithm formulation of ``semiring_scan._scaled_pass``).

The backward recursion reuses the kernel shape with reversed block index
maps (time descending inside each block) and the transposed transition
matrix.  Exact jnp fallback: ``semiring_scan._scaled_pass`` (tests assert
agreement in interpret mode); callers pass batch-major (B, T, S) and
transposes happen here.

Kernel inventory (each with an exact jnp fallback in semiring_scan):

* :func:`forward_pass` / :func:`backward_pass` — scaled passes over
  precomputed e_llh (the log-domain ``forward_backward`` recovery path),
* :func:`backward_smoothing_pass` — v-space backward + fused smoothing
  (γ, ŵ, normalizers emitted in-step; no transcendentals),
* :func:`forward_pass_banded` / :func:`backward_smoothing_banded` —
  band + rank-1 phone-loop transitions, O(S) per step (used for large
  state counts where the dense MXU step loses),
* :func:`forward_llh_pass` + :func:`phone_loop_estep_pass` — the fully
  fused training hot path: raw-llh inputs (e never in HBM), per-step
  norms for exactly-conditioned ξ weights, in-kernel restricted ξ, and
  3-bf16-pass (~f32) transition matmuls.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Test hook: BEER_PALLAS_INTERPRET=1 (or setting this flag + clearing
# ``available.cache_clear()``) forces every kernel through the Pallas
# interpreter so the MODEL-LEVEL fused paths (PhoneLoop/HMM
# infer+accumulate) run on CPU CI — kernel-level interpret tests alone
# don't cover the models' dispatch/padding glue.
FORCE_INTERPRET = os.environ.get("BEER_PALLAS_INTERPRET", "") == "1"

# time steps per kernel invocation.  Scoped VMEM measured on a v5e
# fits (27 + 6.7·K) · B·S·4 bytes (double-buffered e/prob/logc tiles +
# carry scratch + constant overheads); the per-kernel limit is raised to
# 100 MB below (v5e core VMEM = 128 MB), leave headroom.
STEPS_PER_BLOCK = 8
_VMEM_BUDGET = 80 * 1024 * 1024

# Default number of independent batch sub-chains inside the BATCH-MAJOR
# ckpt kernels' serial recursions (overridable per call via
# ``batch_chunks=``; the lane-major kernels ignore it — see
# _make_fwd_llh_ckpt_kernel_lm).  Each
# chunk advances its own carry, so the scheduler gets ``n_chunks``
# independent dependency chains per serial step to overlap — the
# latency-engineering lever named in docs/PERFORMANCE.md.  Per-row
# arithmetic is unchanged (every op in the chain is row-wise), so chunked
# forward/γ outputs are bit-identical to the unchunked kernel; only the
# ξ/accumulator reductions change summation order (≈1e-7 relative).
BATCH_CHUNKS = int(os.environ.get("BEER_SCAN_BATCH_CHUNKS", "1"))

# Route the models' fused E-steps through the lane-major (S, B) kernel
# variants (see the lane-major section below): at small state counts the
# batch-major (B, S) tiles pad S up to whole 128-lane groups (41% dead
# lanes at S=150, 77% at S=30) while the serial chains are ~all VPU ops.
# "auto" compares f32 vregs per (B, S) value with a measured 2.5×
# lane-major handicap (see use_lane_major) — lane-major wins everywhere
# except tiny per-shard batches (B=16 at S=150).  Module-level so
# tests/benchmarks can flip it; consulted by PhoneLoop.infer / HMM.infer
# at trace time ("0" = off, "1" = always, "auto" = by shape).
# Default "auto": the on-chip gate run (tools/exp_batch_chunks.py,
# v5e, B=512 T=500 S=150) measured the lane-major fused pair at
# 1.05 ms vs 2.85 ms batch-major — the chains are VPU-throughput-bound,
# exactly the dead-lane hypothesis (docs/PERFORMANCE.md).
LANE_MAJOR = os.environ.get("BEER_LANE_MAJOR", "auto")

# In-kernel γᵀ@stats moment accumulation for the lane-major phone-loop
# E-step (the (T, S, B) γ array never touches HBM — see
# _make_estep_ckpt_acc_kernel_lm).  "1" = on (measured +20% on the
# headline config, tools/exp_fuse_acc_lm.py), "0" = γ-emitting kernel
# + XLA einsum.
FUSE_ACC = os.environ.get("BEER_FUSE_ACC", "1") != "0"

# In-kernel ELLH for the lane-major phone-loop E-step: stream the
# reduced stats (T, P, B) instead of llh (T, S, B) and compute
# llh = W @ stats + bias in VMEM (_llh_block_lm) — llh never exists in
# HBM (saves its write + two reads).  Takes effect only with FUSE_ACC
# (the accumulating kernel already streams stats; llh-streaming
# smoothing would need both streams).  Gated by
# tools/exp_fuse_ellh_lm.py.
FUSE_ELLH = os.environ.get("BEER_FUSE_ELLH", "1") != "0"

# Dense-transition propagate as ONE stacked bf16 MXU dot (K=3S) instead
# of three K=S dots — same bf16_3x cross terms, one accumulator.  In
# isolation it is 1.9× faster per serial step at S=32 and 1.45× at
# S=152 (tools/exp_chain_occupancy.py --propagate dot3 vs dot1), but
# END-TO-END it is a wash: bench A/B on the v5e reads hmm 226.6→230.0M
# (+1.5%), recognizer 197.5→188.4M (−4.6%) — the propagate is <5% of
# the fused E-step (the B-sweeps' throughput-bound verdict) and the
# per-step re-stack of the CHANGING carry ([p_hi;p_hi;p_lo] concat)
# costs more than the saved MXU passes at S=18.  Default OFF; kept as
# an env-gated experiment for future shapes.
DOT1 = os.environ.get("BEER_DOT1", "0") != "0"

# Store the forward α̂ trajectory (T, S, B) + per-step normalizers
# (T, 1, B) in HBM and drop the smoothing kernel's serial forward
# RECOMPUTE: the fused E-step's per-step loop then carries only the
# backward chain (the forward re-run from block checkpoints was ~45%
# of its serial vreg issues).  Stored values are BIT-IDENTICAL to the
# recompute (same arithmetic from the same checkpoints), so γ/ξ/acc
# outputs are unchanged (tests/test_pallas_scan.py; ELBO bit-match
# confirmed on the v5e).
#
# MEASURED A WASH on the v5e (tools/exp_store_alpha.py, bench shape
# B=512 S=150 T=483: 1.709 → 1.719 ms/epoch, 0.994×): the removed
# serial recompute is repaid exactly by the α̂ round-trip's ~310 MB of
# extra HBM traffic (~0.8-1.2 ms at the pallas-pipeline's measured
# 250-400 GB/s, only partly hidden behind compute) — the same
# trade, inverted, that made round 3's switch TO checkpointing
# wall-clock-neutral.  The fwd+bwd interleave in the recompute kernel
# also dual-issues well, so the removed chain was cheaper than its
# vreg count suggests.  Default OFF; kept env-activatable for
# HBM-richer parts where the trade could flip.  "auto" = on while the
# α̂ array stays under BEER_ALPHA_MAX_MB (default 768 MB).
STORE_ALPHA = os.environ.get("BEER_STORE_ALPHA", "0")
_ALPHA_MAX_BYTES = int(
    float(os.environ.get("BEER_ALPHA_MAX_MB", "768")) * 1024 * 1024
)


def use_store_alpha(t: int, s: int, b: int) -> bool:
    """Trace-time gate for the stored-α̂ fused E-step (static shapes)."""
    mode = str(STORE_ALPHA).strip().lower()
    if mode in ("1", "true", "on", "yes"):
        return True
    if mode == "auto":
        return t * s * b * 4 <= _ALPHA_MAX_BYTES
    return False


def use_lane_major(b: int, s: int) -> bool:
    """Trace-time orientation choice for the fused E-step kernels.

    Compares f32 vregs per (B, S) value in each orientation, but weights
    the lane-major side by 2.5×: its kernels carry the acc/ellh fusions
    (γ and llh never touch HBM), so it beats batch-major well past vreg
    parity.  Factor fixed by an on-chip dp-shard sweep (v5e, S=150,
    T=500, full vb_step): lane-major won at B=32 (0.34 vs 0.58 ms,
    vreg ratio 2.4) and B=64 (0.47 vs 1.02), batch-major only at B=16
    (ratio 4.75) — the threshold sits between those ratios.
    """
    mode = LANE_MAJOR
    if mode in (True, "1", "true"):
        return True
    if mode == "auto":
        bm_vregs = -(-b // 8) * -(-s // 128)
        lm_vregs = -(-s // 8) * -(-b // 128)
        return lm_vregs < 2.5 * bm_vregs
    return False


def _resolve_chunks(batch_chunks, b, align=8):
    """Per-call chunk count (batch-major kernels only — the lane-major
    passes ignore the knob, see :func:`_make_fwd_llh_ckpt_kernel_lm`):
    must divide B into ×8-sublane-aligned row slices; anything else
    falls back to the unchunked kernel."""
    c = BATCH_CHUNKS if batch_chunks is None else batch_chunks
    if c < 1 or b % c or (b // c) % align:
        return 1
    return c


def _steps_per_block(b: int, s: int) -> int:
    k = STEPS_PER_BLOCK
    while k > 1 and (27 + 6.7 * k) * b * s * 4 > _VMEM_BUDGET:
        k //= 2
    return k


def _make_fwd_kernel(k_steps: int):
    def kernel(e_ref, m_ref, trans_ref, init_ref,
               prob_out, logc_out, carry_p, carry_c):
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            carry_p[:] = init_ref[:].astype(jnp.float32)
            carry_c[:] = jnp.zeros_like(carry_c)

        p = carry_p[:]
        c = carry_c[:]
        trans = trans_ref[:]
        for k in range(k_steps):
            propagated = jnp.dot(
                p, trans, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            if k == 0:
                base = jnp.where(pid == 0, p, propagated)
            else:
                base = propagated
            raw = base * e_ref[k].astype(jnp.float32)    # (B, S)
            norm = jnp.maximum(raw.sum(-1, keepdims=True), tiny)
            new_p = raw / norm
            new_c = c + jnp.log(norm)
            keep = m_ref[k].astype(jnp.float32)          # (B, 1)
            if k == 0:
                keep = jnp.where(pid == 0, 1.0, keep)    # t=0 always fires
            p = keep * new_p + (1.0 - keep) * p
            c = keep * new_c + (1.0 - keep) * c
            prob_out[k] = p.astype(prob_out.dtype)
            logc_out[k] = c.astype(logc_out.dtype)
        carry_p[:] = p
        carry_c[:] = c

    return kernel


def _make_bwd_kernel(k_steps: int, n_blocks: int, t_len: int):
    """Backward: β̂ carries; step multiplies by e at t+1 *before* the
    matmul.  Block ``pid`` covers absolute times
    [(n_blocks-1-pid)·K, …+K); inside, k runs K-1 → 0 (time descending).
    """

    def kernel(e_ref, m_ref, trans_t_ref, final_ref,
               prob_out, logc_out, carry_p, carry_c):
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            f = final_ref[:].astype(jnp.float32)
            norm0 = jnp.maximum(f.sum(-1, keepdims=True), tiny)
            carry_p[:] = f / norm0
            carry_c[:] = jnp.log(norm0)

        p = carry_p[:]
        c = carry_c[:]
        trans_t = trans_t_ref[:]
        base_t = (n_blocks - 1 - pid) * k_steps
        for k in range(k_steps - 1, -1, -1):
            v = p * e_ref[k].astype(jnp.float32)
            raw = jnp.dot(
                v, trans_t, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            norm = jnp.maximum(raw.sum(-1, keepdims=True), tiny)
            new_p = raw / norm
            new_c = c + jnp.log(norm)
            keep = m_ref[k].astype(jnp.float32)
            # t = T-1 keeps the final vector (no e consumed); padded tail
            # rows (t >= T-1) already carry mask 0 from the shift
            keep = jnp.where(base_t + k >= t_len - 1, 0.0, keep)
            p = keep * new_p + (1.0 - keep) * p
            c = keep * new_c + (1.0 - keep) * c
            prob_out[k] = p.astype(prob_out.dtype)
            logc_out[k] = c.astype(logc_out.dtype)
        carry_p[:] = p
        carry_c[:] = c

    return kernel


def _call(kernel, e_tm, m_tm, trans, vec, index_map, k_steps,
          interpret=False):
    t_pad, b, s = e_tm.shape
    n_blocks = t_pad // k_steps
    dtype = e_tm.dtype
    probs, logcs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((k_steps, b, s), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k_steps, b, 1), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k_steps, b, s), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k_steps, b, 1), index_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, s), dtype),
            jax.ShapeDtypeStruct((t_pad, b, 1), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, s), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
        # the default scoped-VMEM limit is 16 MB; a v5e core has 128 MB —
        # raise it so multi-step blocks fit at bench shapes (B·S ≈ 75k)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or FORCE_INTERPRET,
    )(e_tm, m_tm, trans, vec)
    return probs, logcs


def _shift_right(x):
    """y[:, j] = x[:, j-1]; y[:, 0] = 0 — lane shift on a (B, S) value."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, 0.0, pltpu.roll(x, 1, 1))


def _shift_left(x):
    """y[:, j] = x[:, j+1]; y[:, -1] = 0."""
    s = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == s - 1, 0.0, pltpu.roll(x, s - 1, 1))


def _make_fwd_banded_kernel(k_steps: int):
    """Forward kernel for band + rank-1 transition structure.

    Phone-loop transitions (see ``PhoneLoop._structured_trans``) are a
    diagonal (self-loops) + first superdiagonal (within-unit advances)
    + rank-1 loop-back block (unit ends × unit starts):

        (pA)[j] = p[j]·a_self[j] + p[j-1]·a_adv[j-1]
                  + (Σ_i p[i]·exit[i]) · w[j]

    — five VPU passes instead of a (B, S) @ (S, S) MXU matmul (which at
    HIGHEST precision is ~6 bf16 passes over S² and dominates the dense
    kernel's step time).
    """

    def kernel(e_ref, m_ref, self_ref, adv_ref, exit_ref, w_ref, init_ref,
               prob_out, logc_out, carry_p, carry_c):
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            carry_p[:] = init_ref[:].astype(jnp.float32)
            carry_c[:] = jnp.zeros_like(carry_c)

        p = carry_p[:]
        c = carry_c[:]
        a_self = self_ref[:]
        a_adv = adv_ref[:]
        exit_v = exit_ref[:]
        w_v = w_ref[:]
        for k in range(k_steps):
            q = (p * exit_v).sum(-1, keepdims=True)       # (B, 1)
            propagated = p * a_self + _shift_right(p * a_adv) + q * w_v
            if k == 0:
                base = jnp.where(pid == 0, p, propagated)
            else:
                base = propagated
            raw = base * e_ref[k].astype(jnp.float32)
            norm = jnp.maximum(raw.sum(-1, keepdims=True), tiny)
            new_p = raw / norm
            new_c = c + jnp.log(norm)
            keep = m_ref[k].astype(jnp.float32)
            if k == 0:
                keep = jnp.where(pid == 0, 1.0, keep)
            p = keep * new_p + (1.0 - keep) * p
            c = keep * new_c + (1.0 - keep) * c
            prob_out[k] = p.astype(prob_out.dtype)
            logc_out[k] = c.astype(logc_out.dtype)
        carry_p[:] = p
        carry_c[:] = c

    return kernel


def _make_smoothing_banded_kernel(k_steps: int):
    """Banded variant of :func:`_make_smoothing_kernel`:

        (Av)[i] = v[i]·a_self[i] + v[i+1]·a_adv[i] + exit[i]·(Σ_j w[j]·v[j])
    """

    def kernel(e_ref, m_ref, mn_ref, a_ref, self_ref, adv_ref, exit_ref,
               w_ref, final_ref, gamma_out, w_out, wsum_out, pnorm_out,
               carry_v):
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            f = final_ref[:].astype(jnp.float32)
            carry_v[:] = f / jnp.maximum(f.sum(-1, keepdims=True), tiny)

        v_hat = carry_v[:]
        a_self = self_ref[:]
        a_adv = adv_ref[:]
        exit_v = exit_ref[:]
        w_v = w_ref[:]
        final = final_ref[:].astype(jnp.float32)
        for k in range(k_steps - 1, -1, -1):
            m_t = m_ref[k].astype(jnp.float32)
            mn_t = mn_ref[k].astype(jnp.float32)
            is_last = m_t * (1.0 - mn_t)
            r = (v_hat * w_v).sum(-1, keepdims=True)      # (B, 1)
            u1 = v_hat * a_self + _shift_left(v_hat) * a_adv + r * exit_v
            u1 = is_last * final + (1.0 - is_last) * u1
            nu = jnp.maximum(u1.sum(-1, keepdims=True), tiny)
            b = u1 / nu
            ab = a_ref[k].astype(jnp.float32) * b
            pn = ab.sum(-1, keepdims=True)
            gamma = (ab / jnp.maximum(pn, tiny)) * m_t
            v = e_ref[k].astype(jnp.float32) * u1
            sv = jnp.maximum(v.sum(-1, keepdims=True), tiny)
            w = v / sv
            v_hat = m_t * w + (1.0 - m_t) * v_hat
            gamma_out[k] = gamma.astype(gamma_out.dtype)
            w_out[k] = w.astype(w_out.dtype)
            wsum_out[k] = (sv / nu).astype(wsum_out.dtype)
            pnorm_out[k] = pn.astype(pnorm_out.dtype)
        carry_v[:] = v_hat

    return kernel


def _band_specs(s):
    spec = pl.BlockSpec((1, s), lambda t: (0, 0), memory_space=pltpu.VMEM)
    return [spec] * 4


def forward_pass_banded(e_llh, bands, init_vec, mask,
                        interpret: bool = False):
    """Scaled forward with band + rank-1 transitions.

    ``bands = (a_self, a_adv, exit_scat, w_scat)``, each (S,) probability
    -space vectors; semantics identical to :func:`forward_pass` with the
    dense matrix ``diag(a_self) + superdiag(a_adv) + outer(exit, w)``.
    """
    b, t_len, s = e_llh.shape
    k_steps = _steps_per_block(b, s)
    t_pad = -(-t_len // k_steps) * k_steps
    e_tm = jnp.swapaxes(_pad_time(e_llh, t_pad, 1.0), 0, 1)
    m_tm = jnp.swapaxes(_pad_time(mask, t_pad, 0.0), 0, 1)[..., None]
    n_blocks = t_pad // k_steps
    idx = lambda t: (t, 0, 0)
    big = pl.BlockSpec((k_steps, b, s), idx, memory_space=pltpu.VMEM)
    small = pl.BlockSpec((k_steps, b, 1), idx, memory_space=pltpu.VMEM)
    probs, logcs = pl.pallas_call(
        _make_fwd_banded_kernel(k_steps),
        grid=(n_blocks,),
        in_specs=[big, small] + _band_specs(s) + [
            pl.BlockSpec((b, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[big, small],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, s), e_llh.dtype),
            jax.ShapeDtypeStruct((t_pad, b, 1), e_llh.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, s), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or FORCE_INTERPRET,
    )(e_tm, m_tm, *[v.reshape(1, s) for v in bands], init_vec)
    probs = jnp.swapaxes(probs, 0, 1)[:, :t_len]
    logcs = jnp.swapaxes(logcs[..., 0], 0, 1)[:, :t_len]
    return probs, logcs, (probs[:, -1], logcs[:, -1])


def backward_smoothing_banded(e_llh, bands, final_vec, mask, a_probs,
                              interpret: bool = False):
    """Banded variant of :func:`backward_smoothing_pass`."""
    b, t_len, s = e_llh.shape
    dtype = e_llh.dtype
    k_steps = _steps_per_block(b, s)
    t_pad = -(-t_len // k_steps) * k_steps
    mn = jnp.concatenate(
        [mask[:, 1:], jnp.zeros((b, t_pad - t_len + 1), mask.dtype)], axis=1
    )
    e_tm = jnp.swapaxes(_pad_time(e_llh, t_pad, 1.0), 0, 1)
    m_tm = jnp.swapaxes(_pad_time(mask, t_pad, 0.0), 0, 1)[..., None]
    mn_tm = jnp.swapaxes(mn, 0, 1)[..., None]
    a_tm = jnp.swapaxes(_pad_time(a_probs, t_pad, 1.0), 0, 1)
    n_blocks = t_pad // k_steps
    rev = lambda g: (n_blocks - 1 - g, 0, 0)
    big = pl.BlockSpec((k_steps, b, s), rev, memory_space=pltpu.VMEM)
    small = pl.BlockSpec((k_steps, b, 1), rev, memory_space=pltpu.VMEM)
    gamma, w, wsum, pnorm = pl.pallas_call(
        _make_smoothing_banded_kernel(k_steps),
        grid=(n_blocks,),
        in_specs=[big, small, small, big] + _band_specs(s) + [
            pl.BlockSpec((b, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[big, big, small, small],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, s), dtype),
            jax.ShapeDtypeStruct((t_pad, b, s), dtype),
            jax.ShapeDtypeStruct((t_pad, b, 1), dtype),
            jax.ShapeDtypeStruct((t_pad, b, 1), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or FORCE_INTERPRET,
    )(e_tm, m_tm, mn_tm, a_tm, *[v.reshape(1, s) for v in bands], final_vec)
    gamma = jnp.swapaxes(gamma, 0, 1)[:, :t_len]
    w = jnp.swapaxes(w, 0, 1)[:, :t_len]
    wsum = jnp.swapaxes(wsum[..., 0], 0, 1)[:, :t_len]
    pnorm = jnp.swapaxes(pnorm[..., 0], 0, 1)[:, :t_len]
    return gamma, w, wsum, pnorm


def _make_smoothing_kernel(k_steps: int, n_blocks: int, t_len: int):
    """Backward recursion in "v-space" + fused smoothing outputs.

    Carries v̂_t ∝ e_t·β_t (normalized).  Per step at absolute time t
    (blocks and in-block steps walk time descending):

        u1 = v̂_{t+1} @ Aᵀ            (∝ β_t; at the last real frame the
                                       recursion base β = final is
                                       selected instead)
        b  = u1 / Σu1                 (β̂_t)
        γ  = normalize(α̂_t ⊙ b)·m_t  (state posteriors, emitted directly)
        v  = e_t ⊙ u1;  ŵ = v / Σv   (the ξ-count factor normalize(e·β̂))
        w_sum = Σv / Σu1              (Σ_j e_j β̂_j — ξ denominator part)

    Compared to the plain backward kernel this consumes *unshifted*
    e/mask tiles (no (B, T, S) shift-concat), emits the posteriors and
    ξ factors without any extra HBM round-trips of β̂, and has **no
    transcendentals at all** (the log-scale carry is not needed — every
    output is per-frame normalized).
    """

    def kernel(e_ref, m_ref, mn_ref, a_ref, trans_t_ref, final_ref,
               gamma_out, w_out, wsum_out, pnorm_out, carry_v):
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            f = final_ref[:].astype(jnp.float32)
            carry_v[:] = f / jnp.maximum(f.sum(-1, keepdims=True), tiny)

        v_hat = carry_v[:]
        trans_t = trans_t_ref[:]
        final = final_ref[:].astype(jnp.float32)
        for k in range(k_steps - 1, -1, -1):
            m_t = m_ref[k].astype(jnp.float32)            # (B, 1)
            mn_t = mn_ref[k].astype(jnp.float32)          # mask at t+1
            is_last = m_t * (1.0 - mn_t)
            u1 = jnp.dot(
                v_hat, trans_t, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            u1 = is_last * final + (1.0 - is_last) * u1
            nu = jnp.maximum(u1.sum(-1, keepdims=True), tiny)
            b = u1 / nu
            ab = a_ref[k].astype(jnp.float32) * b
            pn = ab.sum(-1, keepdims=True)
            gamma = (ab / jnp.maximum(pn, tiny)) * m_t
            v = e_ref[k].astype(jnp.float32) * u1
            sv = jnp.maximum(v.sum(-1, keepdims=True), tiny)
            w = v / sv
            v_hat = m_t * w + (1.0 - m_t) * v_hat
            gamma_out[k] = gamma.astype(gamma_out.dtype)
            w_out[k] = w.astype(w_out.dtype)
            wsum_out[k] = (sv / nu).astype(wsum_out.dtype)
            pnorm_out[k] = pn.astype(pnorm_out.dtype)
        carry_v[:] = v_hat

    return kernel


def backward_smoothing_pass(e_llh, trans, final_vec, mask, a_probs,
                            interpret: bool = False,
                            time_major: bool = False):
    """Fused backward + smoothing; see :func:`_make_smoothing_kernel`.

    Batch-major in/out by default: e_llh/a_probs (B, T, S), mask (B, T).
    ``time_major=True`` takes/returns (T, B, ·) arrays (mask stays
    (B, T)).  Returns ``(posteriors, w_probs, w_sums, post_norm)`` with
    posteriors already masked; exact jnp fallback:
    ``semiring_scan._smoothing_scan`` (tests assert agreement).
    """
    if time_major:
        t_len, b, s = e_llh.shape
    else:
        b, t_len, s = e_llh.shape
    dtype = e_llh.dtype
    k_steps = _steps_per_block(b, s)
    t_pad = -(-t_len // k_steps) * k_steps
    mn = jnp.concatenate(
        [mask[:, 1:], jnp.zeros((b, t_pad - t_len + 1), mask.dtype)], axis=1
    )
    if time_major:
        e_tm = _pad_tm(e_llh, t_pad, 1.0)
        a_tm = _pad_tm(a_probs, t_pad, 1.0)
        m_tm = _pad_tm(mask.T, t_pad, 0.0)[..., None]
        mn_tm = jnp.swapaxes(mn, 0, 1)[..., None]
    else:
        e_tm = jnp.swapaxes(_pad_time(e_llh, t_pad, 1.0), 0, 1)
        m_tm = jnp.swapaxes(_pad_time(mask, t_pad, 0.0), 0, 1)[..., None]
        mn_tm = jnp.swapaxes(mn, 0, 1)[..., None]
        a_tm = jnp.swapaxes(_pad_time(a_probs, t_pad, 1.0), 0, 1)
    n_blocks = t_pad // k_steps
    rev = lambda g: (n_blocks - 1 - g, 0, 0)
    big = pl.BlockSpec((k_steps, b, s), rev, memory_space=pltpu.VMEM)
    small = pl.BlockSpec((k_steps, b, 1), rev, memory_space=pltpu.VMEM)
    gamma, w, wsum, pnorm = pl.pallas_call(
        _make_smoothing_kernel(k_steps, n_blocks, t_len),
        grid=(n_blocks,),
        in_specs=[
            big, small, small, big,
            pl.BlockSpec((s, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[big, big, small, small],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, s), dtype),
            jax.ShapeDtypeStruct((t_pad, b, s), dtype),
            jax.ShapeDtypeStruct((t_pad, b, 1), dtype),
            jax.ShapeDtypeStruct((t_pad, b, 1), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or FORCE_INTERPRET,
    )(e_tm, m_tm, mn_tm, a_tm, trans.T, final_vec)
    if time_major:
        return (gamma[:t_len], w[:t_len],
                wsum[:t_len, :, 0], pnorm[:t_len, :, 0])
    gamma = jnp.swapaxes(gamma, 0, 1)[:, :t_len]
    w = jnp.swapaxes(w, 0, 1)[:, :t_len]
    wsum = jnp.swapaxes(wsum[..., 0], 0, 1)[:, :t_len]
    pnorm = jnp.swapaxes(pnorm[..., 0], 0, 1)[:, :t_len]
    return gamma, w, wsum, pnorm


def _pad_time(x, t_pad, fill):
    b, t_len = x.shape[0], x.shape[1]
    if t_pad == t_len:
        return x
    pad_shape = (b, t_pad - t_len) + x.shape[2:]
    return jnp.concatenate(
        [x, jnp.full(pad_shape, fill, x.dtype)], axis=1
    )


def _pad_tm(x, t_pad, fill):
    """Pad a time-major array along axis 0."""
    t_len = x.shape[0]
    if t_pad == t_len:
        return x
    pad_shape = (t_pad - t_len,) + x.shape[1:]
    return jnp.concatenate([x, jnp.full(pad_shape, fill, x.dtype)], axis=0)


def forward_pass(e_llh, trans, init_vec, mask, interpret: bool = False,
                 time_major: bool = False):
    """Scaled forward; semantics of ``semiring_scan._scaled_pass(False)``.

    Batch-major by default: e_llh (B, T, S), mask (B, T); outputs
    likewise.  ``time_major=True`` takes e_llh as (T, B, S) — the
    kernel's native layout — and returns (T, B, S) probs / (T, B) logcs,
    skipping all four large transposes (mask stays (B, T); it is small).
    """
    if time_major:
        t_len, b, s = e_llh.shape
    else:
        b, t_len, s = e_llh.shape
    k_steps = _steps_per_block(b, s)
    t_pad = -(-t_len // k_steps) * k_steps
    # padded steps: mask 0 ⇒ carry copies through; outputs sliced away
    if time_major:
        e_tm = _pad_tm(e_llh, t_pad, 1.0)
        m_tm = _pad_tm(mask.T, t_pad, 0.0)[..., None]
    else:
        e_tm = jnp.swapaxes(_pad_time(e_llh, t_pad, 1.0), 0, 1)
        m_tm = jnp.swapaxes(_pad_time(mask, t_pad, 0.0), 0, 1)[..., None]
    probs, logcs = _call(
        _make_fwd_kernel(k_steps), e_tm, m_tm, trans, init_vec,
        lambda t: (t, 0, 0), k_steps, interpret,
    )
    if time_major:
        probs = probs[:t_len]
        logcs = logcs[:t_len, :, 0]
        return probs, logcs, (probs[-1], logcs[-1])
    probs = jnp.swapaxes(probs, 0, 1)[:, :t_len]
    logcs = jnp.swapaxes(logcs[..., 0], 0, 1)[:, :t_len]
    return probs, logcs, (probs[:, -1], logcs[:, -1])


def backward_pass(e_llh, trans, final_vec, mask, interpret: bool = False):
    """Scaled backward; semantics of ``_scaled_pass(reverse=True)``.

    The kernel walks blocks of time in reverse; step t consumes e_llh and
    mask at t+1, so both are fed shifted by one frame (the shifted tail
    row carries mask 0, and rows at t ≥ T−1 keep the carry).
    """
    b, t_len, s = e_llh.shape
    dtype = e_llh.dtype
    k_steps = _steps_per_block(b, s)
    t_pad = -(-t_len // k_steps) * k_steps
    e_shift = jnp.concatenate(
        [e_llh[:, 1:], jnp.ones((b, t_pad - t_len + 1, s), dtype)], axis=1
    )
    m_shift = jnp.concatenate(
        [mask[:, 1:], jnp.zeros((b, t_pad - t_len + 1), mask.dtype)], axis=1
    )
    e_tm = jnp.swapaxes(e_shift, 0, 1)
    m_tm = jnp.swapaxes(m_shift, 0, 1)[..., None]
    n_blocks = t_pad // k_steps
    probs, logcs = _call(
        _make_bwd_kernel(k_steps, n_blocks, t_len), e_tm, m_tm, trans.T,
        final_vec, lambda g: (n_blocks - 1 - g, 0, 0), k_steps, interpret,
    )
    probs = jnp.swapaxes(probs, 0, 1)[:, :t_len]
    logcs = jnp.swapaxes(logcs[..., 0], 0, 1)[:, :t_len]
    return probs, logcs, None


# ----------------------------------------------------------------------
# Fully-fused phone-loop E-step path (llh-input kernels, time-major)
# ----------------------------------------------------------------------
def _split_bf16(x):
    """x (f32) → (hi, lo) bf16 with hi + lo ≈ x (~22 mantissa bits)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(x, w_hi, w_lo):
    """~f32-accurate matmul computing the bf16_3x cross terms (the
    scheme XLA calls Precision.HIGH, which Pallas does not accept
    directly).  Halves the per-step cost of the 6-pass HIGHEST f32
    matmul; relative error ~2⁻²² — well inside the ≤1e-4/frame ELBO
    parity budget.  ``w_hi/w_lo`` from :func:`_split_bf16` (hoisted
    out of the loop).

    ``BEER_DOT1=1`` switches to ONE stacked (B, 3S)@(3S, S) MXU dot —
    ``[x_hi | x_hi | x_lo] @ [w_hi; w_lo; w_hi]`` — instead of three
    separate K=S dots: same three products, one accumulator, 1.9×
    faster per isolated step at S=32 (tools/exp_chain_occupancy.py
    --propagate), but a measured end-to-end wash (see the DOT1 flag
    comment), so the 3-dot form stays the default."""
    x_hi, x_lo = _split_bf16(x)
    if DOT1:
        x_st = jnp.concatenate([x_hi, x_hi, x_lo], axis=1)
        w_st = jnp.concatenate([w_hi, w_lo, w_hi], axis=0)
        return jnp.dot(x_st, w_st, preferred_element_type=jnp.float32)
    return (
        jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
        + jnp.dot(x_hi, w_lo, preferred_element_type=jnp.float32)
        + jnp.dot(x_lo, w_hi, preferred_element_type=jnp.float32)
    )


def _exp_tile(llh_t, m_t):
    """In-kernel scaled likelihoods: e = exp(llh − rowmax), 1 on pads.

    Returns (e, masked rowmax) — the rowmax enters the forward log-scale
    bookkeeping (Σ_t m_llh·mask is added back into log Z)."""
    mx = jnp.max(llh_t, axis=-1, keepdims=True)
    e = m_t * jnp.exp(llh_t - mx) + (1.0 - m_t)
    return e, mx * m_t


def _block_masks(len_ref, t0, k_steps, shift=0):
    """(K, B, 1) prefix masks for absolute steps t0+shift … t0+shift+K−1,
    derived from the (B, 1) per-utterance lengths — vectorized over the
    whole block, OUT of the serial recursion chain."""
    lens = len_ref[:].astype(jnp.float32)              # (B, 1)
    ks = jax.lax.broadcasted_iota(
        jnp.int32, (k_steps, 1, 1), 0
    ).astype(jnp.float32)                              # tpu.iota is int-only
    return (lens[None] > t0 + shift + ks).astype(jnp.float32)


def _dot2_sel(x, sel):
    """x @ sel for a 0/1 one-hot selection matrix in TWO bf16 MXU
    passes: sel is exact in bf16, so only x needs the hi/lo split —
    result = x_hi·sel + x_lo·sel reconstructs x to ~22 mantissa bits
    (vs 6 passes for Precision.HIGHEST; selection matmuls are the
    banded smoothing kernel's main MXU cost)."""
    x_hi, x_lo = _split_bf16(x)
    sel_b = sel.astype(jnp.bfloat16)
    return (
        jnp.dot(x_hi, sel_b, preferred_element_type=jnp.float32)
        + jnp.dot(x_lo, sel_b, preferred_element_type=jnp.float32)
    )


def _exp_block(llh_all, m_all):
    """Vectorized :func:`_exp_tile` over a (K, B, S) block.  The scaled
    likelihoods don't depend on the recursion carry — computing them for
    the whole block up front removes the exp/rowmax/mask ops from the
    per-step dependency chain (the chain is the kernel's cost: the
    stream runs at ~775 GB/s, docs/PERFORMANCE.md)."""
    mx = jnp.max(llh_all, axis=-1, keepdims=True)
    e = m_all * jnp.exp(llh_all - mx) + (1.0 - m_all)
    return e, mx * m_all


def _llh_block(x_ref, w_ref, bias_ref, fuse_ellh):
    """Whole-block llh (K, B, S) — or None when llh streams directly.

    Computed as ONE (K·B, P) @ (P, S) MXU matmul at block entry
    (HIGHEST precision — the exact op
    ``NormalSet.expected_log_likelihood`` runs outside, so the fused
    path is bit-identical between the two kernels that share this
    helper).  One big matmul, not K per-step ones: the llh tiles don't
    depend on the recursion, and chopping the product into per-step
    (B, P) matmuls serializes them behind the carry chain (measured
    +1.4 ms/epoch on the smoothing kernel)."""
    if not fuse_ellh:
        return None
    x = x_ref[:].astype(jnp.float32)
    k, b, p = x.shape
    llh = jnp.dot(
        x.reshape(k * b, p), w_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return llh.reshape(k, b, -1) + bias_ref[:][None]


def _llh_tile(x_ref, llh_blk, k):
    """Step-k llh (B, S) from the streamed tile or the block product."""
    if llh_blk is not None:
        return llh_blk[k]
    return x_ref[k].astype(jnp.float32)


def _make_fwd_llh_kernel(k_steps: int):
    """Forward kernel taking raw llh tiles: exp(llh − rowmax) is computed
    in VMEM, so the (B, T, S) e_llh array never exists in HBM.  Emits the
    *raw per-step norms* c_t (1 on masked frames) instead of cumulative
    log-scales — downstream ξ weights need c_t directly, and a cumsum
    would force an ill-conditioned exp(logc_t − logc_{t−1}) recovery."""

    def kernel(llh_ref, m_ref, trans_ref, init_ref,
               prob_out, norm_out, mllh_out, carry_p):
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            carry_p[:] = init_ref[:].astype(jnp.float32)

        p = carry_p[:]
        t_hi, t_lo = _split_bf16(trans_ref[:])
        for k in range(k_steps):
            m_t = m_ref[k].astype(jnp.float32)
            e_t, mllh = _exp_tile(llh_ref[k].astype(jnp.float32), m_t)
            propagated = _dot3(p, t_hi, t_lo)
            if k == 0:
                base = jnp.where(pid == 0, p, propagated)
            else:
                base = propagated
            raw = base * e_t
            norm = jnp.maximum(raw.sum(-1, keepdims=True), tiny)
            new_p = raw / norm
            keep = m_t
            if k == 0:
                keep = jnp.where(pid == 0, 1.0, keep)
            p = keep * new_p + (1.0 - keep) * p
            prob_out[k] = p.astype(prob_out.dtype)
            norm_out[k] = (keep * norm + (1.0 - keep)).astype(norm_out.dtype)
            mllh_out[k] = mllh.astype(mllh_out.dtype)
        carry_p[:] = p

    return kernel


def forward_llh_pass(llh_tm, trans, init_vec, mask, interpret: bool = False):
    """Scaled forward from raw time-major llh (T, B, S).

    Returns (α̂ (T, B, S), per-step norms c (T, B; 1 on masked frames),
    masked rowmax shifts (T, B)).
    ``log Z = Σ_t log c_t + Σ_t mllh_t + log Σ α̂[-1]·final``.
    """
    t_len, b, s = llh_tm.shape
    k_steps = _steps_per_block(b, s)
    t_pad = -(-t_len // k_steps) * k_steps
    llh_p = _pad_tm(llh_tm, t_pad, 0.0)
    m_tm = _pad_tm(mask.T, t_pad, 0.0)[..., None]
    n_blocks = t_pad // k_steps
    idx = lambda t: (t, 0, 0)
    big = pl.BlockSpec((k_steps, b, s), idx, memory_space=pltpu.VMEM)
    small = pl.BlockSpec((k_steps, b, 1), idx, memory_space=pltpu.VMEM)
    probs, norms, mllh = pl.pallas_call(
        _make_fwd_llh_kernel(k_steps),
        grid=(n_blocks,),
        in_specs=[
            big, small,
            pl.BlockSpec((s, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[big, small, small],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, s), llh_tm.dtype),
            jax.ShapeDtypeStruct((t_pad, b, 1), llh_tm.dtype),
            jax.ShapeDtypeStruct((t_pad, b, 1), llh_tm.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, s), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or FORCE_INTERPRET,
    )(llh_p, m_tm, trans, init_vec)
    return (probs[:t_len], norms[:t_len, :, 0], mllh[:t_len, :, 0])


def _band_propagators(band_ref):
    """(forward, backward) step propagators from a (4, S) band stack
    ``[a_self, a_adv, exit, w]`` (see ``PhoneLoop._structured_trans``):

        fwd:  (pA)[j]  = p[j]·a_self[j] + p[j−1]·a_adv[j−1] + (p·exit)·w[j]
        bwd:  (Av̂)[i] = v̂[i]·a_self[i] + v̂[i+1]·a_adv[i] + (v̂·w)·exit[i]

    Five exact-f32 VPU passes instead of a (B, S) @ (S, S) 3-bf16-pass
    MXU matmul — measured 2.3× faster per step at the bench shape
    (tools/exp_fwd_pieces.py: banded 0.74 ms vs dense 1.68 ms), because
    the serial recursion chain, not the stream, is the kernels' cost."""
    tb = band_ref[:].astype(jnp.float32)
    a_self, a_adv = tb[0:1], tb[1:2]
    exit_v, w_v = tb[2:3], tb[3:4]

    def fwd(p):
        q = (p * exit_v).sum(-1, keepdims=True)
        return p * a_self + _shift_right(p * a_adv) + q * w_v

    def bwd(v_hat):
        r = (v_hat * w_v).sum(-1, keepdims=True)
        return v_hat * a_self + _shift_left(v_hat) * a_adv + r * exit_v

    return fwd, bwd


def _make_fwd_llh_ckpt_kernel(k_steps, fuse_ellh: bool = False,
                              banded: bool = False, n_chunks: int = 1):
    """Forward recursion that writes only block-entry CHECKPOINTS.

    The (T, B, S) α̂ stream is the forward pass's dominant HBM traffic
    (measured: the scan kernels are stream-bound at ~95-160 GB/s, see
    tools/exp_stream_dma.py / docs/PERFORMANCE.md).  Storing only the
    carry entering each K-step block — T/K times fewer bytes — and
    recomputing each block's α̂ tile inside the smoothing kernel (same
    ops, same order ⇒ bit-identical) removes ~2/3 of the fused E-step's
    α̂ bytes at the cost of one extra in-VMEM matmul chain per block.

    With ``fuse_ellh`` the kernel streams the reduced sufficient
    statistics (T, B, P) instead of llh (T, B, S) and computes
    ``llh_t = stats_t @ W + bias`` on the MXU in VMEM (HIGHEST
    precision, exactly the op `NormalSet.expected_log_likelihood`
    runs outside) — llh never exists in HBM, and the streamed minor
    dim shrinks from S lanes to P lanes.
    """

    def kernel(*refs):
        if fuse_ellh:
            (llh_ref, len_ref, w_ref, bias_ref, trans_ref, init_ref,
             ckpt_out, last_out, logz_out, carry_p, carry_z,
             carry_last) = refs
        else:
            (llh_ref, len_ref, trans_ref, init_ref,
             ckpt_out, last_out, logz_out, carry_p, carry_z,
             carry_last) = refs
            w_ref = bias_ref = None
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            carry_p[:] = init_ref[:].astype(jnp.float32)
            carry_z[:] = jnp.zeros_like(carry_z)
            carry_last[:] = jnp.zeros_like(carry_last)

        p = carry_p[:]
        ckpt_out[0] = p.astype(ckpt_out.dtype)       # block-entry carry
        if banded:
            propagate, _ = _band_propagators(trans_ref)
        else:
            t_hi, t_lo = _split_bf16(trans_ref[:])
            propagate = lambda q: _dot3(q, t_hi, t_lo)
        # the mask never streams from HBM: each (K, B, 1) side stream
        # costs ~0.4 ms at the bench shape (tools/exp_small_specs.py) —
        # derive it from the per-utterance lengths, a fixed (B, 1) input
        t0 = (pid * k_steps).astype(jnp.float32)
        # whole-block prologue — everything that doesn't consume the
        # carry is hoisted out of the serial chain (masks, scaled
        # likelihoods); the chain keeps only {matmul, ⊙e, Σ, ÷}
        m_all = _block_masks(len_ref, t0, k_steps)
        mn_all = _block_masks(len_ref, t0, k_steps, shift=1)
        is_last_all = m_all * (1.0 - mn_all)
        llh_blk = _llh_block(llh_ref, w_ref, bias_ref, fuse_ellh)
        llh_all = llh_blk if fuse_ellh else llh_ref[:].astype(jnp.float32)
        e_all, mllh_all = _exp_block(llh_all, m_all)
        # n_chunks > 1: split the batch rows into independent sub-chains
        # so the scheduler can overlap their serial recursions (the chain
        # ops are all row-wise ⇒ per-row results are bit-identical)
        cb = p.shape[0] // n_chunks
        row = lambda c: slice(c * cb, (c + 1) * cb)
        ps = [p[row(c)] for c in range(n_chunks)] if n_chunks > 1 else [p]
        norms = [[] for _ in range(n_chunks)]
        # NO mask blend in the chain: post-end rows drift (their γ/ξ
        # consumers are masked; the ckpt recompute replays the same
        # drift) and the exact α̂(len−1) each row needs for log Z is
        # captured OUT of the chain by the is_last accumulation below —
        # Σ_t is_last_t ⊙ α̂_t hits exactly once per live row
        lasts = [0.0] * n_chunks
        for k in range(k_steps):
            for c in range(n_chunks):
                pc = ps[c]
                propagated = propagate(pc)
                if k == 0:
                    base = jnp.where(pid == 0, pc, propagated)
                else:
                    base = propagated
                raw = base * (e_all[k, row(c)] if n_chunks > 1
                              else e_all[k])
                norm = jnp.maximum(raw.sum(-1, keepdims=True), tiny)
                new_p = raw / norm
                keep = m_all[k, row(c)] if n_chunks > 1 else m_all[k]
                if k == 0:
                    keep = jnp.where(pid == 0, 1.0, keep)
                ps[c] = new_p
                il = is_last_all[k, row(c)] if n_chunks > 1 \
                    else is_last_all[k]
                lasts[c] = lasts[c] + il * new_p
                norms[c].append(keep * norm + (1.0 - keep))
        p = jnp.concatenate(ps, 0) if n_chunks > 1 else ps[0]
        carry_p[:] = p
        last_blk = (jnp.concatenate(lasts, 0) if n_chunks > 1
                    else lasts[0])
        last_acc = carry_last[:] + last_blk
        carry_last[:] = last_acc
        # per-step norms never reach HBM: log Z only needs their log-sum
        # (+ the rowmax shifts), a (B, 1) carry — and masked norms are 1,
        # so the log/sum runs vectorized AFTER the chain
        logn = [jnp.log(jnp.stack(ns)).sum(0) for ns in norms]
        logn = jnp.concatenate(logn, 0) if n_chunks > 1 else logn[0]
        z = carry_z[:] + logn + mllh_all.sum(0)
        carry_z[:] = z
        # zero-length rows never fire is_last: report their (frozen)
        # init carry like the blended kernel did
        lens = len_ref[:].astype(jnp.float32)
        last_out[0] = jnp.where(
            lens > 0, last_acc, init_ref[:].astype(jnp.float32)
        ).astype(last_out.dtype)
        logz_out[0] = z.astype(logz_out.dtype)

    return kernel


def forward_llh_ckpt_pass(llh_tm, trans, init_vec, mask,
                          interpret: bool = False,
                          w=None, bias=None, bands=None,
                          batch_chunks=None):
    """Scaled forward emitting block-entry checkpoints instead of the
    full α̂ stream; see :func:`_make_fwd_llh_ckpt_kernel`.

    Returns (ckpts (n_blocks, B, S) block-entry carries, last (B, S)
    final carry, logz_base (B,) = Σ_t log c_t + Σ_t mllh_t).
    ``log Z = logz_base + log Σ last·final``.

    The mask must be a contiguous prefix per row (frames [0, len_b)) —
    the framework's padded-batch invariant; the kernel reconstructs it
    from the per-row lengths so no (T, B) mask stream touches HBM.

    With ``w (P, S)`` / ``bias (S,)``, ``llh_tm`` is instead the reduced
    sufficient-statistics stream (T, B, P) and llh is computed in-kernel
    (the fused-ELLH path; llh never exists in HBM).

    With ``bands`` (a (4, S) stack ``[a_self, a_adv, exit, w]``), the
    per-step transition product runs banded + rank-1 on the VPU instead
    of the dense (S, S) MXU matmul (:func:`_band_propagators`); ``trans``
    is ignored.
    """
    fuse = w is not None
    t_len, b, p_dim = llh_tm.shape
    s = w.shape[1] if fuse else p_dim
    k_steps = _steps_per_block(b, max(s, p_dim))
    t_pad = -(-t_len // k_steps) * k_steps
    llh_p = _pad_tm(llh_tm, t_pad, 0.0)
    lens = mask.astype(jnp.float32).sum(-1)[:, None]   # (B, 1)
    n_blocks = t_pad // k_steps
    idx = lambda t: (t, 0, 0)
    big_one = pl.BlockSpec((1, b, s), idx, memory_space=pltpu.VMEM)
    fixed_one = pl.BlockSpec((1, b, s), lambda t: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    fixed_small = pl.BlockSpec((1, b, 1), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda t: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((k_steps, b, p_dim), idx, memory_space=pltpu.VMEM),
        const2((b, 1)),
    ]
    args = [llh_p, lens]
    if fuse:
        in_specs += [const2((p_dim, s)), const2((1, s))]
        args += [w.astype(jnp.float32), bias.astype(jnp.float32)[None, :]]
    if bands is not None:
        in_specs += [const2((4, s)), const2((b, s))]
        args += [jnp.stack(list(bands)).astype(jnp.float32), init_vec]
    else:
        in_specs += [const2((s, s)), const2((b, s))]
        args += [trans, init_vec]
    ckpts, last, logz = pl.pallas_call(
        _make_fwd_llh_ckpt_kernel(k_steps, fuse_ellh=fuse,
                                  banded=bands is not None,
                                  n_chunks=_resolve_chunks(batch_chunks, b)),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[big_one, fixed_one, fixed_small],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, b, s), llh_tm.dtype),
            jax.ShapeDtypeStruct((1, b, s), llh_tm.dtype),
            jax.ShapeDtypeStruct((1, b, 1), llh_tm.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, s), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, s), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or FORCE_INTERPRET,
    )(*args)
    return (ckpts, last[0], logz[0, :, 0])


def _make_estep_ckpt_kernel(k_steps: int, n_blocks: int,
                            fuse_ellh: bool = False,
                            fuse_acc: bool = False,
                            banded: bool = False,
                            full_xi: bool = False,
                            n_chunks: int = 1):
    """Fused E-step epilogue recomputing α̂ from block checkpoints.

    Identical math to :func:`_make_estep_kernel`, but the (K, B, S) α̂
    tile and the per-step forward norms are REGENERATED in VMEM from the
    block-entry checkpoint (same ops in the same order as the forward
    kernel ⇒ bit-identical values), so neither the α̂ stream nor the
    norms are read from HBM.  ``fuse_ellh`` as in
    :func:`_make_fwd_llh_ckpt_kernel`: stream reduced stats, compute
    llh on the MXU in VMEM.

    ``fuse_acc``: the (T, B, S) γ stream is replaced by its training
    consumers, accumulated in VMEM — the emission moment Σ_t γ_tᵀstats_t
    (S, P), the per-state counts Σ_t γ_t (1, S), and γ(t=0) (B, S) for
    the unit prior.  γ never exists in HBM (its only dense consumer is
    the emission einsum — fusing it deletes the γ write AND the einsum's
    γ + stats reads; the per-block transpose-dot rides the MXU and hides
    behind the stream, tools/exp_inkernel_acc.py).  The reduced stats
    stream in as an extra (K, B, P) input unless ``fuse_ellh`` already
    streams them as the main input.

    ``banded``: the trans/trans_t inputs are each the (4, S) band stack
    and both chains use the VPU band + rank-1 propagators
    (:func:`_band_propagators`) — must match the forward kernel so the
    α̂ regeneration stays bit-identical.
    """

    def kernel(*refs):
        i = 0

        def take(n=1):
            nonlocal i
            out = refs[i:i + n]
            i += n
            return out if n > 1 else out[0]

        llh_ref = take()
        stats_ref = take() if (fuse_acc and not fuse_ellh) else None
        len_ref = take()
        w_ref, bias_ref = take(2) if fuse_ellh else (None, None)
        ckpt_ref, trans_ref, trans_t_ref, final_ref = take(4)
        selr_ref, selc_ref = (None, None) if full_xi else take(2)
        if fuse_acc:
            xi_out, acc_out, cnt_out, g0_out = take(4)
            gamma_out = None
        else:
            gamma_out, xi_out = take(2)
        carry_v, carry_wsel, carry_wgt, xi = take(4)
        if fuse_acc:
            acc_scr, cnt_scr = take(2)
        if stats_ref is None and fuse_acc:
            stats_ref = llh_ref          # fused-ELLH: main stream IS stats
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            f = final_ref[:].astype(jnp.float32)
            carry_v[:] = f / jnp.maximum(f.sum(-1, keepdims=True), tiny)
            carry_wsel[:] = jnp.zeros_like(carry_wsel)
            carry_wgt[:] = jnp.zeros_like(carry_wgt)
            xi[:] = jnp.zeros_like(xi)
            if fuse_acc:
                acc_scr[:] = jnp.zeros_like(acc_scr)
                cnt_scr[:] = jnp.zeros_like(cnt_scr)

        # ---- whole-block prologue (carry-independent, OUT of both
        # serial chains): prefix masks at t and t+1 from the (B, 1)
        # lengths, scaled likelihoods for every step
        t0 = ((n_blocks - 1 - pid) * k_steps).astype(jnp.float32)
        first_time_block = pid == n_blocks - 1
        m_all = _block_masks(len_ref, t0, k_steps)
        mn_all = _block_masks(len_ref, t0, k_steps, shift=1)
        llh_blk = _llh_block(llh_ref, w_ref, bias_ref, fuse_ellh)
        llh_all = llh_blk if fuse_ellh else llh_ref[:].astype(jnp.float32)
        e_all, _ = _exp_block(llh_all, m_all)

        # ---- the two serial chains, INTERLEAVED: the α̂ recompute
        # (time ascending, from the entry checkpoint; same ops in the
        # same order as the forward kernel ⇒ bit-identical) and the
        # v-space backward recursion (time descending, from the carry)
        # are independent within a block — a_list feeds only the
        # epilogue — so iteration j advances both, giving the scheduler
        # two independent dependency chains to overlap (~2-way ILP on
        # the chain latency)
        p = ckpt_ref[0].astype(jnp.float32)
        v_hat = carry_v[:]
        prev_wsel = carry_wsel[:]
        prev_wgt = carry_wgt[:]
        if banded:
            propagate, _ = _band_propagators(trans_ref)
            _, propagate_t = _band_propagators(trans_t_ref)
        else:
            t_hi, t_lo = _split_bf16(trans_ref[:])
            propagate = lambda q: _dot3(q, t_hi, t_lo)
            tt_hi, tt_lo = _split_bf16(trans_t_ref[:])
            propagate_t = lambda q: _dot3(q, tt_hi, tt_lo)
        final = final_ref[:].astype(jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        b = v_hat.shape[0]
        is_last_all = m_all * (1.0 - mn_all)
        # n_chunks > 1: the batch rows split into independent sub-chains
        # (2·n_chunks interleaved serial chains per block — α̂ recompute
        # ascending + v backward descending, per chunk).  Row-wise chain
        # arithmetic ⇒ γ/α̂ are bit-identical; the ξ / emission-moment
        # reductions run per chunk and sum, which only changes float
        # summation order.
        cb = b // n_chunks
        rows = (lambda x, c: x) if n_chunks == 1 else (
            lambda x, c: x[c * cb:(c + 1) * cb])
        krows = (lambda x, c: x) if n_chunks == 1 else (
            lambda x, c: x[:, c * cb:(c + 1) * cb])
        p_c = [rows(p, c) for c in range(n_chunks)]
        v_c = [rows(v_hat, c) for c in range(n_chunks)]
        a_lists = [[] for _ in range(n_chunks)]
        norm_lists = [[] for _ in range(n_chunks)]
        u1_lists = [[None] * k_steps for _ in range(n_chunks)]
        for j in range(k_steps):
            k = k_steps - 1 - j
            for c in range(n_chunks):
                # forward-recompute step k = j on chunk c.  NO mask
                # blend: for live steps `keep·new + (1−keep)·old` is
                # bit-identical to `new` (keep=1, p≥0), and every
                # consumer of post-end values (γ, ξ weights) is masked
                # downstream — rows past their length drift harmlessly,
                # saving 3 VPU passes per step from the serial chain.
                p = p_c[c]
                propagated = propagate(p)
                if j == 0:
                    base = jnp.where(first_time_block, p, propagated)
                else:
                    base = propagated
                raw = base * rows(e_all[j], c)
                norm = jnp.maximum(raw.sum(-1, keepdims=True), tiny)
                p_c[c] = raw / norm
                keep = rows(m_all[j], c)
                if j == 0:
                    keep = jnp.where(first_time_block, 1.0, keep)
                a_lists[c].append(p_c[c])
                norm_lists[c].append(keep * norm + (1.0 - keep))
                # backward step k = K−1−j on chunk c (same no-blend
                # argument: the is_last injection below re-anchors each
                # row at its true final frame regardless of drift)
                v_hat = v_c[c]
                u1 = propagate_t(v_hat)
                u1 = (rows(is_last_all[k], c) * rows(final, c)
                      + (1.0 - rows(is_last_all[k], c)) * u1)
                u1_lists[c][k] = u1
                v = rows(e_all[k], c) * u1
                sv = jnp.maximum(v.sum(-1, keepdims=True), tiny)
                v_c[c] = v / sv
        carry_v[:] = (v_c[0] if n_chunks == 1
                      else jnp.concatenate(v_c, 0))

        # ---- vectorized epilogue, per chunk: smoothing quantities for
        # the whole block at once (identical arithmetic to the old
        # per-step forms); ξ and the fused accumulators sum the chunks'
        # contributions
        xi_v = xi[:]
        wsel0_c, wgt0_c = [], []
        for c in range(n_chunks):
            a_all = jnp.stack(a_lists[c])               # (K, cb, S)
            norm_all = jnp.stack(norm_lists[c])         # (K, cb, 1)
            u1_all = jnp.stack(u1_lists[c])             # (K, cb, S)
            m_blk = krows(m_all, c)
            ab_all = a_all * u1_all
            absum_all = ab_all.sum(-1, keepdims=True)
            gamma_all = (ab_all / jnp.maximum(absum_all, tiny)) * m_blk
            v_all = krows(e_all, c) * u1_all
            sv_all = jnp.maximum(v_all.sum(-1, keepdims=True), tiny)
            w_all = v_all / sv_all
            if full_xi:
                # identity selections: the ξ factors ARE the carries
                wsel_all = w_all
            else:
                wsel_all = _dot2_sel(
                    w_all.reshape(k_steps * cb, -1), selc_ref[:]
                ).reshape(k_steps, cb, -1)              # (K, cb, C)
            denom_all = norm_all * absum_all / sv_all
            wgt_all = jnp.where(denom_all > 1e-30,
                                m_blk / jnp.maximum(denom_all, 1e-30), 0.0)
            if not fuse_acc:
                if n_chunks == 1:
                    gamma_out[:] = gamma_all.astype(gamma_out.dtype)
                else:
                    gamma_out[:, c * cb:(c + 1) * cb] = gamma_all.astype(
                        gamma_out.dtype)

            if full_xi:
                u_sel_all = a_all
            else:
                u_sel_all = _dot2_sel(
                    a_all.reshape(k_steps * cb, -1), selr_ref[:]
                ).reshape(k_steps, cb, -1)                 # (K, cb, R)
            uw_in = (u_sel_all[:-1] * wgt_all[1:]).reshape(
                (k_steps - 1) * cb, -1)
            xi_v = xi_v + jax.lax.dot_general(
                uw_in, wsel_all[1:].reshape((k_steps - 1) * cb, -1),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi,
            )
            xi_v = xi_v + jax.lax.dot_general(
                u_sel_all[k_steps - 1] * rows(prev_wgt, c),
                rows(prev_wsel, c),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi,
            )
            wsel0_c.append(wsel_all[0])
            wgt0_c.append(wgt_all[0])

            if fuse_acc:
                # block-level γᵀ @ stats on the MXU (transpose-dot) +
                # per-state counts
                g = gamma_all.reshape(k_steps * cb, -1)
                st = krows(stats_ref[:].astype(jnp.float32), c).reshape(
                    k_steps * cb, -1)
                acc_new = acc_scr[:] + jnp.dot(
                    g.T, st, preferred_element_type=jnp.float32,
                    precision=hi,
                )
                acc_scr[:] = acc_new
                cnt_scr[:] += g.sum(0)[None]
                # constant index map ⇒ flushed once after the LAST grid
                # step, which is time-block 0: γ(t=0) for the unit-prior
                # counts
                if n_chunks == 1:
                    g0_out[0] = gamma_all[0].astype(g0_out.dtype)
                else:
                    g0_out[0, c * cb:(c + 1) * cb] = gamma_all[0].astype(
                        g0_out.dtype)
        carry_wsel[:] = (wsel0_c[0] if n_chunks == 1
                         else jnp.concatenate(wsel0_c, 0))
        carry_wgt[:] = (wgt0_c[0] if n_chunks == 1
                        else jnp.concatenate(wgt0_c, 0))
        xi[:] = xi_v
        xi_out[:] = xi_v.astype(xi_out.dtype)
        if fuse_acc:
            acc_out[:] = acc_scr[:].astype(acc_out.dtype)
            cnt_out[:] = cnt_scr[:].astype(cnt_out.dtype)

    return kernel


def phone_loop_estep_ckpt_pass(llh_tm, ckpts, trans, final_vec, mask,
                               sel_r, sel_c, interpret: bool = False,
                               w=None, bias=None, stats_tm=None,
                               bands=None, batch_chunks=None):
    """Fused smoothing + restricted ξ from forward CHECKPOINTS.

    Inputs: llh_tm (T, B, S); ckpts (n_blocks, B, S) block-entry carries
    from :func:`forward_llh_ckpt_pass` (the per-step norms are
    recomputed in-kernel); trans (S, S) probability-space transitions;
    final_vec (B, S); mask (B, T); sel_r/sel_c (S, n) one-hot
    selections.  Returns (γ (T, B, S), xi_raw (n_r, n_c)).

    With ``w (P, S)`` / ``bias (S,)``, ``llh_tm`` is the reduced
    sufficient-statistics stream (T, B, P) and llh is computed in-kernel
    (must match the fused forward pass so the α̂ regeneration stays
    bit-identical).

    With ``stats_tm (T, B, P)``, the γ stream is replaced by its
    accumulated training consumers and the return is
    ``(xi_raw (n_r, n_c), acc (S, P), counts (S,), gamma0 (B, S))`` —
    see :func:`_make_estep_ckpt_kernel` (``fuse_acc``).
    """
    fuse = w is not None
    acc = stats_tm is not None
    full_xi = sel_r is None
    t_len, b, p_dim = llh_tm.shape
    s = w.shape[1] if fuse else p_dim
    n_r, n_c = (s, s) if full_xi else (sel_r.shape[1], sel_c.shape[1])
    dtype = llh_tm.dtype
    k_steps = _steps_per_block(b, max(s, p_dim))
    t_pad = -(-t_len // k_steps) * k_steps
    n_blocks = t_pad // k_steps
    if ckpts.shape[0] != n_blocks:
        raise ValueError(
            f"checkpoint count {ckpts.shape[0]} != n_blocks {n_blocks}; "
            "forward_llh_ckpt_pass and phone_loop_estep_ckpt_pass must "
            "see the same (B, S) block size"
        )
    llh_p = _pad_tm(llh_tm, t_pad, 0.0)
    lens = mask.astype(jnp.float32).sum(-1)[:, None]   # (B, 1)
    rev = lambda g: (n_blocks - 1 - g, 0, 0)
    big = pl.BlockSpec((k_steps, b, s), rev, memory_space=pltpu.VMEM)
    big_in = pl.BlockSpec((k_steps, b, p_dim), rev, memory_space=pltpu.VMEM)
    ckpt_spec = pl.BlockSpec((1, b, s), rev, memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda t: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [big_in]
    args = [llh_p]
    if acc and not fuse:
        stats_p = _pad_tm(stats_tm, t_pad, 0.0)
        acc_p = stats_tm.shape[-1]
        in_specs.append(
            pl.BlockSpec((k_steps, b, acc_p), rev, memory_space=pltpu.VMEM)
        )
        args.append(stats_p)
    else:
        acc_p = p_dim
    in_specs.append(const2((b, 1)))
    args.append(lens)
    if fuse:
        in_specs += [const2((p_dim, s)), const2((1, s))]
        args += [w.astype(jnp.float32), bias.astype(jnp.float32)[None, :]]
    if bands is not None:
        band_arr = jnp.stack(list(bands)).astype(jnp.float32)
        in_specs += [ckpt_spec, const2((4, s)), const2((4, s)),
                     const2((b, s))]
        args += [ckpts, band_arr, band_arr, final_vec]
    else:
        in_specs += [ckpt_spec, const2((s, s)), const2((s, s)),
                     const2((b, s))]
        args += [ckpts, trans, trans.T, final_vec]
    if not full_xi:
        in_specs += [const2((s, n_r)), const2((s, n_c))]
        args += [sel_r, sel_c]
    if acc:
        out_specs = [
            const2((n_r, n_c)), const2((s, acc_p)), const2((1, s)),
            pl.BlockSpec((1, b, s), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_r, n_c), dtype),
            jax.ShapeDtypeStruct((s, acc_p), dtype),
            jax.ShapeDtypeStruct((1, s), dtype),
            jax.ShapeDtypeStruct((1, b, s), dtype),
        ]
    else:
        out_specs = [big, const2((n_r, n_c))]
        out_shape = [
            jax.ShapeDtypeStruct((t_pad, b, s), dtype),
            jax.ShapeDtypeStruct((n_r, n_c), dtype),
        ]
    scratch = [
        pltpu.VMEM((b, s), jnp.float32),
        pltpu.VMEM((b, n_c), jnp.float32),
        pltpu.VMEM((b, 1), jnp.float32),
        pltpu.VMEM((n_r, n_c), jnp.float32),
    ]
    if acc:
        scratch += [
            pltpu.VMEM((s, acc_p), jnp.float32),
            pltpu.VMEM((1, s), jnp.float32),
        ]
    out = pl.pallas_call(
        _make_estep_ckpt_kernel(k_steps, n_blocks, fuse_ellh=fuse,
                                fuse_acc=acc, banded=bands is not None,
                                full_xi=full_xi,
                                n_chunks=_resolve_chunks(batch_chunks, b)),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or FORCE_INTERPRET,
    )(*args)
    if acc:
        xi, emis_acc, counts, gamma0 = out
        return xi, emis_acc, counts[0], gamma0[0]
    gamma, xi = out
    return gamma[:t_len], xi


# ----------------------------------------------------------------------
# Lane-major (S, B) variants of the fused phone-loop ckpt kernels
# ----------------------------------------------------------------------
# At the bench shape S=150 pads to 256 LANES in the batch-major (B, S)
# tiles — 41% of every VPU op's lanes are dead, and the serial chains
# (the kernels' cost) are ~all VPU ops.  Lane-major flips the tile to
# (S, B): S=150 pads to 152 sublanes (1.3% waste) and B=512 fills 4×128
# lanes exactly — 76 vregs per value instead of 128.  The stream bytes
# are identical; only the in-VMEM orientation changes.  Banded
# (phone-loop) transitions only: the band propagators are elementwise
# + a sublane shift + a sublane-reduce, all orientation-symmetric.
# Gated by tools/exp_lane_major.py on-chip.
def _shift_down(x):
    """y[i, :] = x[i-1, :]; y[0, :] = 0 — sublane shift on (S, B)."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row == 0, 0.0, pltpu.roll(x, 1, 0))


def _shift_up(x):
    """y[i, :] = x[i+1, :]; y[-1, :] = 0."""
    s = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row == s - 1, 0.0, pltpu.roll(x, s - 1, 0))


def _band_propagators_lm(band_ref):
    """(forward, backward) step propagators from a (S, 4) band stack
    laid out column-wise ``[a_self | a_adv | exit | w]`` (the transpose
    of :func:`_band_propagators`'s input, so the bands are natural
    (S, 1) column vectors — no in-kernel relayout):

        fwd:  (pA)[j]  = p[j]·a_self[j] + p[j−1]·a_adv[j−1] + (p·exit)·w[j]
        bwd:  (Av̂)[i] = v̂[i]·a_self[i] + v̂[i+1]·a_adv[i] + (v̂·w)·exit[i]

    operating on lane-major (S, B) values: the rank-1 reduce runs over
    SUBLANES, the band shift is a sublane roll."""
    tb = band_ref[:].astype(jnp.float32)
    a_self, a_adv = tb[:, 0:1], tb[:, 1:2]
    exit_v, w_v = tb[:, 2:3], tb[:, 3:4]

    def fwd(p):
        q = (p * exit_v).sum(0, keepdims=True)
        return p * a_self + _shift_down(p * a_adv) + q * w_v

    def bwd(v_hat):
        r = (v_hat * w_v).sum(0, keepdims=True)
        return v_hat * a_self + _shift_up(v_hat) * a_adv + r * exit_v

    return fwd, bwd


def _block_masks_lm(len_ref, t0, k_steps, shift=0):
    """(K, 1, B) prefix masks from the (1, B) per-utterance lengths."""
    lens = len_ref[:].astype(jnp.float32)              # (1, B)
    ks = jax.lax.broadcasted_iota(
        jnp.int32, (k_steps, 1, 1), 0
    ).astype(jnp.float32)
    return (lens[None] > t0 + shift + ks).astype(jnp.float32)


def _exp_block_lm(llh_all, m_all):
    """:func:`_exp_block` on (K, S, B) tiles — the rowmax runs over the
    state (sublane) dim."""
    mx = jnp.max(llh_all, axis=1, keepdims=True)       # (K, 1, B)
    e = m_all * jnp.exp(llh_all - mx) + (1.0 - m_all)
    return e, mx * m_all


def _dot2_sel_lm(sel_t, x):
    """sel_t @ x for a 0/1 one-hot (n, S) selection against lane-major
    (S, B) values in TWO bf16 MXU passes (sel exact in bf16, x hi/lo
    split) — the lane-major mirror of :func:`_dot2_sel`."""
    x_hi, x_lo = _split_bf16(x)
    sel_b = sel_t.astype(jnp.bfloat16)
    return (
        jnp.dot(sel_b, x_hi, preferred_element_type=jnp.float32)
        + jnp.dot(sel_b, x_lo, preferred_element_type=jnp.float32)
    )


def _dot3_lm(t_hi, t_lo, p):
    """Aᵀ @ p bf16_3x cross terms on lane-major (S, B) carries — the
    mirror of :func:`_dot3` (with the changing carry on the rhs).
    ``t_hi/t_lo`` from :func:`_split_bf16` of the (S, S) matrix
    (hoisted).  ``BEER_DOT1=1``: one stacked (S, 3S)@(3S, B) dot
    (``[t_hi | t_lo | t_hi] @ [p_hi; p_hi; p_lo]``; the loop-invariant
    t-stack CSE's across the unrolled steps) — measured an end-to-end
    wash (the changing carry's per-step re-stack eats the MXU saving;
    see the DOT1 flag comment), so 3 dots stay the default."""
    p_hi, p_lo = _split_bf16(p)
    if DOT1:
        t_st = jnp.concatenate([t_hi, t_lo, t_hi], axis=1)
        p_st = jnp.concatenate([p_hi, p_hi, p_lo], axis=0)
        return jnp.dot(t_st, p_st, preferred_element_type=jnp.float32)
    return (
        jnp.dot(t_hi, p_hi, preferred_element_type=jnp.float32)
        + jnp.dot(t_lo, p_hi, preferred_element_type=jnp.float32)
        + jnp.dot(t_hi, p_lo, preferred_element_type=jnp.float32)
    )


def _llh_block_lm(x_ref, w_ref, bias_ref):
    """Whole-block lane-major llh (K, S, B) = W (S, P) @ stats_k (P, B)
    + bias (S, 1), HIGHEST precision — the exact op
    ``NormalSet.expected_log_likelihood`` runs outside.  One dot per
    step, all BEFORE the serial chain (the llh tiles don't depend on
    the carry, so nothing serializes against the recursion)."""
    x = x_ref[:].astype(jnp.float32)                   # (K, P, B)
    w = w_ref[:]                                       # (S, P)
    bias = bias_ref[:]                                 # (S, 1)
    return jnp.stack([
        jnp.dot(w, x[k], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST) + bias
        for k in range(x.shape[0])
    ])


def _make_fwd_llh_ckpt_kernel_lm(k_steps, banded: bool = True,
                                 fuse_ellh: bool = False,
                                 store_alpha: bool = False):
    """Lane-major mirror of :func:`_make_fwd_llh_ckpt_kernel`:
    identical per-row arithmetic on (S, B) tiles.  ``banded=False``
    takes the TRANSPOSED dense (S, S) matrix (α column-vector
    convention: α_t = Aᵀ α_{t-1} ⊙ e_t).

    No lane-chunked variant: splitting the batch LANES into sub-chains
    requires sublane broadcasts of lane-offset (1, cb) slices, which
    Mosaic rejects on real TPUs ("invalid input layout"; XLA
    canonicalizes the broadcast-then-slice workaround straight back),
    and the on-chip gate run measured chunked recursions LOSING in both
    orientations anyway (tools/exp_batch_chunks.py, v5e: batch-major
    fwd C=2 0.84 ms vs C=1 0.70 ms) — so the knob is ignored here.

    With ``fuse_ellh`` the kernel streams the reduced sufficient
    statistics (T, P, B) instead of llh (T, S, B) and computes llh in
    VMEM (:func:`_llh_block_lm`) — llh never exists in HBM."""

    def kernel(*refs):
        if fuse_ellh:
            (llh_ref, len_ref, w_ref, bias_ref, band_ref, init_ref,
             *outs) = refs
        else:
            (llh_ref, len_ref, band_ref, init_ref, *outs) = refs
            w_ref = bias_ref = None
        if store_alpha:
            (alpha_out, norm_out, last_out, logz_out, carry_p, carry_z,
             carry_last) = outs
            ckpt_out = None
        else:
            (ckpt_out, last_out, logz_out, carry_p, carry_z,
             carry_last) = outs
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            carry_p[:] = init_ref[:].astype(jnp.float32)
            carry_z[:] = jnp.zeros_like(carry_z)
            carry_last[:] = jnp.zeros_like(carry_last)

        p = carry_p[:]
        if not store_alpha:
            ckpt_out[0] = p.astype(ckpt_out.dtype)
        if banded:
            propagate, _ = _band_propagators_lm(band_ref)
        else:
            t_hi, t_lo = _split_bf16(band_ref[:])   # (S, S) = transᵀ
            propagate = lambda q: _dot3_lm(t_hi, t_lo, q)
        t0 = (pid * k_steps).astype(jnp.float32)
        m_all = _block_masks_lm(len_ref, t0, k_steps)
        mn_all = _block_masks_lm(len_ref, t0, k_steps, shift=1)
        is_last_all = m_all * (1.0 - mn_all)
        llh_all = (_llh_block_lm(llh_ref, w_ref, bias_ref) if fuse_ellh
                   else llh_ref[:].astype(jnp.float32))
        e_all, mllh_all = _exp_block_lm(llh_all, m_all)
        norms = []
        # no mask blend in the chain; exact α̂(len−1) captured out of
        # the chain by the is_last accumulation (see the batch-major
        # kernel's note)
        last_blk = 0.0
        a_steps = []
        for k in range(k_steps):
            propagated = propagate(p)
            if k == 0:
                base = jnp.where(pid == 0, p, propagated)
            else:
                base = propagated
            raw = base * e_all[k]
            norm = jnp.maximum(raw.sum(0, keepdims=True), tiny)
            p = raw / norm
            keep = m_all[k]
            if k == 0:
                keep = jnp.where(pid == 0, 1.0, keep)
            last_blk = last_blk + is_last_all[k] * p
            norms.append(keep * norm + (1.0 - keep))
            if store_alpha:
                a_steps.append(p)
        carry_p[:] = p
        if store_alpha:
            alpha_out[:] = jnp.stack(a_steps).astype(alpha_out.dtype)
            norm_out[:] = jnp.stack(norms).astype(norm_out.dtype)
        last_acc = carry_last[:] + last_blk
        carry_last[:] = last_acc
        logn = jnp.log(jnp.stack(norms)).sum(0)
        z = carry_z[:] + logn + mllh_all.sum(0)
        carry_z[:] = z
        lens = len_ref[:].astype(jnp.float32)
        last_out[0] = jnp.where(
            lens > 0, last_acc, init_ref[:].astype(jnp.float32)
        ).astype(last_out.dtype)
        logz_out[0] = z.astype(logz_out.dtype)

    return kernel


def forward_llh_ckpt_pass_lm(llh_lm, bands, init_vec, mask,
                             interpret: bool = False, trans=None,
                             batch_chunks=None, w=None, bias=None,
                             store_alpha: bool = False):
    """Lane-major scaled forward with block-entry checkpoints.

    Inputs: llh_lm (T, S, B) time-major LANE-MAJOR log-likelihoods;
    bands the (a_self, a_adv, exit, w) tuple of (S,) vectors — or
    ``bands=None, trans=(S, S)`` for a dense transition matrix;
    init_vec (S, B); mask (B, T) prefix masks.  Returns
    (ckpts (n_blocks, S, B), last (S, B), logz_base (B,)) — same
    semantics as :func:`forward_llh_ckpt_pass` with every per-frame
    array transposed.  ``batch_chunks`` is accepted for signature
    parity with the batch-major pass but IGNORED — see the kernel
    factory's docstring (Mosaic layout limit + measured loss).

    With ``w (S, P)`` / ``bias (S,)``, ``llh_lm`` is instead the
    reduced sufficient-stats stream (T, P, B) and llh is computed in
    VMEM (fused-ELLH; llh never exists in HBM).

    With ``store_alpha`` the kernel emits the FULL α̂ trajectory and
    per-step normalizers instead of block checkpoints — returns
    (alphas (t_pad, S, B), norms (t_pad, 1, B), last, logz_base) for
    :func:`phone_loop_estep_ckpt_acc_lm`'s recompute-free mode (see
    the STORE_ALPHA flag).  Values are bit-identical to the ckpt
    route's recompute.
    """
    del batch_chunks
    banded = bands is not None
    fuse = w is not None
    t_len = llh_lm.shape[0]
    b = llh_lm.shape[2]
    s = w.shape[0] if fuse else llh_lm.shape[1]
    k_steps = _steps_per_block(b, s)
    t_pad = -(-t_len // k_steps) * k_steps
    llh_p = _pad_tm(llh_lm, t_pad, 0.0)
    lens = mask.astype(jnp.float32).sum(-1)[None, :]   # (1, B)
    n_blocks = t_pad // k_steps
    if banded:
        band_arr = jnp.stack(list(bands), axis=-1).astype(jnp.float32)
    else:
        band_arr = trans.T.astype(jnp.float32)         # (S, S)
    idx = lambda t: (t, 0, 0)
    big_one = pl.BlockSpec((1, s, b), idx, memory_space=pltpu.VMEM)
    fixed_one = pl.BlockSpec((1, s, b), lambda t: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    fixed_small = pl.BlockSpec((1, 1, b), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda t: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((k_steps, llh_lm.shape[1], b), idx,
                     memory_space=pltpu.VMEM),
        const2((1, b)),
    ]
    args = [llh_p, lens]
    if fuse:
        in_specs += [const2(w.shape), const2((s, 1))]
        args += [w.astype(jnp.float32),
                 bias.astype(jnp.float32)[:, None]]
    in_specs += [const2(band_arr.shape), const2((s, b))]
    if store_alpha:
        out_specs = [
            pl.BlockSpec((k_steps, s, b), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((k_steps, 1, b), idx, memory_space=pltpu.VMEM),
            fixed_one, fixed_small,
        ]
        out_shape = [
            jax.ShapeDtypeStruct((t_pad, s, b), llh_lm.dtype),
            jax.ShapeDtypeStruct((t_pad, 1, b), llh_lm.dtype),
            jax.ShapeDtypeStruct((1, s, b), llh_lm.dtype),
            jax.ShapeDtypeStruct((1, 1, b), llh_lm.dtype),
        ]
    else:
        out_specs = [big_one, fixed_one, fixed_small]
        out_shape = [
            jax.ShapeDtypeStruct((n_blocks, s, b), llh_lm.dtype),
            jax.ShapeDtypeStruct((1, s, b), llh_lm.dtype),
            jax.ShapeDtypeStruct((1, 1, b), llh_lm.dtype),
        ]
    outs = pl.pallas_call(
        _make_fwd_llh_ckpt_kernel_lm(k_steps, banded=banded,
                                     fuse_ellh=fuse,
                                     store_alpha=store_alpha),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((s, b), jnp.float32),
            pltpu.VMEM((1, b), jnp.float32),
            pltpu.VMEM((s, b), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or FORCE_INTERPRET,
    )(*args, band_arr, init_vec)
    if store_alpha:
        alphas, norms, last, logz = outs
        return (alphas, norms, last[0], logz[0, 0])
    ckpts, last, logz = outs
    return (ckpts, last[0], logz[0, 0])


def _make_estep_ckpt_kernel_lm(k_steps: int, n_blocks: int,
                               banded: bool = True,
                               full_xi: bool = False,
                               fuse_ellh: bool = False):
    """Lane-major mirror of :func:`_make_estep_ckpt_kernel`
    (γ-emitting): identical per-row arithmetic on (S, B) tiles; the
    selection products contract the state (sublane) dim on the MXU, the
    ξ outer products contract the batch (lane) dim.  ``banded=False``
    takes TWO dense (S, S) matrices (transᵀ for the α̂ recompute, trans
    for the v-space backward); ``full_xi`` = identity selections
    (general-HMM (S, S) ξ).  With ``fuse_ellh`` the stream is the
    reduced stats and llh is computed in VMEM (:func:`_llh_block_lm`).
    No lane-chunked variant — see
    :func:`_make_fwd_llh_ckpt_kernel_lm`."""

    def kernel(*refs):
        if fuse_ellh:
            (llh_ref, len_ref, ckpt_ref, w_ref, bias_ref) = refs[:5]
            rest = refs[5:]
        else:
            (llh_ref, len_ref, ckpt_ref) = refs[:3]
            rest = refs[3:]
            w_ref = bias_ref = None
        if banded:
            band_ref = rest[0]
            rest = rest[1:]
            trans_t_ref = None
        else:
            band_ref, trans_t_ref = rest[:2]
            rest = rest[2:]
        final_ref = rest[0]
        rest = rest[1:]
        if full_xi:
            selr_ref = selc_ref = None
        else:
            selr_ref, selc_ref = rest[:2]
            rest = rest[2:]
        (gamma_out, xi_out, carry_v, carry_wsel, carry_wgt, xi) = rest
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            f = final_ref[:].astype(jnp.float32)
            carry_v[:] = f / jnp.maximum(f.sum(0, keepdims=True), tiny)
            carry_wsel[:] = jnp.zeros_like(carry_wsel)
            carry_wgt[:] = jnp.zeros_like(carry_wgt)
            xi[:] = jnp.zeros_like(xi)

        t0 = ((n_blocks - 1 - pid) * k_steps).astype(jnp.float32)
        first_time_block = pid == n_blocks - 1
        m_all = _block_masks_lm(len_ref, t0, k_steps)
        mn_all = _block_masks_lm(len_ref, t0, k_steps, shift=1)
        llh_all = (_llh_block_lm(llh_ref, w_ref, bias_ref) if fuse_ellh
                   else llh_ref[:].astype(jnp.float32))
        e_all, _ = _exp_block_lm(llh_all, m_all)

        if banded:
            propagate, propagate_t = _band_propagators_lm(band_ref)
        else:
            # fwd: α = Aᵀ α (band_ref holds Aᵀ); bwd: u = A v̂
            ft_hi, ft_lo = _split_bf16(band_ref[:])
            bt_hi, bt_lo = _split_bf16(trans_t_ref[:])
            propagate = lambda q: _dot3_lm(ft_hi, ft_lo, q)
            propagate_t = lambda q: _dot3_lm(bt_hi, bt_lo, q)
        final = final_ref[:].astype(jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        is_last_all = m_all * (1.0 - mn_all)
        p = ckpt_ref[0].astype(jnp.float32)
        v_hat = carry_v[:]
        prev_wsel = carry_wsel[:]
        prev_wgt = carry_wgt[:]
        a_list, norm_list = [], []
        u1_list = [None] * k_steps
        for j in range(k_steps):
            k = k_steps - 1 - j
            # no mask blends in either chain — bit-identical for live
            # steps, post-end drift masked downstream (see the
            # batch-major kernel's note)
            propagated = propagate(p)
            if j == 0:
                base = jnp.where(first_time_block, p, propagated)
            else:
                base = propagated
            raw = base * e_all[j]
            norm = jnp.maximum(raw.sum(0, keepdims=True), tiny)
            p = raw / norm
            keep = m_all[j]
            if j == 0:
                keep = jnp.where(first_time_block, 1.0, keep)
            a_list.append(p)
            norm_list.append(keep * norm + (1.0 - keep))
            u1 = propagate_t(v_hat)
            u1 = (is_last_all[k] * final
                  + (1.0 - is_last_all[k]) * u1)
            u1_list[k] = u1
            v = e_all[k] * u1
            sv = jnp.maximum(v.sum(0, keepdims=True), tiny)
            v_hat = v / sv
        carry_v[:] = v_hat

        # vectorized epilogue
        xi_v = xi[:]
        a_all = jnp.stack(a_list)                       # (K, S, B)
        norm_all = jnp.stack(norm_list)                 # (K, 1, B)
        u1_all = jnp.stack(u1_list)                     # (K, S, B)
        ab_all = a_all * u1_all
        absum_all = ab_all.sum(1, keepdims=True)
        gamma_all = (ab_all / jnp.maximum(absum_all, tiny)) * m_all
        v_all = e_all * u1_all
        sv_all = jnp.maximum(v_all.sum(1, keepdims=True), tiny)
        w_all = v_all / sv_all
        denom_all = norm_all * absum_all / sv_all
        wgt_all = jnp.where(denom_all > 1e-30,
                            m_all / jnp.maximum(denom_all, 1e-30), 0.0)
        gamma_out[:] = gamma_all.astype(gamma_out.dtype)

        # per-step selection products (contract S on the MXU) + ξ
        # outer products (contract B)
        if full_xi:
            # identity selections: the ξ factors ARE the carries
            wsel_steps = [w_all[k] for k in range(k_steps)]
            usel_steps = [a_all[k] for k in range(k_steps)]
        else:
            wsel_steps = [
                _dot2_sel_lm(selc_ref[:], w_all[k])
                for k in range(k_steps)
            ]                                           # each (C, B)
            usel_steps = [
                _dot2_sel_lm(selr_ref[:], a_all[k])
                for k in range(k_steps)
            ]                                           # each (R, B)
        for k in range(k_steps - 1):
            uw = usel_steps[k] * wgt_all[k + 1]
            xi_v = xi_v + jax.lax.dot_general(
                uw, wsel_steps[k + 1],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi,
            )
        xi_v = xi_v + jax.lax.dot_general(
            usel_steps[k_steps - 1] * prev_wgt, prev_wsel,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )
        carry_wsel[:] = wsel_steps[0]
        carry_wgt[:] = wgt_all[0]
        xi[:] = xi_v
        xi_out[:] = xi_v.astype(xi_out.dtype)

    return kernel


def phone_loop_estep_ckpt_pass_lm(llh_lm, ckpts, bands, final_vec, mask,
                                  sel_r_t, sel_c_t,
                                  interpret: bool = False, trans=None,
                                  batch_chunks=None, w=None, bias=None):
    """Lane-major fused smoothing + restricted ξ from forward
    checkpoints — the (S, B) mirror of
    :func:`phone_loop_estep_ckpt_pass` (γ-emitting).

    Inputs: llh_lm (T, S, B); ckpts (n_blocks, S, B) from
    :func:`forward_llh_ckpt_pass_lm`; final_vec (S, B);
    sel_r_t/sel_c_t (n, S) one-hot selections (pre-transposed) — or
    both ``None`` for full (S, S) ξ (identity selections, general HMM).
    ``bands=None, trans=(S, S)`` selects the dense transition path.
    With ``w (S, P)`` / ``bias (S,)``, ``llh_lm`` is instead the
    reduced stats stream (T, P, B) and llh is computed in VMEM.
    Returns (γ (T, S, B), xi_raw (n_r, n_c)).  ``batch_chunks`` is
    accepted for signature parity with the batch-major pass but
    IGNORED — see :func:`_make_fwd_llh_ckpt_kernel_lm`.
    """
    del batch_chunks
    banded = bands is not None
    full_xi = sel_r_t is None
    fuse = w is not None
    t_len = llh_lm.shape[0]
    b = llh_lm.shape[2]
    s = w.shape[0] if fuse else llh_lm.shape[1]
    n_r, n_c = (s, s) if full_xi else (sel_r_t.shape[0], sel_c_t.shape[0])
    dtype = llh_lm.dtype
    k_steps = _steps_per_block(b, s)
    t_pad = -(-t_len // k_steps) * k_steps
    n_blocks = t_pad // k_steps
    if ckpts.shape[0] != n_blocks:
        raise ValueError(
            f"checkpoint count {ckpts.shape[0]} != n_blocks {n_blocks}")
    llh_p = _pad_tm(llh_lm, t_pad, 0.0)
    lens = mask.astype(jnp.float32).sum(-1)[None, :]   # (1, B)
    rev = lambda g: (n_blocks - 1 - g, 0, 0)
    big = pl.BlockSpec((k_steps, s, b), rev, memory_space=pltpu.VMEM)
    big_in = pl.BlockSpec((k_steps, llh_lm.shape[1], b), rev,
                          memory_space=pltpu.VMEM)
    ckpt_spec = pl.BlockSpec((1, s, b), rev, memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda t: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [big_in, const2((1, b)), ckpt_spec]
    args = [llh_p, lens, ckpts]
    if fuse:
        in_specs += [const2(w.shape), const2((s, 1))]
        args += [w.astype(jnp.float32),
                 bias.astype(jnp.float32)[:, None]]
    if banded:
        band_arr = jnp.stack(list(bands), axis=-1).astype(jnp.float32)
        in_specs.append(const2((s, 4)))
        args.append(band_arr)
    else:
        in_specs += [const2((s, s)), const2((s, s))]
        args += [trans.T.astype(jnp.float32), trans.astype(jnp.float32)]
    in_specs.append(const2((s, b)))
    args.append(final_vec)
    if not full_xi:
        in_specs += [const2((n_r, s)), const2((n_c, s))]
        args += [sel_r_t, sel_c_t]
    gamma, xi = pl.pallas_call(
        _make_estep_ckpt_kernel_lm(
            k_steps, n_blocks, banded=banded, full_xi=full_xi,
            fuse_ellh=fuse),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[big, const2((n_r, n_c))],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, s, b), dtype),
            jax.ShapeDtypeStruct((n_r, n_c), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, b), jnp.float32),
            pltpu.VMEM((n_c, b), jnp.float32),
            pltpu.VMEM((1, b), jnp.float32),
            pltpu.VMEM((n_r, n_c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or FORCE_INTERPRET,
    )(*args)
    return gamma[:t_len], xi


def _make_estep_ckpt_acc_kernel_lm(k_steps: int, n_blocks: int,
                                   banded: bool = True,
                                   full_xi: bool = False,
                                   fuse_ellh: bool = False,
                                   stored_alpha: bool = False):
    """Accumulating variant of :func:`_make_estep_ckpt_kernel_lm`: the
    (T, S, B) γ array is never written to HBM.  Its only consumers in
    the conjugate M-step are three reductions, all computed in-kernel:

    * ``acc2 (S, P) = Σ_t γ_t ⊗ stats_t`` — one (S, B)@(B, P+1) MXU dot
      per step against the streamed reduced stats (with a ones row
      appended in VMEM, whose column doubles as…)
    * ``counts (S,) = Σ_t,b γ`` — the ones column of the same dot,
    * ``γ_0 (S, B)`` — the first frame's posteriors (the unit-prior
      start term); the first time block is the LAST grid step, so the
      unconditional write leaves exactly that block's value.

    Saves the γ write + re-read (2 × T·S·B·4 bytes ≈ 0.3 GB at the
    bench shape) at the cost of ~3 G MAC of epilogue MXU work.  The
    batch-major fuse_acc measured as a LOSS (tools/exp_acc_variants.py)
    because its in-kernel accumulation serialized against a chain 2.7×
    slower than lane-major's — re-gated for this orientation by
    tools/exp_fuse_acc_lm.py.

    With ``stored_alpha`` the block's α̂ steps and normalizers stream in
    from the forward kernel's stored trajectory (STORE_ALPHA) and the
    serial loop carries ONLY the backward chain — the forward recompute
    (~45% of the per-step vreg issues) is gone; γ/ξ/acc outputs are
    bit-identical (same values, read instead of recomputed)."""

    def kernel(*refs):
        if fuse_ellh:
            # stats stream ONLY: llh is computed in VMEM from (w, bias)
            # and the γᵀ@stats dot reuses the same stats block
            if stored_alpha:
                (stats_ref, len_ref, alpha_ref, normin_ref, w_ref,
                 bias_ref) = refs[:6]
                rest = refs[6:]
                ckpt_ref = None
            else:
                (stats_ref, len_ref, ckpt_ref, w_ref, bias_ref) = refs[:5]
                rest = refs[5:]
                alpha_ref = normin_ref = None
            llh_ref = stats_ref
        else:
            if stored_alpha:
                (llh_ref, len_ref, alpha_ref, normin_ref,
                 stats_ref) = refs[:5]
                rest = refs[5:]
                ckpt_ref = None
            else:
                (llh_ref, len_ref, ckpt_ref, stats_ref) = refs[:4]
                rest = refs[4:]
                alpha_ref = normin_ref = None
            w_ref = bias_ref = None
        if banded:
            band_ref = rest[0]
            rest = rest[1:]
            trans_t_ref = None
        else:
            band_ref, trans_t_ref = rest[:2]
            rest = rest[2:]
        final_ref = rest[0]
        rest = rest[1:]
        if full_xi:
            selr_ref = selc_ref = None
        else:
            selr_ref, selc_ref = rest[:2]
            rest = rest[2:]
        (acc_out, gamma0_out, xi_out,
         carry_v, carry_wsel, carry_wgt, xi, acc_scr) = rest
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            f = final_ref[:].astype(jnp.float32)
            carry_v[:] = f / jnp.maximum(f.sum(0, keepdims=True), tiny)
            carry_wsel[:] = jnp.zeros_like(carry_wsel)
            carry_wgt[:] = jnp.zeros_like(carry_wgt)
            xi[:] = jnp.zeros_like(xi)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        t0 = ((n_blocks - 1 - pid) * k_steps).astype(jnp.float32)
        first_time_block = pid == n_blocks - 1
        m_all = _block_masks_lm(len_ref, t0, k_steps)
        mn_all = _block_masks_lm(len_ref, t0, k_steps, shift=1)
        llh_all = (_llh_block_lm(llh_ref, w_ref, bias_ref) if fuse_ellh
                   else llh_ref[:].astype(jnp.float32))
        e_all, _ = _exp_block_lm(llh_all, m_all)

        if banded:
            propagate, propagate_t = _band_propagators_lm(band_ref)
        else:
            ft_hi, ft_lo = _split_bf16(band_ref[:])
            bt_hi, bt_lo = _split_bf16(trans_t_ref[:])
            propagate = lambda q: _dot3_lm(ft_hi, ft_lo, q)
            propagate_t = lambda q: _dot3_lm(bt_hi, bt_lo, q)
        final = final_ref[:].astype(jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        is_last_all = m_all * (1.0 - mn_all)
        v_hat = carry_v[:]
        prev_wsel = carry_wsel[:]
        prev_wgt = carry_wgt[:]
        u1_list = [None] * k_steps
        if stored_alpha:
            # the forward trajectory streams in — only the backward
            # chain is serial
            a_all = alpha_ref[:].astype(jnp.float32)    # (K, S, B)
            norm_all = normin_ref[:].astype(jnp.float32)  # (K, 1, B)
            for j in range(k_steps):
                k = k_steps - 1 - j
                u1 = propagate_t(v_hat)
                u1 = (is_last_all[k] * final
                      + (1.0 - is_last_all[k]) * u1)
                u1_list[k] = u1
                v = e_all[k] * u1
                sv = jnp.maximum(v.sum(0, keepdims=True), tiny)
                v_hat = v / sv
        else:
            p = ckpt_ref[0].astype(jnp.float32)
            a_list, norm_list = [], []
            for j in range(k_steps):
                k = k_steps - 1 - j
                propagated = propagate(p)
                if j == 0:
                    base = jnp.where(first_time_block, p, propagated)
                else:
                    base = propagated
                raw = base * e_all[j]
                norm = jnp.maximum(raw.sum(0, keepdims=True), tiny)
                p = raw / norm
                keep = m_all[j]
                if j == 0:
                    keep = jnp.where(first_time_block, 1.0, keep)
                a_list.append(p)
                norm_list.append(keep * norm + (1.0 - keep))
                u1 = propagate_t(v_hat)
                u1 = (is_last_all[k] * final
                      + (1.0 - is_last_all[k]) * u1)
                u1_list[k] = u1
                v = e_all[k] * u1
                sv = jnp.maximum(v.sum(0, keepdims=True), tiny)
                v_hat = v / sv
            a_all = jnp.stack(a_list)                   # (K, S, B)
            norm_all = jnp.stack(norm_list)             # (K, 1, B)
        carry_v[:] = v_hat

        # vectorized epilogue (identical γ/ŵ/weights math to the
        # γ-emitting kernel) + the in-VMEM moment accumulation
        xi_v = xi[:]
        u1_all = jnp.stack(u1_list)                     # (K, S, B)
        ab_all = a_all * u1_all
        absum_all = ab_all.sum(1, keepdims=True)
        gamma_all = (ab_all / jnp.maximum(absum_all, tiny)) * m_all
        v_all = e_all * u1_all
        sv_all = jnp.maximum(v_all.sum(1, keepdims=True), tiny)
        w_all = v_all / sv_all
        denom_all = norm_all * absum_all / sv_all
        wgt_all = jnp.where(denom_all > 1e-30,
                            m_all / jnp.maximum(denom_all, 1e-30), 0.0)

        # γ0: every grid step writes; the last (= first time block) wins
        gamma0_out[0] = gamma_all[0].astype(gamma0_out.dtype)

        # acc2 ⊕ counts: γ_k (S, B) · [stats_k; 1] (P+1, B), contract B
        stats_blk = stats_ref[:].astype(jnp.float32)    # (K, P, B)
        ones_row = jnp.ones(
            (k_steps, 1, stats_blk.shape[2]), jnp.float32)
        stats1 = jnp.concatenate([stats_blk, ones_row], axis=1)
        acc_v = acc_scr[:]
        for k in range(k_steps):
            acc_v = acc_v + jax.lax.dot_general(
                gamma_all[k], stats1[k],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi,
            )
        acc_scr[:] = acc_v
        acc_out[:] = acc_v.astype(acc_out.dtype)

        if full_xi:
            wsel_steps = [w_all[k] for k in range(k_steps)]
            usel_steps = [a_all[k] for k in range(k_steps)]
        else:
            wsel_steps = [
                _dot2_sel_lm(selc_ref[:], w_all[k])
                for k in range(k_steps)
            ]
            usel_steps = [
                _dot2_sel_lm(selr_ref[:], a_all[k])
                for k in range(k_steps)
            ]
        for k in range(k_steps - 1):
            uw = usel_steps[k] * wgt_all[k + 1]
            xi_v = xi_v + jax.lax.dot_general(
                uw, wsel_steps[k + 1],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi,
            )
        xi_v = xi_v + jax.lax.dot_general(
            usel_steps[k_steps - 1] * prev_wgt, prev_wsel,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )
        carry_wsel[:] = wsel_steps[0]
        carry_wgt[:] = wgt_all[0]
        xi[:] = xi_v
        xi_out[:] = xi_v.astype(xi_out.dtype)

    return kernel


def phone_loop_estep_ckpt_acc_lm(llh_lm, ckpts, bands, final_vec, mask,
                                 sel_r_t, sel_c_t, stats_lm,
                                 interpret: bool = False, trans=None,
                                 w=None, bias=None,
                                 alphas=None, norms=None):
    """Accumulating lane-major fused E-step: smoothing + restricted ξ
    + in-VMEM γᵀ@stats moment accumulation, with NO (T, S, B) γ output
    (see :func:`_make_estep_ckpt_acc_kernel_lm`).

    ``stats_lm`` (T, P, B) is the reduced sufficient-stats stream
    (time-padded like ``llh_lm``).  With ``w (S, P)`` / ``bias (S,)``,
    llh is computed in VMEM from the SAME stats stream and ``llh_lm``
    is ignored (pass None) — the kernel's only big input is stats.
    Returns (acc2 (S, P) f32, counts (S,) f32, γ0 (S, B),
    xi_raw (n_r, n_c)).

    With ``alphas (t_pad, S, B)`` / ``norms (t_pad, 1, B)`` (from
    :func:`forward_llh_ckpt_pass_lm` ``store_alpha=True``) the kernel
    streams the stored forward trajectory instead of recomputing it
    from ``ckpts`` (pass None) — outputs bit-identical, serial work
    roughly halved (see STORE_ALPHA).
    """
    banded = bands is not None
    full_xi = sel_r_t is None
    fuse = w is not None
    stored = alphas is not None
    t_len, p_dim, b = stats_lm.shape
    s = w.shape[0] if fuse else llh_lm.shape[1]
    n_r, n_c = (s, s) if full_xi else (sel_r_t.shape[0], sel_c_t.shape[0])
    dtype = stats_lm.dtype if fuse else llh_lm.dtype
    k_steps = _steps_per_block(b, s)
    t_pad = -(-t_len // k_steps) * k_steps
    n_blocks = t_pad // k_steps
    if stored:
        if alphas.shape[0] != t_pad:
            raise ValueError(
                f"stored-α̂ length {alphas.shape[0]} != t_pad {t_pad}")
    elif ckpts.shape[0] != n_blocks:
        raise ValueError(
            f"checkpoint count {ckpts.shape[0]} != n_blocks {n_blocks}")
    if not fuse and llh_lm.shape[0] != t_len:
        raise ValueError(
            f"stats length {t_len} != llh length {llh_lm.shape[0]}")
    stats_p = _pad_tm(stats_lm, t_pad, 0.0)
    lens = mask.astype(jnp.float32).sum(-1)[None, :]   # (1, B)
    rev = lambda g: (n_blocks - 1 - g, 0, 0)
    big = pl.BlockSpec((k_steps, s, b), rev, memory_space=pltpu.VMEM)
    big_stats = pl.BlockSpec((k_steps, p_dim, b), rev,
                             memory_space=pltpu.VMEM)
    ckpt_spec = pl.BlockSpec((1, s, b), rev, memory_space=pltpu.VMEM)
    fixed_one = pl.BlockSpec((1, s, b), lambda t: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda t: (0, 0), memory_space=pltpu.VMEM
    )
    if stored:
        fwd_specs = [big,
                     pl.BlockSpec((k_steps, 1, b), rev,
                                  memory_space=pltpu.VMEM)]
        fwd_args = [alphas, norms]
    else:
        fwd_specs = [ckpt_spec]
        fwd_args = [ckpts]
    if fuse:
        in_specs = [big_stats, const2((1, b)), *fwd_specs,
                    const2(w.shape), const2((s, 1))]
        args = [stats_p, lens, *fwd_args, w.astype(jnp.float32),
                bias.astype(jnp.float32)[:, None]]
    else:
        llh_p = _pad_tm(llh_lm, t_pad, 0.0)
        in_specs = [big, const2((1, b)), *fwd_specs, big_stats]
        args = [llh_p, lens, *fwd_args, stats_p]
    if banded:
        band_arr = jnp.stack(list(bands), axis=-1).astype(jnp.float32)
        in_specs.append(const2((s, 4)))
        args.append(band_arr)
    else:
        in_specs += [const2((s, s)), const2((s, s))]
        args += [trans.T.astype(jnp.float32), trans.astype(jnp.float32)]
    in_specs.append(const2((s, b)))
    args.append(final_vec)
    if not full_xi:
        in_specs += [const2((n_r, s)), const2((n_c, s))]
        args += [sel_r_t, sel_c_t]
    acc, gamma0, xi = pl.pallas_call(
        _make_estep_ckpt_acc_kernel_lm(
            k_steps, n_blocks, banded=banded, full_xi=full_xi,
            fuse_ellh=fuse, stored_alpha=stored),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[const2((s, p_dim + 1)), fixed_one,
                   const2((n_r, n_c))],
        out_shape=[
            jax.ShapeDtypeStruct((s, p_dim + 1), jnp.float32),
            jax.ShapeDtypeStruct((1, s, b), dtype),
            jax.ShapeDtypeStruct((n_r, n_c), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, b), jnp.float32),
            pltpu.VMEM((n_c, b), jnp.float32),
            pltpu.VMEM((1, b), jnp.float32),
            pltpu.VMEM((n_r, n_c), jnp.float32),
            pltpu.VMEM((s, p_dim + 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or FORCE_INTERPRET,
    )(*args)
    return acc[:, :p_dim], acc[:, p_dim], gamma0[0], xi


def _make_estep_kernel(k_steps: int, n_blocks: int):
    """Fused phone-loop E-step epilogue: backward recursion + ALL
    accumulations in one kernel — nothing (B, T, S)-sized is written.

    Per step t (time descending; v-space recursion as in
    :func:`_make_smoothing_kernel`, with e computed in-kernel):

      γ_t ∝ α̂_t ⊙ u1_t                       (normalize; posteriors)
      acc += γ_tᵀ @ stats_t                   (emission statistics, (S, P))
      cnt += Σ_b γ_t                          (occupancy counts)
      ξ   += (u_selᵗ ⊙ weight_{t→t+1}) ⊗ w_sel_{t+1}
             with u_sel = α̂_t @ sel_r, w_sel = ŵ @ sel_c, and the
             pair weight from the exact identity weight = m_{t+1} /
             (c_{t+1} · Σα̂u1 / Σ e·u1)   (nu cancels; c = forward norm)
      γ at t = 0 emitted separately (unit start occupancies).

    The ξ output is the raw Σ_t weight·outer — multiply by the
    restricted transition block outside.
    """

    def kernel(llh_ref, m_ref, mn_ref, a_ref, cnorm_ref,
               trans_t_ref, final_ref, selr_ref, selc_ref,
               gamma_out, xi_out,
               carry_v, carry_wsel, carry_wgt, xi, wsel_tile, wgt_tile):
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            f = final_ref[:].astype(jnp.float32)
            carry_v[:] = f / jnp.maximum(f.sum(-1, keepdims=True), tiny)
            carry_wsel[:] = jnp.zeros_like(carry_wsel)
            carry_wgt[:] = jnp.zeros_like(carry_wgt)
            xi[:] = jnp.zeros_like(xi)

        v_hat = carry_v[:]
        # pair factors of (base+K−1 → base+K), prepared by the previous
        # (later-time) block
        prev_wsel = carry_wsel[:]
        prev_wgt = carry_wgt[:]
        tt_hi, tt_lo = _split_bf16(trans_t_ref[:])
        final = final_ref[:].astype(jnp.float32)
        sel_c = selc_ref[:]
        hi = jax.lax.Precision.HIGHEST
        b = v_hat.shape[0]
        # recursion: the γ posteriors stream straight to HBM (the big
        # emission accumulation γᵀ@stats runs as one XLA matmul outside
        # — in-kernel sublane-contracting dots forced Mosaic transposes
        # and lost to the MXU-shaped einsum); only the small ξ factors
        # are buffered and contracted per block here
        for k in range(k_steps - 1, -1, -1):
            m_t = m_ref[k].astype(jnp.float32)
            mn_t = mn_ref[k].astype(jnp.float32)
            is_last = m_t * (1.0 - mn_t)
            e_t, _ = _exp_tile(llh_ref[k].astype(jnp.float32), m_t)
            a_t = a_ref[k].astype(jnp.float32)
            u1 = _dot3(v_hat, tt_hi, tt_lo)
            u1 = is_last * final + (1.0 - is_last) * u1
            # posteriors: γ ∝ a·u1 (the β̂ normalizer cancels)
            ab = a_t * u1
            pn = jnp.maximum(ab.sum(-1, keepdims=True), tiny)
            gamma = (ab / pn) * m_t
            gamma_out[k] = gamma.astype(gamma_out.dtype)
            # pair (t−1 → t) factors: w selection + exact weight
            v = e_t * u1
            sv = jnp.maximum(v.sum(-1, keepdims=True), tiny)
            w = v / sv
            wsel_tile[k] = jnp.dot(w, sel_c,
                                   preferred_element_type=jnp.float32,
                                   precision=hi)
            denom = cnorm_ref[k].astype(jnp.float32) * ab.sum(
                -1, keepdims=True
            ) / sv
            wgt_tile[k] = jnp.where(denom > 1e-30,
                                    m_t / jnp.maximum(denom, 1e-30), 0.0)
            v_hat = m_t * w + (1.0 - m_t) * v_hat
        carry_v[:] = v_hat

        # ---- ξ block contraction: u_sel over the whole a-tile; in-block
        # pairs use (wsel, wgt) at k+1; the boundary pair uses the
        # previous (later-time) block's carry
        u_sel_all = jnp.dot(
            a_ref[:].astype(jnp.float32).reshape(k_steps * b, -1),
            selr_ref[:],
            preferred_element_type=jnp.float32, precision=hi,
        ).reshape(k_steps, b, -1)                          # (K, B, R)
        wsel_all = wsel_tile[:]
        wgt_all = wgt_tile[:]
        uw_in = (u_sel_all[:-1] * wgt_all[1:]).reshape((k_steps - 1) * b, -1)
        xi_v = xi[:] + jax.lax.dot_general(
            uw_in, wsel_all[1:].reshape((k_steps - 1) * b, -1),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )
        xi_v = xi_v + jax.lax.dot_general(
            u_sel_all[k_steps - 1] * prev_wgt, prev_wsel,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )
        carry_wsel[:] = wsel_all[0]
        carry_wgt[:] = wgt_all[0]
        xi[:] = xi_v
        xi_out[:] = xi_v.astype(xi_out.dtype)

    return kernel


def phone_loop_estep_pass(llh_tm, a_tm, norms_tm, trans,
                          final_vec, mask, sel_r, sel_c,
                          interpret: bool = False):
    """Fused backward smoothing + in-kernel restricted ξ; see
    :func:`_make_estep_kernel`.

    Inputs time-major: llh_tm/a_tm (T, B, S), norms_tm (T, B) (forward
    per-step norms); mask (B, T); sel_r/sel_c (S, n) one-hot state
    selections (ξ row/col restriction).  Returns ``(gamma (T, B, S)
    state posteriors, xi_raw (n_r, n_c))``.
    """
    t_len, b, s = llh_tm.shape
    n_r, n_c = sel_r.shape[1], sel_c.shape[1]
    dtype = llh_tm.dtype
    k_steps = _steps_per_block(b, s)
    t_pad = -(-t_len // k_steps) * k_steps
    llh_p = _pad_tm(llh_tm, t_pad, 0.0)
    a_p = _pad_tm(a_tm, t_pad, 1.0)
    m_tm = _pad_tm(mask.T, t_pad, 0.0)[..., None]
    mn = jnp.concatenate(
        [mask[:, 1:], jnp.zeros((b, t_pad - t_len + 1), mask.dtype)], axis=1
    )
    mn_tm = jnp.swapaxes(mn, 0, 1)[..., None]
    cn_tm = _pad_tm(norms_tm, t_pad, 1.0)[..., None]
    n_blocks = t_pad // k_steps
    rev = lambda g: (n_blocks - 1 - g, 0, 0)
    big = pl.BlockSpec((k_steps, b, s), rev, memory_space=pltpu.VMEM)
    small = pl.BlockSpec((k_steps, b, 1), rev, memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda t: (0, 0), memory_space=pltpu.VMEM
    )
    gamma, xi = pl.pallas_call(
        _make_estep_kernel(k_steps, n_blocks),
        grid=(n_blocks,),
        in_specs=[
            big, small, small, big, small,
            const2((s, s)), const2((b, s)), const2((s, n_r)),
            const2((s, n_c)),
        ],
        out_specs=[big, const2((n_r, n_c))],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, s), dtype),
            jax.ShapeDtypeStruct((n_r, n_c), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, s), jnp.float32),
            pltpu.VMEM((b, n_c), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((n_r, n_c), jnp.float32),
            pltpu.VMEM((k_steps, b, n_c), jnp.float32),
            pltpu.VMEM((k_steps, b, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or FORCE_INTERPRET,
    )(llh_p, m_tm, mn_tm, a_p, cn_tm, trans.T, final_vec,
      sel_r, sel_c)
    return gamma[:t_len], xi


@functools.cache
def available() -> bool:
    """Pallas path only on real TPU backends.

    Explicit ``== "tpu"`` (the axon tunnel also reports ``"tpu"``): the
    kernels use ``pltpu.VMEM`` BlockSpecs, which would crash rather than
    fall back on a CUDA/ROCm backend.  :data:`FORCE_INTERPRET` overrides
    for CPU testing of the fused model paths (clear the cache after
    toggling the flag at runtime).
    """
    return FORCE_INTERPRET or jax.default_backend() == "tpu"


# ----------------------------------------------------------------------
# Banded (max,+) Viterbi forward (decode path)
# ----------------------------------------------------------------------
def _shift_right_fill(x, fill):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, fill, pltpu.roll(x, 1, 1))


def _make_viterbi_banded_kernel(k_steps: int):
    """Log-space (max,+) step through the band + rank-1 factorization.

    Per step, all VPU on (B, S): three candidate families (stay,
    advance, loop-back through the best exit) — the backtrace state is
    a 3-way choice code per (t, b, s) stored bf16 (values in {0,1,2},
    exact) plus the exit argmax per (t, b) stored f32 (exact to 2^24;
    bf16 would silently round state indices above 256, and phone loops
    with 86+ units x 3 states exceed that).  No normalization: log
    scores drift ~llh·T ≈ -3e4, far inside f32.
    """

    def kernel(llh_ref, m_ref, ls_ref, la_ref, le_ref, lw_ref, init_ref,
               choice_out, exarg_out, alpha_out, carry_a):
        pid = pl.program_id(0)
        neg = -1e30

        @pl.when(pid == 0)
        def _():
            carry_a[:] = jnp.zeros_like(carry_a)  # overwritten at k == 0

        a = carry_a[:]
        ls = ls_ref[:].astype(jnp.float32)
        la = la_ref[:].astype(jnp.float32)
        le = le_ref[:].astype(jnp.float32)
        lw = lw_ref[:].astype(jnp.float32)
        lane = None
        for k in range(k_steps):
            llh_t = llh_ref[k].astype(jnp.float32)
            c_self = a + ls
            c_adv = _shift_right_fill(a + la, neg)
            ex = a + le
            exb = jnp.max(ex, axis=-1, keepdims=True)
            if lane is None:
                lane = jax.lax.broadcasted_iota(jnp.int32, ex.shape, 1)
            exi = jnp.min(
                jnp.where(ex >= exb, lane, ex.shape[-1]),
                axis=-1, keepdims=True)                    # (B, 1)
            c_loop = exb + lw
            best = jnp.maximum(c_self, jnp.maximum(c_adv, c_loop))
            choice = jnp.where(
                c_self >= best, 0, jnp.where(c_adv >= best, 1, 2))
            new = jnp.maximum(llh_t + best, neg)
            keep = m_ref[k].astype(jnp.float32)
            if k == 0:
                first = pid == 0
                init_a = jnp.maximum(
                    init_ref[:].astype(jnp.float32) + llh_t, neg)
                new = jnp.where(first, init_a, new)
                choice = jnp.where(first, 0, choice)
                exi = jnp.where(first, 0, exi)
                keep = jnp.where(first, 1.0, keep)
            a = keep * new + (1.0 - keep) * a
            choice = jnp.where(keep > 0, choice, 0)
            exi = jnp.where(keep > 0, exi, 0)
            choice_out[k] = choice.astype(jnp.bfloat16)
            exarg_out[k] = exi.astype(jnp.float32)
        carry_a[:] = a

        @pl.when(pid == pl.num_programs(0) - 1)
        def _():
            alpha_out[:] = a

    return kernel


def viterbi_fwd_banded(llh_log, log_bands, log_init, mask,
                       interpret: bool = False):
    """Kernel forward for banded Viterbi.

    ``llh_log`` (B, T, S) log-likelihoods, ``log_bands`` = (ls, la, le,
    lw) log-space band vectors, ``log_init`` (S,).  Returns ``(choices
    (T, B, S) int8-valued bf16, ex_args (T, B) int32, alpha_last
    (B, S))`` — the same backtrace inputs the XLA route computes
    (choices[0] is the identity padding for t=0).
    """
    b, t_len, s = llh_log.shape
    k_steps = _steps_per_block(b, s)
    t_pad = -(-t_len // k_steps) * k_steps
    llh_tm = jnp.swapaxes(_pad_time(llh_log, t_pad, 0.0), 0, 1)
    m_tm = jnp.swapaxes(_pad_time(mask, t_pad, 0.0), 0, 1)[..., None]
    n_blocks = t_pad // k_steps
    idx = lambda t: (t, 0, 0)
    big = pl.BlockSpec((k_steps, b, s), idx, memory_space=pltpu.VMEM)
    small = pl.BlockSpec((k_steps, b, 1), idx, memory_space=pltpu.VMEM)
    band = pl.BlockSpec((1, s), lambda t: (0, 0), memory_space=pltpu.VMEM)
    init_spec = pl.BlockSpec((b, s), lambda t: (0, 0),
                             memory_space=pltpu.VMEM)
    choices, exargs, alpha = pl.pallas_call(
        _make_viterbi_banded_kernel(k_steps),
        grid=(n_blocks,),
        in_specs=[big, small, band, band, band, band, init_spec],
        out_specs=[big, small,
                   pl.BlockSpec((b, s), lambda t: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, s), jnp.bfloat16),
            jax.ShapeDtypeStruct((t_pad, b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, s), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or FORCE_INTERPRET,
    )(llh_tm, m_tm,
      *[v.reshape(1, s) for v in log_bands],
      jnp.broadcast_to(log_init, (b, s)))
    return (choices[:t_len], exargs[:t_len, :, 0].astype(jnp.int32), alpha)


def _make_viterbi_backtrace_kernel(k_steps: int, n_blocks: int):
    """Reverse pass: one-hot state propagation instead of per-element
    gathers.  Per step (B, S) VPU: read the choice under the one-hot,
    then move it — stay (0), shift down one state (1), or jump to the
    stored exit argmax (2)."""

    def kernel(ch_ref, ex_ref, last_ref, path_out, carry_h):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            carry_h[:] = last_ref[:].astype(jnp.float32)

        h = carry_h[:]
        lane = None
        for k in range(k_steps - 1, -1, -1):
            ch = ch_ref[k].astype(jnp.float32)         # (B, S) in {0,1,2}
            if lane is None:
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, ch.shape, 1).astype(jnp.float32)
            state = (h * lane).sum(-1, keepdims=True)  # (B, 1)
            path_out[k] = state.astype(path_out.dtype)
            c = (h * ch).sum(-1, keepdims=True)        # choice at state
            ex = ex_ref[k].astype(jnp.float32)         # (B, 1)
            h_adv = pltpu.roll(h, h.shape[1] - 1, 1)   # state-1 <- state
            h_ex = (lane == ex).astype(jnp.float32)
            h = jnp.where(c == 0, h, jnp.where(c == 1, h_adv, h_ex))
        carry_h[:] = h

    return kernel


def viterbi_backtrace_banded(choices, ex_args, last_onehot,
                             interpret: bool = False):
    """(T, B, S) bf16 choices + (T, B) exit argmaxes + (B, S) final
    one-hot -> (B, T) int32 state path (kernel reverse scan)."""
    t_len, b, s = choices.shape
    k_steps = _steps_per_block(b, s)
    t_pad = -(-t_len // k_steps) * k_steps
    if t_pad != t_len:
        # pad the FRONT so the reversed grid starts on a full block;
        # padded steps use choice=stay and are dropped from the output
        pad = t_pad - t_len
        choices = jnp.concatenate(
            [jnp.zeros((pad, b, s), choices.dtype), choices])
        ex_args = jnp.concatenate(
            [jnp.zeros((pad, b), ex_args.dtype), ex_args])
    n_blocks = t_pad // k_steps
    idx = lambda t: (n_blocks - 1 - t, 0, 0)
    paths = pl.pallas_call(
        _make_viterbi_backtrace_kernel(k_steps, n_blocks),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((k_steps, b, s), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((k_steps, b, 1), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_steps, b, 1), idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, b, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or FORCE_INTERPRET,
    )(choices, ex_args[..., None], last_onehot)
    return jnp.swapaxes(paths[t_pad - t_len:, :, 0], 0, 1).astype(jnp.int32)
