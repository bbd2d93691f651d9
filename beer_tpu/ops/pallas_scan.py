"""Pallas TPU kernel for the scaled HMM forward/backward recursions.

The framework's hottest sequential op (SURVEY §3.2).  ``lax.scan`` pays
per-iteration XLA loop overhead and bounces the carry through HBM-visible
buffers every step; here the whole T-loop is ONE kernel:

* grid over time with **time-major (T, B, S) layout** (so each block is
  (1, B, S) — last two dims satisfy the TPU (8, 128) tiling rule);
  Pallas auto-pipelines the e_llh/mask tiles (HBM→VMEM double-buffering)
  while the MXU runs the (B, S) @ (S, S) step matmul,
* the carry (normalized probabilities + per-sequence log-scale) lives in
  VMEM scratch across grid steps — it never touches HBM,
* per step the only transcendental is one log on the (B, 1) normalizer
  (the scaled-algorithm formulation of ``semiring_scan._scaled_pass``).

The backward recursion reuses the kernel shape with reversed block index
maps and the transposed transition matrix.  Exact jnp fallback:
``semiring_scan._scaled_pass`` (tests assert agreement in interpret
mode); callers pass batch-major (B, T, S) and transposes happen here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(e_ref, m_ref, trans_ref, init_ref,
                prob_out, logc_out, carry_p, carry_c):
    t = pl.program_id(0)
    tiny = jnp.finfo(jnp.float32).tiny

    @pl.when(t == 0)
    def _():
        carry_p[:] = init_ref[:].astype(jnp.float32)
        carry_c[:] = jnp.zeros_like(carry_c)

    prev_p = carry_p[:]
    prev_c = carry_c[:]
    propagated = jnp.dot(
        prev_p, trans_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    base = jnp.where(t == 0, prev_p, propagated)
    raw = base * e_ref[0].astype(jnp.float32)            # (B, S)
    norm = jnp.maximum(raw.sum(-1, keepdims=True), tiny)
    new_p = raw / norm
    new_c = prev_c + jnp.log(norm)
    keep = jnp.where(t == 0, 1.0, m_ref[0].astype(jnp.float32))  # (B, 1)
    out_p = keep * new_p + (1.0 - keep) * prev_p
    out_c = keep * new_c + (1.0 - keep) * prev_c
    carry_p[:] = out_p
    carry_c[:] = out_c
    prob_out[0] = out_p.astype(prob_out.dtype)
    logc_out[0] = out_c.astype(logc_out.dtype)


def _bwd_kernel(e_ref, m_ref, trans_t_ref, final_ref,
                prob_out, logc_out, carry_p, carry_c):
    """Backward: β̂ carries; step multiplies by e at t+1 *before* the matmul."""
    g = pl.program_id(0)
    tiny = jnp.finfo(jnp.float32).tiny

    @pl.when(g == 0)
    def _():
        f = final_ref[:].astype(jnp.float32)
        norm0 = jnp.maximum(f.sum(-1, keepdims=True), tiny)
        carry_p[:] = f / norm0
        carry_c[:] = jnp.log(norm0)

    prev_p = carry_p[:]
    prev_c = carry_c[:]
    v = prev_p * e_ref[0].astype(jnp.float32)
    raw = jnp.dot(v, trans_t_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    norm = jnp.maximum(raw.sum(-1, keepdims=True), tiny)
    new_p = raw / norm
    new_c = prev_c + jnp.log(norm)
    keep = jnp.where(g == 0, 0.0, m_ref[0].astype(jnp.float32))
    out_p = keep * new_p + (1.0 - keep) * prev_p
    out_c = keep * new_c + (1.0 - keep) * prev_c
    carry_p[:] = out_p
    carry_c[:] = out_c
    prob_out[0] = out_p.astype(prob_out.dtype)
    logc_out[0] = out_c.astype(logc_out.dtype)


def _call(kernel, e_tm, m_tm, trans, vec, index_map, interpret=False):
    t_len, b, s = e_tm.shape
    dtype = e_tm.dtype
    probs, logcs = pl.pallas_call(
        kernel,
        grid=(t_len,),
        in_specs=[
            pl.BlockSpec((1, b, s), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 1), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, s), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 1), index_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b, s), dtype),
            jax.ShapeDtypeStruct((t_len, b, 1), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, s), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(e_tm, m_tm, trans, vec)
    return probs, logcs


def forward_pass(e_llh, trans, init_vec, mask, interpret: bool = False):
    """Scaled forward; semantics of ``semiring_scan._scaled_pass(False)``.

    Inputs batch-major: e_llh (B, T, S), mask (B, T); outputs likewise.
    """
    b, t_len, s = e_llh.shape
    e_tm = jnp.swapaxes(e_llh, 0, 1)                     # (T, B, S)
    m_tm = jnp.swapaxes(mask, 0, 1)[..., None]           # (T, B, 1)
    probs, logcs = _call(
        _fwd_kernel, e_tm, m_tm, trans, init_vec, lambda t: (t, 0, 0),
        interpret,
    )
    probs = jnp.swapaxes(probs, 0, 1)
    logcs = jnp.swapaxes(logcs[..., 0], 0, 1)
    return probs, logcs, (probs[:, -1], logcs[:, -1])


def backward_pass(e_llh, trans, final_vec, mask, interpret: bool = False):
    """Scaled backward; semantics of ``_scaled_pass(reverse=True)``.

    The kernel walks t = T−1 … 0 via reversed index maps; step g consumes
    e_llh/mask at time t+1, so both are fed shifted by one frame (with a
    dummy tail tile that g=0 never reads thanks to the ``keep`` select).
    """
    b, t_len, s = e_llh.shape
    dtype = e_llh.dtype
    e_shift = jnp.concatenate(
        [e_llh[:, 1:], jnp.ones((b, 1, s), dtype)], axis=1
    )
    m_shift = jnp.concatenate(
        [mask[:, 1:], jnp.zeros((b, 1), mask.dtype)], axis=1
    )
    e_tm = jnp.swapaxes(e_shift, 0, 1)
    m_tm = jnp.swapaxes(m_shift, 0, 1)[..., None]
    nt = t_len
    probs, logcs = _call(
        _bwd_kernel, e_tm, m_tm, trans.T, final_vec,
        lambda g: (nt - 1 - g, 0, 0), interpret,
    )
    probs = jnp.swapaxes(probs, 0, 1)
    logcs = jnp.swapaxes(logcs[..., 0], 0, 1)
    return probs, logcs, None


@functools.cache
def available() -> bool:
    """Pallas path only on real TPU backends.

    Explicit ``== "tpu"`` (the axon tunnel also reports ``"tpu"``): the
    kernels use ``pltpu.VMEM`` BlockSpecs, which would crash rather than
    fall back on a CUDA/ROCm backend.
    """
    return jax.default_backend() == "tpu"
