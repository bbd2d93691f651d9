"""Pallas TPU kernels for the full-covariance sufficient-statistics path.

SURVEY.md §2.9 / §7 step 6: the reference's hottest dense op is the
per-frame full-covariance statistic s(x) = [vec(−½xxᵀ), x, −½, ½] —
O(T·D²) memory if materialized (e.g. 39-dim features, 64k frames ⇒
~400 MB in HBM *twice* per E-step: once for the ELLH contraction, once
for the accumulation).  These kernels build the xxᵀ block **in VMEM a
tile at a time** and feed it straight to the MXU, so only X (T, D) and
the (K, P) results ever touch HBM:

* :func:`fused_ellh_full` — per-frame expected log-likelihood of K
  components: tile-local xxᵀ → two `jnp.dot`s against the expected
  natural parameters (f32 accumulation).
* :func:`fused_accumulate_full` — responsibility-weighted statistics:
  tile-local xxᵀ → `rᵀ @ [vec(xxᵀ), x]` accumulated in VMEM scratch
  across the time grid, written once on the last tile.

Both have exact jnp fallbacks (`*_xla`) used on CPU and in tests
(``interpret=True`` checks kernel == fallback).  Wiring: NormalSet uses
them automatically for ``cov_type='full'`` on TPU when shapes qualify
(see :func:`use_fused_full`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_2PI = math.log(2.0 * math.pi)

TILE_T = 256


def _pad_time(x, tile):
    t = x.shape[0]
    pad = (-t) % tile
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, t


# ----------------------------------------------------------------------
# Fused ELLH: llh[t, k] = -1/2 Σ_ij x_i x_j E[Λ_k]_ij + Σ_i x_i E[Λμ_k]_i
#                         - 1/2 E[μΛμ]_k + 1/2 E[log|Λ|]_k - D/2 log 2π
# ----------------------------------------------------------------------
def _flat_outer(x):
    """Column-blocked xxᵀ flattening: out[:, i·D+j] = x_i·x_j.

    Built with a static concat of (Tt, D) column products — Mosaic cannot
    lower the (Tt, D, D) → (Tt, D²) vector reshape, so the 3-D outer
    product is never formed.
    """
    d = x.shape[-1]
    return jnp.concatenate([x[:, i : i + 1] * x for i in range(d)], axis=1)


def _ellh_kernel(x_ref, elam_ref, elin_ref, const_ref, out_ref):
    x = x_ref[:]                                     # (Tt, D)
    xx = _flat_outer(x)
    quad = jnp.dot(
        xx, elam_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                # (Tt, K) via (D², K)
    lin = jnp.dot(x, elin_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = (-0.5 * quad + lin + const_ref[:]).astype(out_ref.dtype)


def fused_ellh_full(x, e_stats, dim: int, interpret: bool = False):
    """(T, D) frames × (K, D²+D+2) expected stats → (T, K) ELLH."""
    k = e_stats.shape[0]
    d = dim
    elam = e_stats[:, : d * d].T                     # (D², K)
    elin = e_stats[:, d * d : d * d + d].T           # (D, K)
    const = (
        -0.5 * e_stats[:, -2] + 0.5 * e_stats[:, -1] - 0.5 * d * LOG_2PI
    )[None, :]                                       # (1, K)
    x_p, t = _pad_time(x, TILE_T)
    grid = (x_p.shape[0] // TILE_T,)
    out = pl.pallas_call(
        _ellh_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_T, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d * d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_T, k), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((x_p.shape[0], k), x.dtype),
        interpret=interpret,
    )(x_p, elam.astype(x.dtype), elin.astype(x.dtype), const.astype(x.dtype))
    return out[:t]


def ellh_full_xla(x, e_stats, dim: int):
    """Exact jnp fallback (and CPU path)."""
    d = dim
    elam = e_stats[:, : d * d].reshape(-1, d, d)
    elin = e_stats[:, d * d : d * d + d]
    const = -0.5 * e_stats[:, -2] + 0.5 * e_stats[:, -1] - 0.5 * d * LOG_2PI
    quad = jnp.einsum(
        "td,kde,te->tk", x, elam, x, precision=jax.lax.Precision.HIGHEST
    )
    lin = jnp.matmul(x, elin.T, precision=jax.lax.Precision.HIGHEST)
    return -0.5 * quad + lin + const


# ----------------------------------------------------------------------
# Fused accumulation: acc[k] = Σ_t r[t,k] · s(x_t)
# ----------------------------------------------------------------------
def _acc_kernel(x_ref, r_ref, out_ref, acc_xx, acc_x, acc_c):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_xx[:] = jnp.zeros_like(acc_xx)
        acc_x[:] = jnp.zeros_like(acc_x)
        acc_c[:] = jnp.zeros_like(acc_c)

    x = x_ref[:]                                     # (Tt, D)
    r = r_ref[:]                                     # (Tt, K)
    xx = _flat_outer(x)
    acc_xx[:] += jnp.dot(r.T, xx, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    acc_x[:] += jnp.dot(r.T, x, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    acc_c[:] += jnp.sum(r, axis=0, keepdims=True).astype(jnp.float32)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        counts = acc_c[:].T                          # (K, 1)
        out_ref[:] = jnp.concatenate(
            [-0.5 * acc_xx[:], acc_x[:], -0.5 * counts, 0.5 * counts],
            axis=1,
        ).astype(out_ref.dtype)


def fused_accumulate_full(x, resps, interpret: bool = False):
    """(T, D) frames × (T, K) responsibilities → (K, D²+D+2) statistics."""
    d = x.shape[-1]
    k = resps.shape[-1]
    x_p, _ = _pad_time(x, TILE_T)
    r_p, _ = _pad_time(resps, TILE_T)  # zero rows contribute nothing
    grid = (x_p.shape[0] // TILE_T,)
    return pl.pallas_call(
        _acc_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_T, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (k, d * d + d + 2), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k, d * d + d + 2), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((k, d * d), jnp.float32),
            pltpu.VMEM((k, d), jnp.float32),
            pltpu.VMEM((1, k), jnp.float32),
        ],
        interpret=interpret,
    )(x_p, r_p)


def accumulate_full_xla(x, resps):
    """Exact jnp fallback: materializes the (T, P) statistics."""
    from beer_tpu.dists.normallik import suff_stats_full

    return jnp.einsum(
        "tk,tp->kp", resps, suff_stats_full(x),
        precision=jax.lax.Precision.HIGHEST,
    )


# ----------------------------------------------------------------------
# Dispatch policy
# ----------------------------------------------------------------------
@functools.cache
def on_tpu() -> bool:
    # explicit: these kernels are TPU-only (pltpu.VMEM BlockSpecs); a
    # CUDA/ROCm backend must take the jnp fallback, not crash.
    return jax.default_backend() == "tpu"


def use_fused_full(dim: int, ncomp: int) -> bool:
    """Heuristic: worth fusing when the (T, D²) materialization is big and
    the per-tile VMEM footprint (xx tile + accumulators) fits; dim is
    capped because the column-blocked outer product unrolls D concats."""
    vmem_bytes = 4 * (TILE_T * dim * dim + ncomp * (dim * dim + dim))
    return (
        on_tpu() and 8 <= dim <= 64 and vmem_bytes < 8 * 1024 * 1024
    )
