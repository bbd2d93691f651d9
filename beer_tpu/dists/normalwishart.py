"""NormalWishart prior (conjugate to a full-covariance Normal).

Reference parity: ``beer/dists/normalwishart.py`` (NormalWishart,
NormalWishartStdParams).

p(μ, Λ) = N(μ | m, (κΛ)⁻¹) Wishart(Λ | W, ν).

Basis (flat layout, P = D² + D + 2):
    T(θ) = [vec(Λ), Λμ, μᵀΛμ, log|Λ|]
    η    = [vec(−½(W⁻¹ + κ m mᵀ)), κm, −κ/2, (ν − D)/2]
    A(η) = (ν/2) log|W| + (νD/2) log 2 + log Γ_D(ν/2)
           − (D/2) log κ + (D/2) log 2π

Matching full-covariance Normal data statistic (dists/normallik.py):
    s(x) = [vec(−½ x xᵀ), x, −½, ½]
so ⟨s(x), T(θ)⟩ = −½xᵀΛx + xᵀΛμ − ½μᵀΛμ + ½log|Λ| = log N(x|μ, Λ⁻¹) + D/2 log2π.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
from jax.scipy.special import multigammaln

from beer_tpu.dists.basedist import ExpFamily, logdet_pd, sym, unvec, vec

LOG_2PI = math.log(2.0 * math.pi)


@dataclasses.dataclass(frozen=True)
class NormalWishart(ExpFamily):
    dim: int

    @property
    def nat_dim(self) -> int:
        d = self.dim
        return d * d + d + 2

    def to_nat(self, mean, scale, scale_matrix, dof) -> jnp.ndarray:
        """m (..., D), κ, W (..., D, D), ν → η (..., D²+D+2)."""
        mean = jnp.asarray(mean)
        scale = jnp.broadcast_to(jnp.asarray(scale, mean.dtype), mean.shape[:-1])
        dof = jnp.broadcast_to(jnp.asarray(dof, mean.dtype), mean.shape[:-1])
        w_inv = jnp.linalg.inv(scale_matrix)
        mmt = mean[..., :, None] * mean[..., None, :]
        eta1 = vec(-0.5 * (w_inv + scale[..., None, None] * mmt))
        return jnp.concatenate(
            [
                eta1,
                scale[..., None] * mean,
                (-0.5 * scale)[..., None],
                (0.5 * (dof - self.dim))[..., None],
            ],
            axis=-1,
        )

    def to_std(self, nat: jnp.ndarray):
        """Returns (m, κ, W, ν)."""
        d = self.dim
        eta1 = unvec(nat[..., : d * d], d)
        eta2 = nat[..., d * d : d * d + d]
        scale = -2.0 * nat[..., -2]
        dof = 2.0 * nat[..., -1] + d
        mean = eta2 / scale[..., None]
        mmt = mean[..., :, None] * mean[..., None, :]
        w_inv = -2.0 * eta1 - scale[..., None, None] * mmt
        return mean, scale, jnp.linalg.inv(sym(w_inv)), dof

    def _winv_scale_dof(self, nat: jnp.ndarray):
        d = self.dim
        eta1 = unvec(nat[..., : d * d], d)
        eta2 = nat[..., d * d : d * d + d]
        scale = -2.0 * nat[..., -2]
        dof = 2.0 * nat[..., -1] + d
        mean = eta2 / scale[..., None]
        mmt = mean[..., :, None] * mean[..., None, :]
        w_inv = -2.0 * eta1 - scale[..., None, None] * mmt
        return w_inv, scale, dof

    def log_norm(self, nat: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        w_inv, scale, dof = self._winv_scale_dof(nat)
        return (
            -0.5 * dof * logdet_pd(w_inv)
            + 0.5 * dof * d * jnp.log(2.0)
            + multigammaln(0.5 * dof, d)
            - 0.5 * d * jnp.log(scale)
            + 0.5 * d * LOG_2PI
        )
