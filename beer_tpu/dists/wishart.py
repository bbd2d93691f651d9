"""Wishart prior over a precision matrix.

Reference parity: ``beer/dists/wishart.py``.

Basis: T(Λ) = [vec(Λ), log|Λ|], η = [vec(−½ W⁻¹), (ν − D − 1)/2],
flat shape (..., D² + 1).
A(η) = (ν/2) log|W| + (νD/2) log 2 + log Γ_D(ν/2).
∇A gives E[Λ] = νW and E[log|Λ|] = Σ digamma((ν+1−i)/2) + D log2 + log|W|.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax.scipy.special import multigammaln

from beer_tpu.dists.basedist import ExpFamily, logdet_pd, unvec, vec


@dataclasses.dataclass(frozen=True)
class Wishart(ExpFamily):
    dim: int

    @property
    def nat_dim(self) -> int:
        return self.dim * self.dim + 1

    def to_nat(self, scale: jnp.ndarray, dof: jnp.ndarray) -> jnp.ndarray:
        """From standard params: scale matrix W (..., D, D), dof ν."""
        w_inv = jnp.linalg.inv(scale)
        eta1 = vec(-0.5 * w_inv)
        eta2 = (jnp.asarray(dof, eta1.dtype) - self.dim - 1.0) / 2.0
        return jnp.concatenate([eta1, eta2[..., None]], axis=-1)

    def to_std(self, nat: jnp.ndarray):
        """Returns (W, ν)."""
        d = self.dim
        w_inv = unvec(-2.0 * nat[..., : d * d], d)
        dof = 2.0 * nat[..., -1] + d + 1.0
        return jnp.linalg.inv(w_inv), dof

    def log_norm(self, nat: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        w_inv = unvec(-2.0 * nat[..., : d * d], d)
        dof = 2.0 * nat[..., -1] + d + 1.0
        return (
            -0.5 * dof * logdet_pd(w_inv)
            + 0.5 * dof * d * jnp.log(2.0)
            + multigammaln(0.5 * dof, d)
        )
