"""Dirichlet prior (conjugate to Categorical).

Reference parity: ``beer/dists/dirichlet.py`` (Dirichlet,
DirichletStdParams).

Basis: T(π) = log π, natural parameters η = α − 1 (shape (..., K)).
A(η) = Σ lgamma(α) − lgamma(Σ α).  E[log π] = digamma(α) − digamma(Σα)
falls out of ∇A automatically.  The categorical data statistic is the
one-hot (or responsibility) vector, so ``α_post = α_prior + counts``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax.scipy.special import gammaln

from beer_tpu.dists.basedist import ExpFamily


@dataclasses.dataclass(frozen=True)
class Dirichlet(ExpFamily):
    dim: int

    @property
    def nat_dim(self) -> int:
        return self.dim

    def to_nat(self, alpha: jnp.ndarray) -> jnp.ndarray:
        return alpha - 1.0

    def to_std(self, nat: jnp.ndarray) -> jnp.ndarray:
        """Concentration α."""
        return nat + 1.0

    def log_norm(self, nat: jnp.ndarray) -> jnp.ndarray:
        alpha = nat + 1.0
        return gammaln(alpha).sum(-1) - gammaln(alpha.sum(-1))


@dataclasses.dataclass(frozen=True)
class Beta(Dirichlet):
    """Beta(a, b) = Dirichlet on 2 categories; used by stick-breaking."""

    dim: int = 2
