"""Gamma prior (scalar precision / concentration hyper-prior).

Reference parity: ``beer/dists/gamma.py``.

Basis: T(λ) = [λ, log λ], η = [−b, a − 1] (shape (..., 2)).
A(η) = lgamma(a) − a log b.  ∇A = [a/b, digamma(a) − log b] = [E[λ], E[log λ]].
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax.scipy.special import gammaln

from beer_tpu.dists.basedist import ExpFamily


@dataclasses.dataclass(frozen=True)
class Gamma(ExpFamily):
    @property
    def nat_dim(self) -> int:
        return 2

    def to_nat(self, shape: jnp.ndarray, rate: jnp.ndarray) -> jnp.ndarray:
        return jnp.stack([-rate, shape - 1.0], axis=-1)

    def to_std(self, nat: jnp.ndarray):
        """Returns (shape a, rate b)."""
        return nat[..., 1] + 1.0, -nat[..., 0]

    def log_norm(self, nat: jnp.ndarray) -> jnp.ndarray:
        a, b = nat[..., 1] + 1.0, -nat[..., 0]
        return gammaln(a) - a * jnp.log(b)
