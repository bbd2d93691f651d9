"""NormalGamma and IsotropicNormalGamma priors.

Reference parity: ``beer/dists/normalgamma.py``,
``beer/dists/isotropicnormalgamma.py``.

NormalGamma — conjugate prior of a diagonal-covariance Normal.  Per
dimension d: p(μ_d, λ_d) = N(μ_d | m_d, (κ_d λ_d)⁻¹) Gamma(λ_d | a_d, b_d).

Basis (flat layout, P = 4D):
    T(θ) = [λ (D), λμ (D), λμ² (D), log λ (D)]
    η    = [−(b + ½κm²), κm, −κ/2, a − ½]
    A(η) = Σ_d lgamma(a_d) − a_d log b_d − ½ log κ_d + ½ log 2π

The matching diagonal-Normal data statistic is
    s(x) = [−½x², x, −½·1, ½·1]      (see dists/normallik.py)
so ⟨s(x), T(θ)⟩ = Σ_d −½λx² + λμx − ½λμ² + ½logλ = log N(x|μ, λ⁻¹) + D/2 log 2π.

IsotropicNormalGamma — scalar precision λ shared across dims, P = D + 3:
    T(θ) = [λ, λμ (D), λ‖μ‖², log λ]
    η    = [−(b + ½κ‖m‖²), κm, −κ/2, a − 1 + D/2]
    A(η) = lgamma(a) − a log b − (D/2) log κ + (D/2) log 2π
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
from jax.scipy.special import gammaln

from beer_tpu.dists.basedist import ExpFamily

LOG_2PI = math.log(2.0 * math.pi)


@dataclasses.dataclass(frozen=True)
class NormalGamma(ExpFamily):
    dim: int

    @property
    def nat_dim(self) -> int:
        return 4 * self.dim

    def to_nat(self, mean, scale, shape, rate) -> jnp.ndarray:
        """m (..., D), κ (..., D), a (..., D), b (..., D) → η (..., 4D)."""
        mean, scale, shape, rate = jnp.broadcast_arrays(mean, scale, shape, rate)
        return jnp.concatenate(
            [
                -(rate + 0.5 * scale * mean**2),
                scale * mean,
                -0.5 * scale,
                shape - 0.5,
            ],
            axis=-1,
        )

    def to_std(self, nat: jnp.ndarray):
        """Returns (m, κ, a, b)."""
        d = self.dim
        eta1, eta2, eta3, eta4 = (
            nat[..., :d],
            nat[..., d : 2 * d],
            nat[..., 2 * d : 3 * d],
            nat[..., 3 * d :],
        )
        scale = -2.0 * eta3
        mean = eta2 / scale
        shape = eta4 + 0.5
        rate = -eta1 - 0.5 * scale * mean**2
        return mean, scale, shape, rate

    def log_norm(self, nat: jnp.ndarray) -> jnp.ndarray:
        mean, scale, shape, rate = self.to_std(nat)
        del mean
        return (
            gammaln(shape)
            - shape * jnp.log(rate)
            - 0.5 * jnp.log(scale)
            + 0.5 * LOG_2PI
        ).sum(-1)


@dataclasses.dataclass(frozen=True)
class IsotropicNormalGamma(ExpFamily):
    dim: int

    @property
    def nat_dim(self) -> int:
        return self.dim + 3

    def to_nat(self, mean, scale, shape, rate) -> jnp.ndarray:
        """m (..., D); κ, a, b scalars (broadcastable) → η (..., D+3)."""
        mean = jnp.asarray(mean)
        scale = jnp.broadcast_to(jnp.asarray(scale, mean.dtype), mean.shape[:-1])
        shape = jnp.broadcast_to(jnp.asarray(shape, mean.dtype), mean.shape[:-1])
        rate = jnp.broadcast_to(jnp.asarray(rate, mean.dtype), mean.shape[:-1])
        return jnp.concatenate(
            [
                (-(rate + 0.5 * scale * (mean**2).sum(-1)))[..., None],
                scale[..., None] * mean,
                (-0.5 * scale)[..., None],
                (shape - 1.0 + 0.5 * self.dim)[..., None],
            ],
            axis=-1,
        )

    def to_std(self, nat: jnp.ndarray):
        d = self.dim
        eta1 = nat[..., 0]
        eta2 = nat[..., 1 : 1 + d]
        scale = -2.0 * nat[..., 1 + d]
        shape = nat[..., 2 + d] + 1.0 - 0.5 * d
        mean = eta2 / scale[..., None]
        rate = -eta1 - 0.5 * scale * (mean**2).sum(-1)
        return mean, scale, shape, rate

    def log_norm(self, nat: jnp.ndarray) -> jnp.ndarray:
        _, scale, shape, rate = self.to_std(nat)
        return (
            gammaln(shape)
            - shape * jnp.log(rate)
            - 0.5 * self.dim * jnp.log(scale)
            + 0.5 * self.dim * LOG_2PI
        )
