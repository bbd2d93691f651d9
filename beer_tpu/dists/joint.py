"""Joint priors: K Normal means sharing one precision.

Reference parity: ``beer/dists/jointnormalwishart.py``,
``jointnormalgamma.py``, ``jointisotropicnormalgamma.py`` — the priors
behind ``NormalSet(cov_type='shared')`` / tied-covariance GMMs.

JointNormalWishart:  p(μ_{1..K}, Λ) = Π_k N(μ_k | m_k, (κ_k Λ)⁻¹) · W(Λ|W, ν)

    T(θ) = [vec(Λ), Λμ_1, …, Λμ_K, μ_1ᵀΛμ_1, …, μ_KᵀΛμ_K, log|Λ|]
    η    = [vec(−½(W⁻¹ + Σ_k κ_k m_k m_kᵀ)), κ_1 m_1, …, −κ_1/2, …,
            (ν − D − 1 + K)/2]
    A    = (ν/2)log|W| + (νD/2)log2 + logΓ_D(ν/2) − (D/2)Σ_k log κ_k
           + (KD/2) log 2π
    P    = D² + KD + K + 1

The component-k data statistic places x in block k:
    s_k(x) = [vec(−½xxᵀ), 0…x…0, 0…−½…0, ½]
so responsibilities-weighted accumulation ties the precision across
components automatically (Σ_k r_tk = 1).

JointNormalGamma (shared diagonal precision vector λ ∈ R^D):
    T(θ) = [λ, λμ_1, …, λμ_K, λμ_1², …, λμ_K², log λ]   (all blocks length D)
    η    = [−(b + ½Σ_k κ_k m_k²), κ_1m_1, …, −κ_1/2, …, a − 1 + K/2]
    A    = Σ_d lgamma(a_d) − a_d log b_d − ½ Σ_{k,d} log κ_{kd} + (KD/2) log2π
    P    = D + 2KD + D
    s_k(x) = [−½x², 0…x…0, 0…−½·1…0, ½·1]

JointIsotropicNormalGamma (shared scalar precision λ):
    T(θ) = [λ, λμ_1, …, λμ_K, λ‖μ_1‖², …, λ‖μ_K‖², log λ]
    η    = [−(b + ½Σ_k κ_k‖m_k‖²), κ_1m_1, …, −κ_1/2, …, a − 1 + KD/2]
    A    = lgamma(a) − a log b − (D/2) Σ_k log κ_k + (KD/2) log 2π
    P    = 1 + KD + K + 1
    s_k(x) = [−½‖x‖², 0…x…0, 0…−½…0, D/2]
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
from jax.scipy.special import gammaln, multigammaln

from beer_tpu.dists.basedist import ExpFamily, logdet_pd, unvec, vec

LOG_2PI = math.log(2.0 * math.pi)


@dataclasses.dataclass(frozen=True)
class JointNormalWishart(ExpFamily):
    dim: int
    ncomp: int

    @property
    def nat_dim(self) -> int:
        d, k = self.dim, self.ncomp
        return d * d + k * d + k + 1

    def to_nat(self, means, scales, scale_matrix, dof) -> jnp.ndarray:
        """means (..., K, D), scales κ (..., K), W (..., D, D), ν."""
        means = jnp.asarray(means)
        d, k = self.dim, self.ncomp
        scales = jnp.broadcast_to(jnp.asarray(scales, means.dtype), means.shape[:-1])
        dof = jnp.asarray(dof, means.dtype)
        w_inv = jnp.linalg.inv(scale_matrix)
        mmt = jnp.einsum("...ki,...kj->...ij", scales[..., None] * means, means)
        eta1 = vec(-0.5 * (w_inv + mmt))
        eta2 = (scales[..., None] * means).reshape(*means.shape[:-2], k * d)
        eta3 = -0.5 * scales
        eta4 = 0.5 * (dof - d - 1.0 + k)
        eta4 = jnp.broadcast_to(eta4, eta3.shape[:-1])[..., None]
        return jnp.concatenate([eta1, eta2, eta3, eta4], axis=-1)

    def _split(self, nat: jnp.ndarray):
        d, k = self.dim, self.ncomp
        eta1 = unvec(nat[..., : d * d], d)
        eta2 = nat[..., d * d : d * d + k * d].reshape(*nat.shape[:-1], k, d)
        eta3 = nat[..., d * d + k * d : d * d + k * d + k]
        eta4 = nat[..., -1]
        return eta1, eta2, eta3, eta4

    def to_std(self, nat: jnp.ndarray):
        """Returns (means, κs, W, ν)."""
        d, k = self.dim, self.ncomp
        eta1, eta2, eta3, eta4 = self._split(nat)
        scales = -2.0 * eta3
        means = eta2 / scales[..., None]
        dof = 2.0 * eta4 + d + 1.0 - k
        mmt = jnp.einsum("...ki,...kj->...ij", scales[..., None] * means, means)
        w_inv = -2.0 * eta1 - mmt
        return means, scales, jnp.linalg.inv(w_inv), dof

    def log_norm(self, nat: jnp.ndarray) -> jnp.ndarray:
        d, k = self.dim, self.ncomp
        eta1, eta2, eta3, eta4 = self._split(nat)
        scales = -2.0 * eta3
        means = eta2 / scales[..., None]
        dof = 2.0 * eta4 + d + 1.0 - k
        mmt = jnp.einsum("...ki,...kj->...ij", scales[..., None] * means, means)
        w_inv = -2.0 * eta1 - mmt
        return (
            -0.5 * dof * logdet_pd(w_inv)
            + 0.5 * dof * d * jnp.log(2.0)
            + multigammaln(0.5 * dof, d)
            - 0.5 * d * jnp.log(scales).sum(-1)
            + 0.5 * k * d * LOG_2PI
        )


@dataclasses.dataclass(frozen=True)
class JointNormalGamma(ExpFamily):
    dim: int
    ncomp: int

    @property
    def nat_dim(self) -> int:
        d, k = self.dim, self.ncomp
        return 2 * d + 2 * k * d

    def to_nat(self, means, scales, shape, rate) -> jnp.ndarray:
        """means (..., K, D), κ (..., K, D), a (..., D), b (..., D)."""
        means = jnp.asarray(means)
        d, k = self.dim, self.ncomp
        scales = jnp.broadcast_to(jnp.asarray(scales, means.dtype), means.shape)
        shape = jnp.asarray(shape, means.dtype)
        rate = jnp.asarray(rate, means.dtype)
        eta1 = -(rate + 0.5 * (scales * means**2).sum(-2))
        eta2 = (scales * means).reshape(*means.shape[:-2], k * d)
        eta3 = (-0.5 * scales).reshape(*means.shape[:-2], k * d)
        eta4 = shape - 1.0 + 0.5 * k
        eta4 = jnp.broadcast_to(eta4, eta1.shape)
        return jnp.concatenate([eta1, eta2, eta3, eta4], axis=-1)

    def _split(self, nat: jnp.ndarray):
        d, k = self.dim, self.ncomp
        eta1 = nat[..., :d]
        eta2 = nat[..., d : d + k * d].reshape(*nat.shape[:-1], k, d)
        eta3 = nat[..., d + k * d : d + 2 * k * d].reshape(*nat.shape[:-1], k, d)
        eta4 = nat[..., d + 2 * k * d :]
        return eta1, eta2, eta3, eta4

    def to_std(self, nat: jnp.ndarray):
        eta1, eta2, eta3, eta4 = self._split(nat)
        scales = -2.0 * eta3
        means = eta2 / scales
        shape = eta4 + 1.0 - 0.5 * self.ncomp
        rate = -eta1 - 0.5 * (scales * means**2).sum(-2)
        return means, scales, shape, rate

    def log_norm(self, nat: jnp.ndarray) -> jnp.ndarray:
        eta1, eta2, eta3, eta4 = self._split(nat)
        scales = -2.0 * eta3
        means = eta2 / scales
        shape = eta4 + 1.0 - 0.5 * self.ncomp
        rate = -eta1 - 0.5 * (scales * means**2).sum(-2)
        return (
            (gammaln(shape) - shape * jnp.log(rate)).sum(-1)
            - 0.5 * jnp.log(scales).sum((-1, -2))
            + 0.5 * self.ncomp * self.dim * LOG_2PI
        )


@dataclasses.dataclass(frozen=True)
class JointIsotropicNormalGamma(ExpFamily):
    dim: int
    ncomp: int

    @property
    def nat_dim(self) -> int:
        d, k = self.dim, self.ncomp
        return 1 + k * d + k + 1

    def to_nat(self, means, scales, shape, rate) -> jnp.ndarray:
        """means (..., K, D), κ (..., K), a, b scalars."""
        means = jnp.asarray(means)
        d, k = self.dim, self.ncomp
        scales = jnp.broadcast_to(jnp.asarray(scales, means.dtype), means.shape[:-1])
        shape = jnp.asarray(shape, means.dtype)
        rate = jnp.asarray(rate, means.dtype)
        eta1 = -(rate + 0.5 * (scales * (means**2).sum(-1)).sum(-1))
        eta2 = (scales[..., None] * means).reshape(*means.shape[:-2], k * d)
        eta3 = -0.5 * scales
        eta4 = shape - 1.0 + 0.5 * k * d
        return jnp.concatenate(
            [eta1[..., None], eta2, eta3, jnp.broadcast_to(eta4, eta1.shape)[..., None]],
            axis=-1,
        )

    def _split(self, nat: jnp.ndarray):
        d, k = self.dim, self.ncomp
        eta1 = nat[..., 0]
        eta2 = nat[..., 1 : 1 + k * d].reshape(*nat.shape[:-1], k, d)
        eta3 = nat[..., 1 + k * d : 1 + k * d + k]
        eta4 = nat[..., -1]
        return eta1, eta2, eta3, eta4

    def to_std(self, nat: jnp.ndarray):
        eta1, eta2, eta3, eta4 = self._split(nat)
        scales = -2.0 * eta3
        means = eta2 / scales[..., None]
        shape = eta4 + 1.0 - 0.5 * self.ncomp * self.dim
        rate = -eta1 - 0.5 * (scales * (means**2).sum(-1)).sum(-1)
        return means, scales, shape, rate

    def log_norm(self, nat: jnp.ndarray) -> jnp.ndarray:
        means, scales, shape, rate = self.to_std(nat)
        del means
        return (
            gammaln(shape)
            - shape * jnp.log(rate)
            - 0.5 * self.dim * jnp.log(scales).sum(-1)
            + 0.5 * self.ncomp * self.dim * LOG_2PI
        )
