"""Normalizing-flow blocks for richer VAE posteriors.

Reference parity: ``beer/nnet`` autoregressive/flow components (SURVEY.md
§2, NNet blocks row).  Two classic, jit-friendly flows:

* :class:`PlanarFlow` — z' = z + u·tanh(wᵀz + b) (Rezende & Mohamed '15),
  with the u-constraint reparameterization that keeps the Jacobian
  positive,
* :class:`AffineAutoregressiveFlow` — a masked (MADE-style) single-layer
  IAF step: z'_d = z_d · σ(s_d(z_{<d})) + m_d(z_{<d}).

``flow_rsample`` composes them on top of a diagonal-Normal head and
returns (samples, log q(z)) with the log-det corrections accumulated —
drop-in for the VAE's posterior sampling path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from beer_tpu import nnet


class PlanarFlow(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, z):
        """Returns (z', log|det ∂z'/∂z|), batched over leading dims."""
        u = self.param("u", nn.initializers.normal(0.1), (self.dim,))
        w = self.param("w", nn.initializers.normal(0.1), (self.dim,))
        b = self.param("b", nn.initializers.zeros, ())
        # û reparameterization: wᵀû ≥ −1 keeps the flow invertible
        wu = (w * u).sum()
        m = -1.0 + jnp.logaddexp(wu, 0.0)  # m(wu) = -1 + softplus(wu)
        u_hat = u + (m - wu) * w / (w**2).sum()
        lin = z @ w + b
        z_new = z + u_hat * jnp.tanh(lin)[..., None]
        psi = (1.0 - jnp.tanh(lin) ** 2)[..., None] * w
        logdet = jnp.log(jnp.abs(1.0 + psi @ u_hat) + 1e-12)
        return z_new, logdet


class AffineAutoregressiveFlow(nn.Module):
    """One masked-affine IAF step with a small MADE conditioner."""

    dim: int
    hidden: int = 32

    @nn.compact
    def __call__(self, z):
        d = self.dim
        # MADE degrees: inputs 1..d, hidden cycled, outputs 1..d — masks
        # make every output depend only on z_{<d} (autoregressive).
        in_deg = jnp.arange(1, d + 1)
        hid_deg = (jnp.arange(self.hidden) % max(d - 1, 1)) + 1
        out_deg = jnp.arange(1, d + 1)
        m1 = (hid_deg[None, :] >= in_deg[:, None]).astype(jnp.float32)
        m2 = (out_deg[None, :] > hid_deg[:, None]).astype(jnp.float32)

        w1 = self.param("w1", nn.initializers.normal(0.1), (d, self.hidden))
        b1 = self.param("b1", nn.initializers.zeros, (self.hidden,))
        w_m = self.param("w_m", nn.initializers.normal(0.01), (self.hidden, d))
        w_s = self.param("w_s", nn.initializers.normal(0.01), (self.hidden, d))
        b_m = self.param("b_m", nn.initializers.zeros, (d,))
        b_s = self.param("b_s", nn.initializers.zeros, (d,))

        h = jnp.tanh(z @ (w1 * m1) + b1)
        shift = h @ (w_m * m2) + b_m
        log_scale = jnp.clip(h @ (w_s * m2) + b_s, -5.0, 5.0)
        z_new = z * jnp.exp(log_scale) + shift
        return z_new, log_scale.sum(-1)


class FlowStack(nn.Module):
    """Compose flows; returns (z_K, Σ log-dets)."""

    dim: int
    n_planar: int = 2
    n_iaf: int = 0

    @nn.compact
    def __call__(self, z):
        total = jnp.zeros(z.shape[:-1], z.dtype)
        for _ in range(self.n_planar):
            z, ld = PlanarFlow(self.dim)(z)
            total = total + ld
        for _ in range(self.n_iaf):
            z, ld = AffineAutoregressiveFlow(self.dim)(z)
            total = total + ld
        return z, total


def flow_rsample(flow_def, flow_params, q_params, key, nsamples: int = 1):
    """Sample z₀ ~ N(mean, var), push through the flow.

    Returns (z_K, log q(z_K)) where
    log q(z_K) = log N(z₀) − Σ log|det| — the corrected posterior density
    for ELBO entropy terms.
    """
    z0 = nnet.normal_rsample(q_params, key, nsamples)
    log_q0 = nnet.normal_log_likelihood(
        jax.tree.map(lambda a: a[None], q_params), z0
    )
    z_k, logdet = flow_def.apply(flow_params, z0)
    return z_k, log_q0 - logdet
