"""Neural building blocks for VAE / subspace models.

Reference parity: ``beer/nnet/`` — MLP builders and ``ProbabilisticLayer``
output heads (NormalDiagonalCovarianceLayer, BernoulliLayer) — rebuilt on
flax.linen.  Distribution heads return *parameter pytrees*; sampling /
log-likelihood / entropy are pure functions of those parameters, so the
whole VAE step jits as one program.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

LOG_2PI = math.log(2.0 * math.pi)


class MLP(nn.Module):
    """Plain MLP trunk: ``hidden`` sizes with ``activation`` between."""

    hidden: Sequence[int]
    activation: Callable = nn.tanh

    @nn.compact
    def __call__(self, x):
        for size in self.hidden:
            x = self.activation(nn.Dense(size)(x))
        return x


class NormalDiagLayer(nn.Module):
    """Probabilistic head: diagonal Normal (mean, log-variance)."""

    dim: int

    @nn.compact
    def __call__(self, h):
        mean = nn.Dense(self.dim)(h)
        logvar = nn.Dense(self.dim)(h)
        return {"mean": mean, "logvar": jnp.clip(logvar, -10.0, 10.0)}


class BernoulliLayer(nn.Module):
    """Probabilistic head: independent Bernoullis (logits)."""

    dim: int

    @nn.compact
    def __call__(self, h):
        return {"logits": nn.Dense(self.dim)(h)}


# ----------------------------------------------------------------------
# Distribution functions over head outputs (pure)
# ----------------------------------------------------------------------
def normal_rsample(params, key, nsamples: int = 1):
    """Reparameterized samples, (nsamples, ..., dim)."""
    mean, logvar = params["mean"], params["logvar"]
    eps = jax.random.normal(key, (nsamples,) + mean.shape, mean.dtype)
    return mean[None] + jnp.exp(0.5 * logvar)[None] * eps


def normal_log_likelihood(params, x):
    """log N(x | mean, diag(exp(logvar))) summed over the last axis."""
    mean, logvar = params["mean"], params["logvar"]
    return -0.5 * (
        ((x - mean) ** 2) * jnp.exp(-logvar) + logvar + LOG_2PI
    ).sum(-1)


def normal_entropy(params):
    """Entropy of the diagonal Normal, summed over the last axis."""
    logvar = params["logvar"]
    return 0.5 * (logvar + 1.0 + LOG_2PI).sum(-1)


def bernoulli_log_likelihood(params, x):
    logits = params["logits"]
    return -(jnp.maximum(logits, 0) - logits * x
             + jnp.log1p(jnp.exp(-jnp.abs(logits)))).sum(-1)
