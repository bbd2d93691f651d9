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


class ResMLP(nn.Module):
    """Residual MLP trunk (reference ``beer/nnet`` residual builders).

    Projects to ``hidden[0]`` then applies one pre-activation residual
    block per entry of ``hidden`` (all entries must match — residual
    adds require equal widths).
    """

    hidden: Sequence[int]
    activation: Callable = nn.tanh

    @nn.compact
    def __call__(self, x):
        width = self.hidden[0]
        h = nn.Dense(width)(x)
        for size in self.hidden:
            if size != width:
                raise ValueError("ResMLP needs constant hidden widths")
            r = nn.Dense(size)(self.activation(h))
            h = h + r
        return self.activation(h)


class NormalDiagLayer(nn.Module):
    """Probabilistic head: diagonal Normal (mean, log-variance)."""

    dim: int

    @nn.compact
    def __call__(self, h):
        mean = nn.Dense(self.dim)(h)
        logvar = nn.Dense(self.dim)(h)
        return {"mean": mean, "logvar": jnp.clip(logvar, -10.0, 10.0)}


class NormalIsoLayer(nn.Module):
    """Probabilistic head: isotropic Normal (mean vector, scalar logvar),
    broadcast to the diagonal layout so the pure functions below apply."""

    dim: int

    @nn.compact
    def __call__(self, h):
        mean = nn.Dense(self.dim)(h)
        logvar = nn.Dense(1)(h)
        logvar = jnp.clip(logvar, -10.0, 10.0)
        return {"mean": mean, "logvar": jnp.broadcast_to(logvar, mean.shape)}


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


# ----------------------------------------------------------------------
# Config-string builders (reference: beer/nnet nets built from strings)
# ----------------------------------------------------------------------
_ACTIVATIONS = {"tanh": nn.tanh, "relu": nn.relu, "gelu": nn.gelu,
                "sigmoid": nn.sigmoid}
_HEADS = {"normal": "NormalDiagLayer", "normal_iso": "NormalIsoLayer",
          "bernoulli": "BernoulliLayer"}


def build_trunk(spec: str) -> nn.Module:
    """Build an MLP/ResMLP trunk from a config string.

    Format: ``"mlp:128,128[:tanh]"`` or ``"resmlp:256x3[:relu]"``
    (``WxN`` = N residual blocks of width W) — the reference builds its
    encoder/decoder nets from strings in the recipe YAML the same way.
    """
    parts = spec.split(":")
    kind = parts[0].lower()
    act = _ACTIVATIONS[parts[2].lower()] if len(parts) > 2 else nn.tanh
    sizes_str = parts[1]
    if "x" in sizes_str:
        w, n = sizes_str.split("x")
        sizes = (int(w),) * int(n)
    else:
        sizes = tuple(int(s) for s in sizes_str.split(","))
    if kind == "mlp":
        return MLP(sizes, act)
    if kind == "resmlp":
        return ResMLP(sizes, act)
    raise ValueError(f"unknown trunk kind: {kind!r} (mlp | resmlp)")


def build_head(spec: str, dim: int) -> nn.Module:
    """Build a probabilistic head: ``"normal" | "normal_iso" | "bernoulli"``."""
    try:
        cls_name = _HEADS[spec.lower()]
    except KeyError:
        raise ValueError(
            f"unknown head: {spec!r} ({' | '.join(_HEADS)})"
        ) from None
    return globals()[cls_name](dim)
