"""Categorical with Dirichlet prior and stick-breaking (truncated-DP) variant.

Reference parity: ``beer/models/categorical.py`` (Categorical,
SBCategorical, SBCategoricalHyperPrior).  The SBCategorical is the prior
over acoustic units in phone-loop AUD: a truncated stick-breaking process
v_i ~ Beta(1, γ), π_i = v_i Π_{j<i}(1−v_j), whose conjugate posterior
update takes per-unit occupancy counts and their reversed cumulative sums.

Both classes expose the small "weight model" protocol Mixture / PhoneLoop
consume: ``expected_log_weights()``, ``accumulate_counts(counts)``,
``vb_update(acc)``, ``kl_div_posterior_prior()``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from beer_tpu import dists
from beer_tpu.models.basemodel import Model
from beer_tpu.models.parameters import BayesianParameter


@struct.dataclass
class Categorical(Model):
    """Categorical likelihood with a Dirichlet prior over the weights."""

    weights: BayesianParameter
    ncat: int = struct.field(pytree_node=False, default=2)

    @classmethod
    def create(cls, ncat: int, prior_strength: float = 1.0, dtype=jnp.float32):
        fam = dists.Dirichlet(dim=ncat)
        nat = fam.to_nat(jnp.full(ncat, prior_strength, dtype))
        param = BayesianParameter(prior=nat, posterior=nat, family=fam)
        return cls(weights=param, ncat=ncat)

    # -- weight-model protocol -----------------------------------------
    def expected_log_weights(self) -> jnp.ndarray:
        """E[log π], shape (K,)."""
        return self.weights.expected_sufficient_statistics()

    def accumulate_counts(self, counts: jnp.ndarray) -> Dict[str, Any]:
        return {"weights": counts}

    # -- Model API -------------------------------------------------------
    def sufficient_statistics(self, data: jnp.ndarray) -> jnp.ndarray:
        """Integer class ids (T,) → one-hot (T, K)."""
        if data.ndim >= 1 and jnp.issubdtype(data.dtype, jnp.integer):
            return jax.nn.one_hot(data, self.ncat)
        return data

    def infer(self, stats: jnp.ndarray):
        llh = stats @ self.expected_log_weights()
        return llh, {"counts": stats.sum(0)}

    def accumulate(self, stats: jnp.ndarray, cache=None) -> Dict[str, Any]:
        counts = cache["counts"] if cache else stats.sum(0)
        return self.accumulate_counts(counts)

    def kl_div_posterior_prior(self) -> jnp.ndarray:
        return self.weights.kl_div_posterior_prior()

    def vb_update(self, acc: Dict[str, Any], lrate: float = 1.0) -> "Categorical":
        return self.replace(weights=self.weights.natural_update(acc["weights"], lrate))

    def mean(self) -> jnp.ndarray:
        """Posterior expected weights."""
        alpha = self.weights.family.to_std(self.weights.posterior)
        return alpha / alpha.sum(-1, keepdims=True)


@struct.dataclass
class SBCategorical(Model):
    """Truncated stick-breaking (Dirichlet-process) categorical.

    ``sticks`` holds K−1 Beta posteriors as a batched 2-dim Dirichlet
    parameter of shape (K−1, 2).  Weight k uses sticks 0..k:
    E[log π_k] = E[log v_k] + Σ_{j<k} E[log(1−v_j)]   (v_{K−1} ≡ 1).
    """

    sticks: BayesianParameter
    truncation: int = struct.field(pytree_node=False, default=2)

    @classmethod
    def create(cls, truncation: int, concentration: float = 1.0, dtype=jnp.float32):
        fam = dists.Beta()
        alpha = jnp.stack(
            [
                jnp.ones(truncation - 1, dtype),
                jnp.full(truncation - 1, concentration, dtype),
            ],
            axis=-1,
        )
        nat = fam.to_nat(alpha)
        param = BayesianParameter(prior=nat, posterior=nat, family=fam)
        return cls(sticks=param, truncation=truncation)

    # -- weight-model protocol -----------------------------------------
    def expected_log_weights(self) -> jnp.ndarray:
        e = self.sticks.expected_sufficient_statistics()  # (K-1, 2)
        e_log_v, e_log_1mv = e[..., 0], e[..., 1]
        tail = jnp.concatenate([jnp.zeros_like(e_log_1mv[:1]), jnp.cumsum(e_log_1mv)])
        head = jnp.concatenate([e_log_v, jnp.zeros_like(e_log_v[:1])])
        return head + tail

    def accumulate_counts(self, counts: jnp.ndarray) -> Dict[str, Any]:
        """counts (K,) → per-stick Beta statistics (K−1, 2).

        Stick i sees [c_i, Σ_{j>i} c_j] — its own occupancy vs everything
        broken off after it.
        """
        rev_tail = jnp.cumsum(counts[::-1])[::-1]  # tail sums including self
        stick_stats = jnp.stack([counts[:-1], rev_tail[1:]], axis=-1)
        return {"sticks": stick_stats}

    # -- Model API -------------------------------------------------------
    def sufficient_statistics(self, data: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.one_hot(data, self.truncation)

    def infer(self, stats: jnp.ndarray):
        llh = stats @ self.expected_log_weights()
        return llh, {"counts": stats.sum(0)}

    def accumulate(self, stats: jnp.ndarray, cache=None) -> Dict[str, Any]:
        counts = cache["counts"] if cache else stats.sum(0)
        return self.accumulate_counts(counts)

    def kl_div_posterior_prior(self) -> jnp.ndarray:
        return self.sticks.kl_div_posterior_prior()

    def vb_update(self, acc: Dict[str, Any], lrate: float = 1.0) -> "SBCategorical":
        return self.replace(sticks=self.sticks.natural_update(acc["sticks"], lrate))

    def mean(self) -> jnp.ndarray:
        alpha = self.sticks.family.to_std(self.sticks.posterior)  # (K-1, 2)
        e_v = alpha[..., 0] / alpha.sum(-1)
        rest = jnp.concatenate([jnp.ones_like(e_v[:1]), jnp.cumprod(1.0 - e_v)])
        return jnp.concatenate([e_v, jnp.ones_like(e_v[:1])]) * rest

