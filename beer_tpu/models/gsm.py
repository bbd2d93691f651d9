"""Generalized Subspace Model (GSM) — subspace-HMM / H-SHMM.

Reference parity: ``beer/models/gsm.py`` (GSM, AffineTransform,
HierarchicalGSM) — the SHMM (Interspeech'19) / H-SHMM (ICASSP'21) models:
each acoustic unit u gets a low-dimensional embedding e_u whose affine
image η(e_u) = W·e_u + b parameterizes the unit's emission natural
parameters; embeddings and subspace basis are trained by
reparameterization-trick gradient ascent on the ELBO

    Σ_u E_q[⟨s_u, η(e_u)⟩ − counts_u · A_x(η(e_u))]
        − KL(q(e)‖p(e)) − KL(q(W,b)‖p(W,b))

where s_u are the accumulated per-unit sufficient statistics from
phone-loop E-steps (SURVEY.md §3.5) and A_x is the *likelihood*
log-normalizer.  This composes with the conjugate machinery: the subspace
consumes exactly the statistics pytrees the HMM E-step accumulates.

Here the unit emissions are diagonal Normals; η(e) maps to their natural
parameters through a link that keeps precisions positive:
η_d = [−½λ, λμ] with λ = softplus(raw). q(e_u) and q(vec W, b) are
diagonal Normals trained with optax (the reference's Adam path).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

LOG_2PI = math.log(2.0 * math.pi)


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


@struct.dataclass
class GSM:
    """Subspace over per-unit diagonal-Normal emission parameters.

    Variational parameters (all trained by gradient):
      * ``e_mean, e_logvar``   (U, E)  — q(e_u)
      * ``w_mean, w_logvar``   (E+1, 2D) — q of the affine map (incl. bias
        row) producing [μ_raw (D), λ_raw (D)] per unit.
    """

    e_mean: jnp.ndarray
    e_logvar: jnp.ndarray
    w_mean: jnp.ndarray
    w_logvar: jnp.ndarray
    n_units: int = struct.field(pytree_node=False, default=1)
    embed_dim: int = struct.field(pytree_node=False, default=2)
    obs_dim: int = struct.field(pytree_node=False, default=1)
    states_per_unit: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(
        cls,
        n_units: int,
        embed_dim: int,
        obs_dim: int,
        states_per_unit: int = 1,
        key: Optional[jax.Array] = None,
        dtype=jnp.float32,
    ) -> "GSM":
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        out = 2 * obs_dim * states_per_unit
        return cls(
            e_mean=0.1 * jax.random.normal(k1, (n_units, embed_dim), dtype),
            e_logvar=jnp.full((n_units, embed_dim), -2.0, dtype),
            w_mean=0.1 * jax.random.normal(k2, (embed_dim + 1, out), dtype),
            w_logvar=jnp.full((embed_dim + 1, out), -4.0, dtype),
            n_units=n_units,
            embed_dim=embed_dim,
            obs_dim=obs_dim,
            states_per_unit=states_per_unit,
        )

    # ------------------------------------------------------------------
    def _sample_params(self, key, nsamples: int):
        k_e, k_w = jax.random.split(key)
        eps_e = jax.random.normal(
            k_e, (nsamples,) + self.e_mean.shape, self.e_mean.dtype
        )
        eps_w = jax.random.normal(
            k_w, (nsamples,) + self.w_mean.shape, self.w_mean.dtype
        )
        e = self.e_mean[None] + jnp.exp(0.5 * self.e_logvar)[None] * eps_e
        w = self.w_mean[None] + jnp.exp(0.5 * self.w_logvar)[None] * eps_w
        return e, w

    def unit_params(self, e: jnp.ndarray, w: jnp.ndarray):
        """Affine map + link: embeddings → μ, λ of every unit state.

        Returns (μ, λ) with shape (..., U, P_states, D) — the subspace
        generates *all* emission parameters of each unit's HMM from the
        unit embedding, as in the SHMM papers; P_states=1 degenerates to
        one Normal per unit.
        """
        ones = jnp.ones(e.shape[:-1] + (1,), e.dtype)
        raw = jnp.concatenate([e, ones], axis=-1) @ w
        raw = raw.reshape(
            raw.shape[:-1] + (self.states_per_unit, 2 * self.obs_dim)
        )
        mu = raw[..., : self.obs_dim]
        lam = _softplus(raw[..., self.obs_dim :]) + 1e-4
        return mu, lam

    # ------------------------------------------------------------------
    def expected_llh_of_stats(
        self, unit_stats: jnp.ndarray, unit_counts: jnp.ndarray,
        key: jax.Array, nsamples: int = 4,
    ) -> jnp.ndarray:
        """Monte-Carlo E_q[Σ_u ⟨s_u, η(e_u)⟩ − c_u A_x(η(e_u))].

        ``unit_stats`` (U, P_states, 4D) (or (U, 4D) when P_states=1) are
        accumulated diagonal-Normal statistics in the standard layout
        [−½Σx², Σx, −½c, ½c]; ``unit_counts`` matches its leading shape.
        """
        if unit_stats.ndim == 2:
            unit_stats = unit_stats[:, None, :]
            unit_counts = unit_counts[:, None]
        e, w = self._sample_params(key, nsamples)
        mu, lam = self.unit_params(e, w)  # (S, U, P, D)
        d = self.obs_dim
        s_sq = unit_stats[..., :d]        # Σ −½x² per dim
        s_x = unit_stats[..., d : 2 * d]  # Σ x per dim
        # ⟨s, T(θ)⟩ with T = [λ, λμ, λμ², log λ] and A_x folded in:
        # Σ_t log N(x_t|μ,λ⁻¹) = −½λΣx² + λμΣx − c(½λμ² − ½logλ + ½log2π)
        ll = (
            (s_sq * lam).sum(-1)
            + (s_x * (lam * mu)).sum(-1)
            - unit_counts[None] * (
                0.5 * (lam * mu**2) - 0.5 * jnp.log(lam) + 0.5 * LOG_2PI
            ).sum(-1)
        )
        return ll.sum(tuple(range(1, ll.ndim))).mean()  # sum units+states, MC avg

    def kl_div_posterior_prior(self) -> jnp.ndarray:
        """KL of q(e) and q(W) vs standard-Normal priors (diagonal)."""

        def kl_diag(mean, logvar):
            return 0.5 * (jnp.exp(logvar) + mean**2 - 1.0 - logvar).sum()

        return kl_diag(self.e_mean, self.e_logvar) + kl_diag(
            self.w_mean, self.w_logvar
        )

    def elbo(self, unit_stats, unit_counts, key, nsamples: int = 4):
        return (
            self.expected_llh_of_stats(unit_stats, unit_counts, key, nsamples)
            - self.kl_div_posterior_prior()
        )

    # ------------------------------------------------------------------
    def emission_expectations(self):
        """Posterior-mean unit emissions (μ, λ) for plugging into decoding."""
        mu, lam = self.unit_params(self.e_mean, self.w_mean)
        return mu, lam


@struct.dataclass
class HierarchicalGSM(GSM):
    """H-SHMM: per-language embeddings entering the shared affine map.

    η(e_u, l_{g(u)}) = W·[e_u; l_{g(u)}; 1] — each unit u belongs to a
    language g(u); the language embedding shifts all of that language's
    units in parameter space while the subspace W is shared across
    languages (ICASSP'21 H-SHMM: multilingual AUD with a universal
    phonetic subspace).
    """

    lang_mean: jnp.ndarray = struct.field(default=None)     # (L, lang_dim)
    lang_logvar: jnp.ndarray = struct.field(default=None)
    # static unit→language map (tuple: hashable, not a differentiable leaf)
    unit_lang: tuple = struct.field(pytree_node=False, default=())
    lang_dim: int = struct.field(pytree_node=False, default=2)
    n_langs: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(
        cls,
        n_units: int,
        embed_dim: int,
        obs_dim: int,
        lang_dim: int = 2,
        n_langs: int = 1,
        unit_lang=None,
        states_per_unit: int = 1,
        key: Optional[jax.Array] = None,
        dtype=jnp.float32,
    ) -> "HierarchicalGSM":
        """``unit_lang`` maps each unit to its language (default: all 0)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        out = 2 * obs_dim * states_per_unit
        if unit_lang is None:
            unit_lang = (0,) * n_units
        return cls(
            e_mean=0.1 * jax.random.normal(k1, (n_units, embed_dim), dtype),
            e_logvar=jnp.full((n_units, embed_dim), -2.0, dtype),
            w_mean=0.1
            * jax.random.normal(k2, (embed_dim + lang_dim + 1, out), dtype),
            w_logvar=jnp.full((embed_dim + lang_dim + 1, out), -4.0, dtype),
            lang_mean=0.1 * jax.random.normal(k3, (n_langs, lang_dim), dtype),
            lang_logvar=jnp.full((n_langs, lang_dim), -2.0, dtype),
            unit_lang=tuple(int(u) for u in unit_lang),
            n_units=n_units,
            embed_dim=embed_dim,
            obs_dim=obs_dim,
            states_per_unit=states_per_unit,
            lang_dim=lang_dim,
            n_langs=n_langs,
        )

    def _sample_params(self, key, nsamples: int):
        k_e, k_w, k_l = jax.random.split(key, 3)
        eps_e = jax.random.normal(
            k_e, (nsamples,) + self.e_mean.shape, self.e_mean.dtype
        )
        eps_w = jax.random.normal(
            k_w, (nsamples,) + self.w_mean.shape, self.w_mean.dtype
        )
        eps_l = jax.random.normal(
            k_l, (nsamples,) + self.lang_mean.shape, self.lang_mean.dtype
        )
        e = self.e_mean[None] + jnp.exp(0.5 * self.e_logvar)[None] * eps_e
        w = self.w_mean[None] + jnp.exp(0.5 * self.w_logvar)[None] * eps_w
        lang = self.lang_mean[None] + jnp.exp(0.5 * self.lang_logvar)[None] * eps_l
        # each unit gets its own language's embedding
        idx = jnp.asarray(self.unit_lang, jnp.int32)
        lang_per_unit = lang[:, idx, :]              # (S, U, lang_dim)
        return jnp.concatenate([e, lang_per_unit], axis=-1), w

    def kl_div_posterior_prior(self) -> jnp.ndarray:
        def kl_diag(mean, logvar):
            return 0.5 * (jnp.exp(logvar) + mean**2 - 1.0 - logvar).sum()

        return (
            super().kl_div_posterior_prior()
            + kl_diag(self.lang_mean, self.lang_logvar)
        )


def make_gsm_train_step(tx, nsamples: int = 4):
    """Jitted gradient step on the GSM ELBO given accumulated unit stats."""

    def step(gsm, opt_state, unit_stats, unit_counts, key):
        def loss_fn(g):
            return -g.elbo(unit_stats, unit_counts, key, nsamples)

        loss, grads = jax.value_and_grad(loss_fn)(gsm)
        updates, opt_state = tx.update(grads, opt_state, gsm)
        import optax

        gsm = optax.apply_updates(gsm, updates)
        return -loss, gsm, opt_state

    return jax.jit(step)


# ----------------------------------------------------------------------
# Phone-loop bridge (SHMM training loop, SURVEY §3.5)
# ----------------------------------------------------------------------
def accumulate_unit_stats(loop, data, mask=None):
    """Per-unit-state diagonal statistics from a phone-loop E-step.

    Returns (stats (U, P, 4D), counts (U, P)) in the layout
    :meth:`GSM.expected_llh_of_stats` consumes — the "phone-loop E-steps
    feed the subspace" link of the SHMM recipes.
    """
    from beer_tpu.dists import normallik

    stats = loop.sufficient_statistics(data)
    _, cache = loop.infer(stats, mask=mask)
    post = cache["posteriors"]                      # (B, T, S)
    x = data if data.ndim == 3 else data[None]
    d = x.shape[-1]
    diag_stats = normallik.suff_stats_diag(x).reshape(-1, 4 * d)
    flat_post = post.reshape(-1, post.shape[-1])
    acc = jnp.einsum(
        "ts,tp->sp", flat_post, diag_stats,
        precision=jax.lax.Precision.HIGHEST,
    )
    counts = flat_post.sum(0)
    u, p = loop.n_units, loop.states_per_unit
    return acc.reshape(u, p, 4 * d), counts.reshape(u, p)


def apply_to_phoneloop(gsm, loop, confidence: float = 1e4):
    """Write the subspace's emission parameters back into a phone loop.

    The emissions become sharply-peaked NormalGamma posteriors whose
    expectations match the subspace point estimates (E[λ] = λ(e_u),
    mean = μ(e_u)), so subsequent phone-loop E-steps / decoding use the
    subspace-constrained parameters (the SHMM alternation).
    """
    mu, lam = gsm.emission_expectations()           # (U, P, D)
    d = gsm.obs_dim
    flat_mu = mu.reshape(-1, d)
    flat_lam = lam.reshape(-1, d)
    fam = loop.modelset.means_precisions.family
    nat = fam.to_nat(
        flat_mu,
        jnp.full_like(flat_mu, confidence),
        jnp.full_like(flat_mu, confidence),
        confidence / flat_lam,
    )
    param = loop.modelset.means_precisions.replace(posterior=nat)
    return loop.replace(modelset=loop.modelset.replace(means_precisions=param))
