"""(Structured) Variational Autoencoder.

Reference parity: ``beer/models/vae.py`` — encoder nnet →
ProbabilisticLayer posterior → reparameterized samples; **the prior over
latents is any beer model** (Normal → plain VAE, GMM/HMM → structured
SVAE); decoder nnet → data likelihood.  The ELBO mixes Monte-Carlo terms
(reconstruction, q-entropy) with the latent model's analytic expected
log-likelihood and conjugate KL terms, and one training step feeds BOTH
the optax gradient update of the nnet parameters AND the conjugate
natural-parameter update of the latent model (SURVEY.md §3.4 — the
hybrid ``VBOptimizer`` named in BASELINE config 5).

Functional layout: module *definitions* are static fields; their
parameters live in the ``nnet_params`` pytree so ``jax.grad`` sees them
while the conjugate latent model updates in closed form.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn
from flax import struct

from beer_tpu import nnet
from beer_tpu.models.basemodel import Model


class _Encoder(fnn.Module):
    """MLP trunk + diagonal-Normal head (module-level: picklable)."""

    hidden: tuple
    latent_dim: int

    @fnn.compact
    def __call__(self, x):
        h = nnet.MLP(self.hidden)(x)
        return nnet.NormalDiagLayer(self.latent_dim)(h)


class _Decoder(fnn.Module):
    hidden: tuple
    obs_dim: int
    output: str = "normal"

    @fnn.compact
    def __call__(self, z):
        h = nnet.MLP(self.hidden)(z)
        if self.output == "normal":
            return nnet.NormalDiagLayer(self.obs_dim)(h)
        return nnet.BernoulliLayer(self.obs_dim)(h)


@struct.dataclass
class VAE(Model):
    nnet_params: Any                       # {"encoder": ..., "decoder": ...}
    latent_model: Any                      # beer model prior over z
    encoder_def: Any = struct.field(pytree_node=False, default=None)
    decoder_def: Any = struct.field(pytree_node=False, default=None)
    latent_dim: int = struct.field(pytree_node=False, default=2)
    nsamples: int = struct.field(pytree_node=False, default=1)

    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        obs_dim: int,
        latent_dim: int,
        latent_model,
        hidden=(128, 128),
        nsamples: int = 1,
        output: str = "normal",
        key: Optional[jax.Array] = None,
    ) -> "VAE":
        """Encoder/decoder MLPs with Normal (or Bernoulli) output heads."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k_enc, k_dec = jax.random.split(key)
        enc = _Encoder(tuple(hidden), latent_dim)
        dec = _Decoder(tuple(hidden), obs_dim, output)
        params = {
            "encoder": enc.init(k_enc, jnp.zeros((1, obs_dim))),
            "decoder": dec.init(k_dec, jnp.zeros((1, latent_dim))),
        }
        return cls(
            nnet_params=params,
            latent_model=latent_model,
            encoder_def=enc,
            decoder_def=dec,
            latent_dim=latent_dim,
            nsamples=nsamples,
        )

    # ------------------------------------------------------------------
    def elbo_and_stats(self, x: jnp.ndarray, key: jax.Array, datasize=None):
        """Monte-Carlo ELBO + conjugate statistics of the latent model.

        ELBO = E_q[log p(x|z)] + E_q[E_θ log p(z|θ)] + H(q(z|x))
               − KL(q(θ)‖p(θ))        (θ = latent-model parameters)
        """
        n = x.shape[0]
        scale = 1.0 if datasize is None else datasize / n
        q = self.encoder_def.apply(self.nnet_params["encoder"], x)
        z = nnet.normal_rsample(q, key, self.nsamples)      # (S, N, dz)
        flat_z = z.reshape(-1, self.latent_dim)

        # prior term through the conjugate latent model
        stats = self.latent_model.sufficient_statistics(flat_z)
        prior_llh, cache = self.latent_model.infer(stats)
        prior_llh = prior_llh.reshape(self.nsamples, n).mean(0)

        # reconstruction
        out = self.decoder_def.apply(self.nnet_params["decoder"], flat_z)
        if "mean" in out:
            rec = nnet.normal_log_likelihood(out, jnp.repeat(x[None], self.nsamples, 0).reshape(-1, x.shape[-1]))
        else:
            rec = nnet.bernoulli_log_likelihood(out, jnp.repeat(x[None], self.nsamples, 0).reshape(-1, x.shape[-1]))
        rec = rec.reshape(self.nsamples, n).mean(0)

        entropy = nnet.normal_entropy(q)
        elbo = scale * (rec + prior_llh + entropy).sum() \
            - self.latent_model.kl_div_posterior_prior()

        acc = self.latent_model.accumulate(stats, cache)
        # average over MC samples (stats were computed on S*N points)
        acc = jax.tree.map(lambda s: scale * s / self.nsamples, acc)
        return elbo, acc

    # -- Model API (latent side only; see elbo_and_stats for training) --
    def sufficient_statistics(self, data: jnp.ndarray) -> jnp.ndarray:
        return data

    def infer(self, stats: jnp.ndarray):
        q = self.encoder_def.apply(self.nnet_params["encoder"], stats)
        return nnet.normal_log_likelihood(q, q["mean"]), {"posterior": q}

    def kl_div_posterior_prior(self) -> jnp.ndarray:
        return self.latent_model.kl_div_posterior_prior()

    def vb_update(self, acc: Dict[str, Any], lrate: float = 1.0) -> "VAE":
        return self.replace(latent_model=self.latent_model.vb_update(acc, lrate))

    # ------------------------------------------------------------------
    def posteriors(self, x: jnp.ndarray):
        """q(z|x) head outputs (mean, logvar)."""
        return self.encoder_def.apply(self.nnet_params["encoder"], x)


def make_vae_train_step(tx, datasize=None, lrate: float = 1.0):
    """Build the jitted hybrid step: optax on nnets + conjugate on prior.

    Returns ``step(vae, opt_state, x, key) -> (elbo, vae, opt_state)``.
    """

    def step(vae: VAE, opt_state, x, key):
        def loss_fn(nnet_params):
            elbo, acc = vae.replace(nnet_params=nnet_params).elbo_and_stats(
                x, key, datasize
            )
            return -elbo, acc

        (neg_elbo, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            vae.nnet_params
        )
        updates, opt_state = tx.update(grads, opt_state, vae.nnet_params)
        import optax

        new_params = optax.apply_updates(vae.nnet_params, updates)
        new_vae = vae.replace(
            nnet_params=new_params,
            latent_model=vae.latent_model.vb_update(acc, lrate),
        )
        return -neg_elbo, new_vae, opt_state

    return jax.jit(step)
