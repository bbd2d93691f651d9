"""Bayesian HMM.

Reference parity: ``beer/models/hmm.py`` (HMM, HMM.create(graph,
modelset), forward-backward E-step, ``decode``/best_path Viterbi) — see
SURVEY.md §3.2 for the reference call stack.  The E-step here is the
batched scan of :mod:`beer_tpu.ops.semiring_scan` (whole padded batch in
one XLA program) instead of a per-utterance Python loop.

As in the reference, transition probabilities are fixed by the compiled
graph; Bayesian treatment of the *unit* transitions of a phone loop is
layered on by :class:`beer_tpu.models.phoneloop.PhoneLoop`.

Conventions: data (B, T, D) + mask (B, T); single sequences (T, D) are
auto-promoted.  ``infer`` returns per-*sequence* expected
log-likelihoods (the forward log-normalizer), matching the reference's
``datasize`` = number of utterances convention.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from beer_tpu.models.basemodel import DiscreteLatentModel
from beer_tpu.models.graph import CompiledGraph, Graph
from beer_tpu.ops import semiring_scan


def _promote(x: jnp.ndarray) -> jnp.ndarray:
    return x[None] if x.ndim == 2 else x


@struct.dataclass
class HMM(DiscreteLatentModel):
    """HMM with any ModelSet as tied-state emissions."""

    graph: CompiledGraph
    modelset: Any

    @classmethod
    def create(cls, graph, modelset) -> "HMM":
        if isinstance(graph, Graph):
            graph = graph.compile()
        return cls(graph=graph, modelset=modelset)

    # ------------------------------------------------------------------
    def sufficient_statistics(self, data: jnp.ndarray) -> jnp.ndarray:
        return self.modelset.sufficient_statistics(_promote(data))

    def _state_llh(self, stats: jnp.ndarray) -> jnp.ndarray:
        per_pdf = self.modelset.expected_log_likelihood(stats)  # (B, T, n_pdfs)
        return self.graph.expand_llh(per_pdf)

    def infer(self, stats: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        llh_states = self._state_llh(stats)
        fb = semiring_scan.forward_backward(
            llh_states,
            self.graph.log_trans,
            self.graph.log_init,
            self.graph.log_final,
            mask,
        )
        log_z = fb.log_z
        if mask is not None:
            # fully-padded utterances (minibatch tail padding) contribute 0
            log_z = log_z * (mask.sum(-1) > 0)
        return log_z, {
            "posteriors": fb.posteriors,
            "fb": fb,
            "llh_states": llh_states,
            "mask": mask,
        }

    def accumulate(self, stats: jnp.ndarray, cache: Dict[str, Any]) -> Dict[str, Any]:
        post = cache["posteriors"]  # (B, T, S)
        # state → pdf posteriors (states sharing a pdf sum together)
        one_hot = jax.nn.one_hot(self.graph.pdf_ids, self.graph.n_pdfs, dtype=post.dtype)
        if one_hot.ndim == 3:  # per-utterance graphs: (B, S, n_pdfs)
            pdf_post = jnp.einsum("bts,bsp->btp", post, one_hot)
        else:
            pdf_post = post @ one_hot  # (B, T, n_pdfs)
        flat_resps = pdf_post.reshape(-1, self.graph.n_pdfs)
        flat_stats = stats.reshape((-1,) + stats.shape[2:])
        return {"modelset": self.modelset.accumulate(flat_stats, flat_resps)}

    def kl_div_posterior_prior(self) -> jnp.ndarray:
        return self.modelset.kl_div_posterior_prior()

    def vb_update(self, acc: Dict[str, Any], lrate: float = 1.0) -> "HMM":
        return self.replace(modelset=self.modelset.vb_update(acc["modelset"], lrate))

    # ------------------------------------------------------------------
    def expected_transition_counts(self, cache: Dict[str, Any]) -> jnp.ndarray:
        """E[#transitions i→j] summed over the batch, (S, S)."""
        fb = cache["fb"]
        return semiring_scan.expected_transition_counts(
            fb.log_alpha, fb.log_beta, cache["llh_states"],
            self.graph.log_trans, fb.log_z, cache["mask"],
        )

    def decode(self, data: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        """Viterbi best state path; returns (paths (B, T), scores (B,))."""
        stats = self.sufficient_statistics(data)
        llh_states = self._state_llh(stats)
        return semiring_scan.viterbi(
            llh_states,
            self.graph.log_trans,
            self.graph.log_init,
            self.graph.log_final,
            mask,
        )
