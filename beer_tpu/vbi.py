"""Variational-Bayes objectives and optimizers.

Reference parity: ``beer/optim.py`` / ``beer/vbi.py``
(``evidence_lower_bound``, ``VBConjugateOptimizer``, ``VBOptimizer``).

Functional core (jit these):

* :func:`elbo_and_stats`  — one E-step: ELBO value + scaled accumulated
  statistics pytree,
* :func:`vb_step`         — E-step + conjugate M-step, returns
  ``(elbo, new_model)``; the whole epoch compiles to one XLA program.

OO veneer (reference-notebook compatibility): ``evidence_lower_bound``
returns an :class:`ELBO` object with ``.backward()`` (which, unlike the
reference, is where statistics are *already* stored — there are no
autograd hooks to fire) and ``float(elbo)``; ``VBConjugateOptimizer``
holds the current model and applies steps.  The hybrid
:class:`VBOptimizer` composes the conjugate step with an optax optimizer
for non-conjugate (neural-network) parameters, reproducing the
reference's Adam+natural-gradient hybrid used by VAE/GSM (SURVEY §3.4).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------
# Functional core
# ----------------------------------------------------------------------
def elbo_and_stats(
    model,
    data: jnp.ndarray,
    datasize: Optional[int] = None,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Any]:
    """One VB E-step.

    Returns ``(elbo, acc)`` where ``acc`` is the statistics pytree (already
    scaled by ``datasize / batch_size`` for minibatch training, matching
    the reference's ``evidence_lower_bound(..., datasize=N)`` convention).
    """
    stats = model.sufficient_statistics(data)
    if mask is None:
        llh, cache = model.infer(stats)
    else:
        llh, cache = model.infer(stats, mask=mask)
    nframes = llh.size
    scale = 1.0 if datasize is None else datasize / nframes
    elbo = scale * llh.sum() - model.kl_div_posterior_prior()
    acc = model.accumulate(stats, cache)
    if datasize is not None:
        acc = jax.tree.map(lambda s: scale * s, acc)
    return elbo, acc


def vb_step(
    model,
    data: jnp.ndarray,
    datasize: Optional[int] = None,
    lrate: float = 1.0,
    mask: Optional[jnp.ndarray] = None,
):
    """E-step + conjugate M-step; returns ``(elbo, updated_model)``."""
    elbo, acc = elbo_and_stats(model, data, datasize, mask)
    return elbo, model.vb_update(acc, lrate)


def _graft(old, new, paths):
    """Return ``new`` restricted to ``paths``; everything else from ``old``.

    Paths are dataclass field names, optionally dotted for sub-models
    (``"latent_model.categorical"``), so composite models can expose their
    children's mean-field groups.
    """
    take, nested = set(), {}
    for p in paths:
        if "." in p:
            head, rest = p.split(".", 1)
            nested.setdefault(head, []).append(rest)
        else:
            take.add(p)
    repl = {}
    for name in old.__dataclass_fields__:
        if name in take:
            continue  # keep the updated value
        if name in nested:
            repl[name] = _graft(getattr(old, name), getattr(new, name), nested[name])
        else:
            repl[name] = getattr(old, name)
    return new.replace(**repl) if repl else new


def vb_update_partial(model, acc, group, lrate: float = 1.0):
    """Apply the conjugate update to the fields in ``group`` only.

    Generic over any model: runs the full update, then reverts fields
    outside the group — the building block for mean-field coordinate
    ascent over ``model.mean_field_factorization()`` groups.  Models whose
    ``vb_update`` is itself sequential coordinate ascent (PPCA/PLDA) take
    a ``group=`` kwarg so the non-group fields are *held at their current
    values inside* the update, making each group step an exact coordinate
    update; for everything else the post-hoc graft is equivalent because
    each parameter's conjugate update depends only on the statistics.
    """
    try:
        updated = model.vb_update(acc, lrate, group=group)
    except TypeError:
        updated = model.vb_update(acc, lrate)
    return _graft(model, updated, group)


def vb_step_coordinate(
    model,
    data: jnp.ndarray,
    datasize: Optional[int] = None,
    lrate: float = 1.0,
    mask: Optional[jnp.ndarray] = None,
):
    """Mean-field coordinate ascent: one E-step + update *per group*.

    The reference's ``VBConjugateOptimizer`` iterates the groups of
    ``mean_field_factorization()``, refreshing the E-step between group
    updates; :func:`vb_step` (joint update) is the common fast path —
    both are valid VB-EM, this one can climb faster per data pass at the
    cost of extra E-steps.  Returns (last elbo, updated model).
    """
    elbo = None
    for group in model.mean_field_factorization():
        elbo, acc = elbo_and_stats(model, data, datasize, mask)
        model = vb_update_partial(model, acc, group, lrate)
    return elbo, model


# ----------------------------------------------------------------------
# Reference-API veneer
# ----------------------------------------------------------------------
class ELBO:
    """Value + statistics of one evidence-lower-bound evaluation."""

    def __init__(self, value: jnp.ndarray, acc: Any):
        self.value = value
        self.acc = acc

    def backward(self) -> "ELBO":
        """No-op kept for reference-notebook compatibility.

        The reference uses ``.backward()`` to fire autograd hooks that
        harvest statistics; here they were computed explicitly during the
        forward pass and already live in ``self.acc``.
        """
        return self

    def __float__(self) -> float:
        return float(self.value)

    def __repr__(self) -> str:
        return f"ELBO({float(self.value):.6f})"


def evidence_lower_bound(
    model, data, datasize: Optional[int] = None, mask: Optional[jnp.ndarray] = None
) -> ELBO:
    """Reference-compatible entry point (``beer.evidence_lower_bound``)."""
    value, acc = elbo_and_stats(model, data, datasize, mask)
    return ELBO(value, acc)


class VBConjugateOptimizer:
    """Natural-parameter coordinate-ascent "optimizer" (reference API).

    Unlike the reference (which mutates shared parameter objects), the
    current model is held here and replaced on every step::

        optim = VBConjugateOptimizer(gmm, lrate=1.)
        for epoch in range(E):
            optim.init_step()
            elbo = beer_tpu.evidence_lower_bound(optim.model, X, datasize=N)
            elbo.backward()
            optim.step(elbo)
    """

    def __init__(self, model, lrate: float = 1.0):
        self.model = model
        self.lrate = lrate

    def init_step(self) -> None:
        """Kept for API parity; statistics are per-ELBO, nothing to zero."""

    def step(self, elbo: ELBO):
        self.model = self.model.vb_update(elbo.acc, self.lrate)
        return self.model


class VBOptimizer:
    """Hybrid optimizer: conjugate natural step + optax for nnet params.

    Used by VAE/GSM training where the model splits into conjugate
    Bayesian parameters (closed-form update) and unconstrained neural
    parameters (gradient update on the same ELBO) — the reference's
    ``VBOptimizer`` combining ``VBConjugateOptimizer`` with torch Adam.
    """

    def __init__(self, model, optax_optimizer, nnet_params, lrate: float = 1.0):
        self.model = model
        self.lrate = lrate
        self.tx = optax_optimizer
        self.nnet_params = nnet_params
        self.opt_state = optax_optimizer.init(nnet_params)

    def step(self, elbo_acc, nnet_grads):
        import optax  # deferred: optax only needed for hybrid models

        updates, self.opt_state = self.tx.update(
            nnet_grads, self.opt_state, self.nnet_params
        )
        self.nnet_params = optax.apply_updates(self.nnet_params, updates)
        self.model = self.model.vb_update(elbo_acc, self.lrate)
        return self.model, self.nnet_params
