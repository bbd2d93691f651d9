"""ModelSet protocol: vectorized sets of density models.

Reference parity: ``beer/models/modelset.py`` (ModelSet, and the joint /
repeated composition variants).  Where the reference wraps Python lists of
model objects, a set here is a single model whose Bayesian parameters
carry a leading component axis — so mixtures and HMM emissions evaluate
every component with one (T, P) @ (P, K) contraction instead of a loop.

Contract (consumed by Mixture / HMM):

* ``sufficient_statistics(x)``      → (T, P) or (T, K, P) stats,
* ``expected_log_likelihood(stats)`` → (T, K) per-frame per-component,
* ``accumulate(stats, resps)``       → stats pytree, resps (T, K),
* ``__len__``                        → K.
"""

from __future__ import annotations

from flax import struct

from beer_tpu.models.basemodel import Model


@struct.dataclass
class ModelSet(Model):
    """Marker base class for vectorized model sets."""

    def __len__(self) -> int:
        raise NotImplementedError
