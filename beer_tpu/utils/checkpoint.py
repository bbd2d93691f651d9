"""Model checkpointing.

Reference parity: the reference serializes models with ``torch.save``
pickles (``.mdl`` files) at creation and per training epoch, and the CLI
``train`` resumes from the latest epoch file (SURVEY.md §5.4).

A beer_tpu model is a pure pytree of arrays + static metadata, so a
checkpoint is ``flax.serialization.to_bytes`` of the arrays next to a
pickled *skeleton* (the model with arrays stripped) that rebuilds the
structure.  Exact resume is trivial: the conjugate update is
deterministic given statistics.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
from flax import serialization


class _StrippedLeaf:
    """Skeleton placeholder for an array leaf (picklable sentinel).

    A dedicated class — NOT ``None`` — so optional model fields that are
    genuinely ``None`` (empty subtrees, e.g. ``PhoneLoop.log_exit``)
    survive the round trip instead of being miscounted as leaves.
    """


_LEAF = _StrippedLeaf()


def save_model(model, path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree.flatten(model)
    skeleton = jax.tree.unflatten(treedef, [_LEAF] * len(leaves))
    payload = {
        "skeleton": pickle.dumps(skeleton),
        "arrays": serialization.to_bytes([jnp.asarray(leaf) for leaf in leaves]),
    }
    with open(path, "wb") as fh:
        pickle.dump(payload, fh)


def load_model(path):
    with open(path, "rb") as fh:
        payload = pickle.load(fh)
    skeleton = pickle.loads(payload["skeleton"])
    leaves, treedef = jax.tree.flatten(
        skeleton, is_leaf=lambda x: isinstance(x, _StrippedLeaf)
    )
    if not leaves:  # legacy checkpoint: leaves were stripped to None
        leaves, treedef = jax.tree.flatten(
            skeleton, is_leaf=lambda x: x is None
        )
    template = [jnp.zeros(()) for _ in leaves]
    arrays = serialization.from_bytes(template, payload["arrays"])
    # from_bytes yields numpy arrays; promote so loaded models jit cleanly
    return jax.tree.unflatten(treedef, [jnp.asarray(a) for a in arrays])


def latest_checkpoint(directory, pattern: str = "epoch*.mdl"):
    """Highest-numbered checkpoint in a directory, or None."""
    directory = Path(directory)
    if not directory.is_dir():
        return None
    ckpts = sorted(directory.glob(pattern))
    return ckpts[-1] if ckpts else None
