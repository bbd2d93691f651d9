"""Numerical guards (SURVEY.md §5.2).

The reference relies on nothing; here log-space recursions get optional
checkify-based NaN/Inf detection that still jit-compiles: wrap a step
function once and every call validates its outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def nan_guard(fn, name: str = "fn"):
    """Wrap ``fn`` so non-finite outputs raise (jit-compatible).

    Usage::

        guarded = nan_guard(vb_step, "vb_step")
        err, (elbo, model) = jax.jit(guarded)(model, x)
        err.throw()   # raises with location info if anything was non-finite
    """

    def checked(*args, **kw):
        out = fn(*args, **kw)
        for i, leaf in enumerate(jax.tree.leaves(out)):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                checkify.check(
                    jnp.all(jnp.isfinite(leaf)),
                    f"{name}: non-finite value in output leaf {i}",
                )
        return out

    return checkify.checkify(checked)


def assert_finite(tree, name: str = "tree") -> None:
    """Eager (non-jit) finite check for tests and debugging."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating) and not bool(
            jnp.all(jnp.isfinite(arr))
        ):
            raise FloatingPointError(f"non-finite values at {name}{path}")
