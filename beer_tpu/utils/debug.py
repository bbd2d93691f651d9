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


def guard_finite_outputs(name: str = "step"):
    """Output-side NaN guard for steps checkify cannot wrap.

    ``checkify`` does not compose with ``shard_map`` collectives, so the
    data-parallel training step cannot use :func:`nan_guard`.  Semantics
    stay identical — the checkify guard also only validates *outputs* —
    but the check runs as a separate tiny jitted reduction over the step
    output.  Returns ``check(out_tree)`` which raises
    :class:`FloatingPointError` naming the offending leaves.
    """

    @jax.jit
    def _flags(tree):
        return [
            jnp.all(jnp.isfinite(leaf))
            if jnp.issubdtype(leaf.dtype, jnp.floating)
            else jnp.bool_(True)
            for leaf in jax.tree.leaves(tree)
        ]

    def check(tree):
        flags = _flags(tree)
        if all(bool(f) for f in flags):
            return
        paths = jax.tree_util.tree_flatten_with_path(tree)[0]
        bad = [
            jax.tree_util.keystr(path)
            for (path, _), ok in zip(paths, flags)
            if not bool(ok)
        ]
        raise FloatingPointError(f"{name}: non-finite values in outputs at {bad}")

    return check


def assert_finite(tree, name: str = "tree") -> None:
    """Eager (non-jit) finite check for tests and debugging."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating) and not bool(
            jnp.all(jnp.isfinite(arr))
        ):
            raise FloatingPointError(f"non-finite values at {name}{path}")
