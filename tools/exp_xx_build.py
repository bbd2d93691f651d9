"""Micro-benchmark: ways to build the (Tt, D^2) xx^T block in VMEM.

The fused GMM E-step's fixed cost is dominated by _flat_outer's 39-piece
lane-misaligned concat (~4 ms per pass over 256k frames).  Candidates:

  concat   — current: jnp.concatenate([x[:,i:i+1]*x for i], axis=1)
  repeat   — A = pltpu.repeat-elements? via jnp.repeat(x, D, 1);
             B = one selector matmul x @ E2 (DEFAULT); xx = A*B
  selsel   — A = x @ E1, B = x @ E2 (two DEFAULT selector matmuls)
  vmap_bc  — A via broadcast trick: x[:, :, None] * ... (3-D, may not lower)

Each kernel builds xx then folds it with a single (D^2, 1) matmul so the
build cannot be DCE'd and the folding cost is tiny and identical.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, K = 39, 64
N = 512 * 500
DEF = jax.lax.Precision.DEFAULT


def selectors(d):
    e1 = np.zeros((d, d * d), np.float32)
    e2 = np.zeros((d, d * d), np.float32)
    for i in range(d):
        for j in range(d):
            e1[i, i * d + j] = 1.0
            e2[j, i * d + j] = 1.0
    return jnp.asarray(e1), jnp.asarray(e2)


def make(variant, tile):
    d = D
    e1, e2 = selectors(d)

    def build_concat(x, e1r, e2r):
        return jnp.concatenate([x[:, i : i + 1] * x for i in range(d)], 1)

    def build_repeat(x, e1r, e2r):
        a = pltpu.repeat(x, d, 1)  # element repeat? or tile — check shape
        b = jnp.dot(x, e2r, preferred_element_type=jnp.float32,
                    precision=DEF)
        return a * b

    def build_jnprepeat(x, e1r, e2r):
        a = jnp.repeat(x, d, axis=1)
        b = jnp.dot(x, e2r, preferred_element_type=jnp.float32,
                    precision=DEF)
        return a * b

    def build_selsel(x, e1r, e2r):
        a = jnp.dot(x, e1r, preferred_element_type=jnp.float32,
                    precision=DEF)
        b = jnp.dot(x, e2r, preferred_element_type=jnp.float32,
                    precision=DEF)
        return a * b

    builds = {"concat": build_concat, "repeat": build_repeat,
              "jnprepeat": build_jnprepeat, "selsel": build_selsel}
    build = builds[variant]

    def kernel(x_ref, e1_ref, e2_ref, w_ref, out_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        xx = build(x_ref[:], e1_ref[:], e2_ref[:])
        acc[:] += jnp.dot(xx, w_ref[:], preferred_element_type=jnp.float32,
                          precision=DEF).sum(0, keepdims=True)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    def run(x, w):
        tp = x.shape[0]
        return pl.pallas_call(
            kernel, grid=(tp // tile,),
            in_specs=[
                pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d * d, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, 8), jnp.float32)],
        )(x, e1, e2, w)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="concat,repeat,jnprepeat,selsel")
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--inner", type=int, nargs=2, default=[4, 12])
    ap.add_argument("--outer", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(D * D, 8)).astype(np.float32))

    # oracle for build correctness
    xd = np.asarray(x[: args.tile], np.float64)
    xx64 = np.einsum("td,te->tde", xd, xd).reshape(args.tile, D * D)
    ref = (xx64 @ np.asarray(w, np.float64)).sum(0)

    results = {}
    for v in args.variants.split(","):
        run = make(v, args.tile)
        try:
            out = np.asarray(jax.jit(lambda x: run(x, w))(x[: args.tile]))
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        err = np.abs(out[0] - ref).max() / np.abs(ref).max()

        def harness(inner):
            @jax.jit
            def f(x):
                def step(c, _):
                    xp = x * (1.0 + c * 1e-30)
                    return run(xp, w).sum() * 1e-30, None
                c, _ = jax.lax.scan(step, jnp.float32(0.0), None,
                                    length=inner)
                return c
            return f

        n1, n2 = args.inner
        f1, f2 = harness(n1), harness(n2)
        float(f1(x)); float(f2(x))

        def t(f):
            t0 = time.time()
            for _ in range(args.outer):
                float(f(x))
            return (time.time() - t0) / args.outer

        dt = (t(f2) - t(f1)) / (n2 - n1)
        results[v] = dict(ms=round(dt * 1e3, 3), err=float(err))
        print(f"{v}: {dt*1e3:.3f} ms err={err:.2e}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
