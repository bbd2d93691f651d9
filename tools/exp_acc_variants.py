"""Isolate the γ-fused smoothing kernel's cost at the bench shape.

Variants:
* gamma      — the γ-emitting estep-ckpt kernel (production before acc)
* gamma+ein  — gamma + the XLA Σγᵀstats einsum + counts (old full path)
* acc        — the γ-fused kernel (BEER_ACC_DEBUG tweaks its acc block:
               "" full | "noacc" skip matmul+sum | "nosum" matmul only |
               "lowp" DEFAULT-precision matmul | "dg" dot_general form)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from beer_tpu.ops import pallas_scan

B, T, S, P = 512, 500, 150, 78
N_UNITS, SPU = 50, 3


def make_inputs():
    rng = np.random.default_rng(0)
    llh = jnp.asarray(rng.normal(size=(T, B, S)).astype(np.float32)) - 2.0
    stats = jnp.asarray(rng.normal(size=(T, B, P)).astype(np.float32))
    lengths = rng.integers(T // 2, T + 1, size=B)
    mask = jnp.asarray(
        (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    )
    tr = np.abs(rng.normal(size=(S, S))).astype(np.float32)
    trans = jnp.asarray(tr / tr.sum(-1, keepdims=True))
    iv = jnp.full((B, S), 1.0 / S, jnp.float32)
    fv = jnp.asarray(np.abs(rng.normal(size=(B, S))).astype(np.float32))
    rows = jnp.arange(N_UNITS, dtype=jnp.int32) * SPU + SPU - 1
    cols = jnp.arange(N_UNITS, dtype=jnp.int32) * SPU
    sel_r = jax.nn.one_hot(rows, S, dtype=jnp.float32).T
    sel_c = jax.nn.one_hot(cols, S, dtype=jnp.float32).T
    ckpts, _, _ = jax.jit(pallas_scan.forward_llh_ckpt_pass)(
        llh, trans, iv, mask
    )
    return llh, stats, ckpts, trans, fv, mask, sel_r, sel_c


def timeit(fn, args, n1=2, n2=10, outer=3):
    # perturb only the small (S, S) transition input (see
    # exp_fwd_pieces.timeit: big-input perturbation = phantom XLA temp)
    def chain(inner):
        @jax.jit
        def run(llh, stats, ckpts, trans, *rest):
            def step(c, _):
                out = fn(llh, stats, ckpts, trans * (1 + c * 1e-30), *rest)
                s = sum(jnp.sum(o) for o in jax.tree.leaves(out))
                return s * 1e-30, None
            c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=inner)
            return c
        return run

    f1, f2 = chain(n1), chain(n2)
    float(f1(*args)); float(f2(*args))

    def run(f):
        t0 = time.time()
        for _ in range(outer):
            float(f(*args))
        return (time.time() - t0) / outer

    return (run(f2) - run(f1)) / (n2 - n1)


def main():
    llh, stats, ckpts, trans, fv, mask, sel_r, sel_c = make_inputs()

    def gamma_variant(llh, stats, ckpts, trans, fv, mask, sel_r, sel_c):
        return pallas_scan.phone_loop_estep_ckpt_pass(
            llh, ckpts, trans, fv, mask, sel_r, sel_c
        )

    def gamma_ein(llh, stats, ckpts, trans, fv, mask, sel_r, sel_c):
        g, xi = pallas_scan.phone_loop_estep_ckpt_pass(
            llh, ckpts, trans, fv, mask, sel_r, sel_c
        )
        acc = jnp.einsum("tbs,tbp->sp", g, stats,
                         precision=jax.lax.Precision.HIGHEST)
        return xi, acc, g.sum((0, 1)), g[0]

    def acc_variant(llh, stats, ckpts, trans, fv, mask, sel_r, sel_c):
        return pallas_scan.phone_loop_estep_ckpt_pass(
            llh, ckpts, trans, fv, mask, sel_r, sel_c, stats_tm=stats
        )

    which = os.environ.get("EXP_WHICH", "gamma,ein,acc").split(",")
    if "gamma" in which:
        dt = timeit(gamma_variant,
                    (llh, stats, ckpts, trans, fv, mask, sel_r, sel_c))
        print(f"gamma: {dt*1e3:.3f} ms", flush=True)
    if "ein" in which:
        dt = timeit(gamma_ein,
                    (llh, stats, ckpts, trans, fv, mask, sel_r, sel_c))
        print(f"gamma+ein: {dt*1e3:.3f} ms", flush=True)
    if "acc" in which:
        dt = timeit(acc_variant,
                    (llh, stats, ckpts, trans, fv, mask, sel_r, sel_c))
        mode = os.environ.get("BEER_ACC_DEBUG", "")
        print(f"acc[{mode}]: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
