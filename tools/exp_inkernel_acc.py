"""Cost of accumulating (S, P) += gamma_blk^T @ stats_blk INSIDE a
pallas kernel (the candidate gamma-fusion for the smoothing kernel:
gamma would never reach HBM).

Modes:
* stream2   — floor: stream gamma (K,B,S) + stats (K,B,P) blocks, trivial use
* dg_block  — one dot_general((0,),(0,)) per block on (K*B, S)x(K*B, P)
* dg_step   — per-step dot_general((0,),(0,)) on (B, S)x(B, P)
* tr_block  — explicit jnp transpose of gamma block then plain dot
* xla       — the production path for reference: XLA einsum over HBM arrays

All at the bench shape B=512 T=500 S=150 P=78, f32, HIGHEST.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, S, P = 512, 500, 150, 78
K = 8
HI = jax.lax.Precision.HIGHEST


def build(mode):
    t_pad = -(-T // K) * K
    n_blocks = t_pad // K

    def kernel(g_ref, s_ref, out_ref, acc):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        a = acc[:]
        if mode == "stream2":
            a = a + g_ref[0, :S].sum() * s_ref[0, :1, :] \
                + g_ref[K - 1, :1, :S].T * 0.0
            a = a + s_ref[K - 1].sum() * 0.0
        elif mode == "dg_block":
            g = g_ref[:].reshape(K * B, S).astype(jnp.float32)
            st = s_ref[:].reshape(K * B, P).astype(jnp.float32)
            a = a + jax.lax.dot_general(
                g, st, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI,
            )
        elif mode == "dg_step":
            for k in range(K):
                a = a + jax.lax.dot_general(
                    g_ref[k].astype(jnp.float32),
                    s_ref[k].astype(jnp.float32),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI,
                )
        elif mode == "tr_block":
            g = g_ref[:].reshape(K * B, S).astype(jnp.float32)
            st = s_ref[:].reshape(K * B, P).astype(jnp.float32)
            a = a + jnp.dot(g.T, st,
                            preferred_element_type=jnp.float32,
                            precision=HI)
        acc[:] = a

        @pl.when(pid == n_blocks - 1)
        def _():
            out_ref[:] = acc[:]

    idx = lambda t: (t, 0, 0)

    def run(g, st):
        return pl.pallas_call(
            kernel, grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((K, B, S), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((K, B, P), idx, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, P), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, P), jnp.float32),
            scratch_shapes=[pltpu.VMEM((S, P), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(g, st)

    return run


def xla(g, st):
    return jnp.einsum("tbs,tbp->sp", g, st, precision=HI)


def timeit(fn, args, n1=4, n2=16, outer=3):
    def chain(inner):
        @jax.jit
        def run(g, st):
            def step(c, _):
                r = fn(g * (1 + c * 1e-30), st)
                return r.sum() * 1e-30, None
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
    rng = np.random.default_rng(0)
    t_pad = -(-T // K) * K
    g = jnp.asarray(rng.random(size=(t_pad, B, S)).astype(np.float32))
    st = jnp.asarray(rng.normal(size=(t_pad, B, P)).astype(np.float32))
    for mode in ("stream2", "dg_block", "dg_step", "tr_block"):
        try:
            dt = timeit(build(mode), (g, st))
            print(f"{mode}: {dt*1e3:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode}: FAILED {type(e).__name__}: {e}", flush=True)
    dt = timeit(xla, (g[:T], st[:T]))
    print(f"xla: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
