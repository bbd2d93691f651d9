"""Find what limits in-kernel HBM read rate (~250 GB/s vs XLA ~700).

All variants read the full (T, B, 256) f32 array (264 MB) via manual
async copies with 3 buffers; only the pipeline structure varies:

* base      — one DMA per K=8 chunk (the exp_manual_dma manual3)
* k32/k64   — bigger chunks (fewer, larger DMAs)
* par2/par4 — each chunk split into 2/4 concurrent DMAs (distinct
              semaphores, started back-to-back) — multiple engines?
* nocomp    — base pipeline but no per-chunk compute (pure DMA rate)
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

B, T, S = 512, 504, 256
NBUF = 3


def build(k, split=1, compute=True):
    n_chunks = T // k

    def kernel(x_hbm, scale_ref, out_ref):
        def body(scratch, sem):
            def start_dma(slot, chunk):
                for j in range(split):
                    rows = k // split
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(chunk * k + j * rows, rows)],
                        scratch.at[slot, pl.ds(j * rows, rows)],
                        sem.at[slot, j],
                    ).start()

            def wait_dma(slot, chunk):
                for j in range(split):
                    rows = k // split
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(chunk * k + j * rows, rows)],
                        scratch.at[slot, pl.ds(j * rows, rows)],
                        sem.at[slot, j],
                    ).wait()

            for i in range(NBUF - 1):
                start_dma(i, i)

            def loop_body(chunk, acc):
                slot = chunk % NBUF
                nxt = (chunk + NBUF - 1) % NBUF

                @pl.when(chunk + NBUF - 1 < n_chunks)
                def _():
                    start_dma(nxt, chunk + NBUF - 1)

                wait_dma(slot, chunk)
                if compute:
                    return acc + scratch[slot].sum(0)
                return acc + scratch[slot][0] * 1e-30

            acc = jax.lax.fori_loop(
                0, n_chunks, loop_body,
                jnp.zeros((B, S), jnp.float32),
            )
            out_ref[:] = acc * scale_ref[0, 0]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((NBUF, k, B, S), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((NBUF, split)),
        )

    def run(x, scale):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec((1, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, S), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, scale)

    return run


def build_auto():
    n_chunks = T // 8

    def kernel(x_ref, scale_ref, out_ref, acc):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += x_ref[:].sum(0)

        @pl.when(pid == n_chunks - 1)
        def _():
            out_ref[:] = acc[:] * scale_ref[0, 0]

    def run(x, scale):
        return pl.pallas_call(
            kernel, grid=(n_chunks,),
            in_specs=[pl.BlockSpec((8, B, S), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 128), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, S), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, S), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, scale)

    return run


def timeit(fn, args, n1=2, n2=10, outer=3):
    def chain(inner):
        @jax.jit
        def run(x):
            def step(c, _):
                scale = jnp.full((1, 128), 1.0 + c * 1e-30, jnp.float32)
                r = fn(x, scale)
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
    x = jnp.asarray(rng.normal(size=(T, B, S)).astype(np.float32))
    gb = T * B * S * 4 / 1e9

    cases = [
        ("auto", build_auto()),
        ("base", build(8)),
        ("k32", build(56)),       # 9 chunks of 56 (504 = 56*9), 14 MB each
        ("par2", build(8, split=2)),
        ("par4", build(8, split=4)),
        ("nocomp", build(8, compute=False)),
    ]
    for name, fn in cases:
        try:
            dt = timeit(fn, (x,))
            print(f"{name}: {dt*1e3:.3f} ms  ({gb/dt:.0f} GB/s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
