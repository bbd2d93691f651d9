"""Can a manual DMA pipeline beat pallas auto-pipelining's ~290 GB/s?

Reads a (T, B, S) f32 array and computes a trivial running reduction.

* auto     — pallas_call grid over T-blocks, auto double-buffered refs
* manual2/3/4 — grid=(1,), input left in HBM (memory_space=ANY),
  explicit make_async_copy chunk pipeline with N in-flight buffers
* xla      — jnp.sum over the same array (XLA's stream rate)

Bench shape: T=504, B=512, S=150 (padded lanes 256), chunks of K=8.
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
K = 8
N_CHUNKS = T // K


def build_auto():
    def kernel(x_ref, out_ref, acc):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += x_ref[:].sum(0)

        @pl.when(pid == N_CHUNKS - 1)
        def _():
            out_ref[:] = acc[:]

    def run(x):
        return pl.pallas_call(
            kernel, grid=(N_CHUNKS,),
            in_specs=[pl.BlockSpec((K, B, S), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, S), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, S), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)

    return run


def build_manual(n_buffers):
    def kernel(x_hbm, out_ref):
        def body(scratch, sem):
            def get_dma(slot, chunk):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(chunk * K, K)],
                    scratch.at[slot],
                    sem.at[slot],
                )

            for i in range(n_buffers - 1):
                get_dma(i, i).start()

            def loop_body(chunk, acc):
                slot = chunk % n_buffers
                nxt = (chunk + n_buffers - 1) % n_buffers

                @pl.when(chunk + n_buffers - 1 < N_CHUNKS)
                def _():
                    get_dma(nxt, chunk + n_buffers - 1).start()

                get_dma(slot, chunk).wait()
                return acc + scratch[slot].sum(0)

            acc = jax.lax.fori_loop(
                0, N_CHUNKS, loop_body,
                jnp.zeros((B, S), jnp.float32),
            )
            out_ref[:] = acc

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((n_buffers, K, B, S), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((n_buffers,)),
        )

    def run(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, S), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)

    return run


def xla(x):
    return x.sum(0)


def timeit(fn, args, n1=2, n2=10, outer=3):
    def chain(inner):
        @jax.jit
        def run(x):
            def step(c, _):
                r = fn(x * (1 + c * 1e-30))
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
    gb = T * B * 256 * 4 / 1e9   # padded lane bytes actually moved

    for name, fn in [("auto", build_auto()),
                     ("manual2", build_manual(2)),
                     ("manual3", build_manual(3)),
                     ("manual4", build_manual(4)),
                     ("xla", xla)]:
        try:
            dt = timeit(fn, (x,))
            print(f"{name}: {dt*1e3:.3f} ms  ({gb/dt:.0f} GB/s padded)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
