"""Isolate the forward-scan kernel's bottleneck on the bench shape.

Variants (same tile layout as ``forward_llh_pass``):
* k16      — K=16 steps/block (half the grid steps; less per-block cost)
* noout    — full recursion, but the (K, B, S) prob stream is NOT
             written (only norms) → isolates the output DMA
* stream   — no recursion at all: out = 2·exp(llh) → grid+DMA floor
* nonorm   — matmul chain without the normalize (sum/div) chain →
             isolates the reduction latency
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

from beer_tpu.ops.pallas_scan import (
    _split_bf16, _dot3, _exp_tile, _pad_tm, forward_llh_pass,
)

B, T, S = 512, 500, 150


def make_kernel(k_steps, mode):
    def kernel(llh_ref, m_ref, trans_ref, init_ref,
               prob_out, norm_out, carry_p):
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            carry_p[:] = init_ref[:].astype(jnp.float32)

        p = carry_p[:]
        t_hi, t_lo = _split_bf16(trans_ref[:])
        for k in range(k_steps):
            m_t = m_ref[k].astype(jnp.float32)
            e_t, _ = _exp_tile(llh_ref[k].astype(jnp.float32), m_t)
            if mode == "stream":
                prob_out[k] = (2.0 * e_t).astype(prob_out.dtype)
                norm_out[k] = m_t.astype(norm_out.dtype)
                continue
            propagated = _dot3(p, t_hi, t_lo)
            raw = propagated * e_t
            if mode == "nonorm":
                # scale by a constant instead of the row-sum: breaks the
                # reduce->divide dependency, keeps the matmul chain
                p = raw * 0.5 + 1e-6
                norm = m_t
            else:
                norm = jnp.maximum(raw.sum(-1, keepdims=True), tiny)
                new_p = raw / norm
                p = m_t * new_p + (1.0 - m_t) * p
            if mode != "noout":
                prob_out[k] = p.astype(prob_out.dtype)
            norm_out[k] = norm.astype(norm_out.dtype)
        carry_p[:] = p

    return kernel


def variant(llh_tm, trans, init_vec, mask, k_steps, mode):
    t_len, b, s = llh_tm.shape
    t_pad = -(-t_len // k_steps) * k_steps
    llh_p = _pad_tm(llh_tm, t_pad, 0.0)
    m_tm = _pad_tm(mask.T, t_pad, 0.0)[..., None]
    n_blocks = t_pad // k_steps
    idx = lambda t: (t, 0, 0)
    big = pl.BlockSpec((k_steps, b, s), idx, memory_space=pltpu.VMEM)
    small = pl.BlockSpec((k_steps, b, 1), idx, memory_space=pltpu.VMEM)
    probs, norms = pl.pallas_call(
        make_kernel(k_steps, mode),
        grid=(n_blocks,),
        in_specs=[
            big, small,
            pl.BlockSpec((s, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[big, small],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, s), llh_tm.dtype),
            jax.ShapeDtypeStruct((t_pad, b, 1), llh_tm.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(llh_p, m_tm, trans, init_vec)
    return probs, norms


def timeit(fn, args, n1=4, n2=16, outer=3):
    def chain(inner):
        @jax.jit
        def run(llh, trans, init, mask):
            def step(c, _):
                p, n = fn(llh * (1 + c * 1e-30), trans, init, mask)
                return (p[-1].sum() + n.sum()) * 1e-30, None
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
    llh = jnp.asarray(rng.normal(size=(T, B, S)).astype(np.float32)) - 5.0
    lengths = rng.integers(T // 2, T + 1, size=B)
    mask = jnp.asarray(
        (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32))
    trans = jnp.asarray(
        np.abs(rng.normal(size=(S, S))).astype(np.float32)) / S
    init = jnp.ones((B, S), jnp.float32) / S
    args = (llh, trans, init, mask)

    for name, fn in [
        ("k8-full", lambda l, t, i, m: variant(l, t, i, m, 8, "full")),
        ("k16-full", lambda l, t, i, m: variant(l, t, i, m, 16, "full")),
        ("k8-noout", lambda l, t, i, m: variant(l, t, i, m, 8, "noout")),
        ("k8-nonorm", lambda l, t, i, m: variant(l, t, i, m, 8, "nonorm")),
        ("k8-stream", lambda l, t, i, m: variant(l, t, i, m, 8, "stream")),
    ]:
        dt = timeit(fn, args)
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
