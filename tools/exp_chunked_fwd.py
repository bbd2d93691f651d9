"""Experiment: does interleaving independent batch-chunk recursions hide
the serial-matmul pipeline latency of the forward scan kernel?

Variant of ``pallas_scan._make_fwd_llh_kernel`` with ``n_chunks``
independent carries: per unrolled time step the per-chunk dots have no
data dependency on each other, so the scheduler can keep the MXU pipe
full across the (chunked) serial chain.  Timed with the slope method.
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
K_STEPS = 8


def make_kernel(k_steps, n_chunks, cb):
    def kernel(llh_ref, m_ref, trans_ref, init_ref,
               prob_out, norm_out, mllh_out, carry_p):
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            carry_p[:] = init_ref[:].astype(jnp.float32)

        ps = [carry_p[c * cb:(c + 1) * cb] for c in range(n_chunks)]
        t_hi, t_lo = _split_bf16(trans_ref[:])
        for k in range(k_steps):
            m_t = m_ref[k].astype(jnp.float32)
            e_t, mllh = _exp_tile(llh_ref[k].astype(jnp.float32), m_t)
            outs = []
            for c in range(n_chunks):
                sl = slice(c * cb, (c + 1) * cb)
                p = ps[c]
                propagated = _dot3(p, t_hi, t_lo)
                if k == 0:
                    base = jnp.where(pid == 0, p, propagated)
                else:
                    base = propagated
                raw = base * e_t[sl]
                norm = jnp.maximum(raw.sum(-1, keepdims=True), tiny)
                new_p = raw / norm
                keep = m_t[sl]
                if k == 0:
                    keep = jnp.where(pid == 0, 1.0, keep)
                p = keep * new_p + (1.0 - keep) * p
                ps[c] = p
                outs.append((p, keep * norm + (1.0 - keep)))
            prob_out[k] = jnp.concatenate([o[0] for o in outs], axis=0
                                          ).astype(prob_out.dtype)
            norm_out[k] = jnp.concatenate([o[1] for o in outs], axis=0
                                          ).astype(norm_out.dtype)
            mllh_out[k] = mllh.astype(mllh_out.dtype)
        carry_p[:] = jnp.concatenate(ps, axis=0)

    return kernel


def chunked_fwd(llh_tm, trans, init_vec, mask, n_chunks):
    t_len, b, s = llh_tm.shape
    cb = b // n_chunks
    k_steps = K_STEPS
    t_pad = -(-t_len // k_steps) * k_steps
    llh_p = _pad_tm(llh_tm, t_pad, 0.0)
    m_tm = _pad_tm(mask.T, t_pad, 0.0)[..., None]
    n_blocks = t_pad // k_steps
    idx = lambda t: (t, 0, 0)
    big = pl.BlockSpec((k_steps, b, s), idx, memory_space=pltpu.VMEM)
    small = pl.BlockSpec((k_steps, b, 1), idx, memory_space=pltpu.VMEM)
    probs, norms, mllh = pl.pallas_call(
        make_kernel(k_steps, n_chunks, cb),
        grid=(n_blocks,),
        in_specs=[
            big, small,
            pl.BlockSpec((s, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[big, small, small],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, s), llh_tm.dtype),
            jax.ShapeDtypeStruct((t_pad, b, 1), llh_tm.dtype),
            jax.ShapeDtypeStruct((t_pad, b, 1), llh_tm.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(llh_p, m_tm, trans, init_vec)
    return probs[:t_len], norms[:t_len, :, 0], mllh[:t_len, :, 0]


def timeit(fn, llh, trans, init, mask, n1=4, n2=16, outer=3):
    def chain(inner):
        @jax.jit
        def run(llh, trans, init, mask):
            def step(c, _):
                p, n, m = fn(llh * (1 + c * 1e-30), trans, init, mask)
                return (p[-1].sum() + n.sum()) * 1e-30, None
            c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=inner)
            return c
        return run

    f1, f2 = chain(n1), chain(n2)
    float(f1(llh, trans, init, mask)); float(f2(llh, trans, init, mask))

    def run(f):
        t0 = time.time()
        for _ in range(outer):
            float(f(llh, trans, init, mask))
        return (time.time() - t0) / outer

    t1, t2 = run(f1), run(f2)
    return (t2 - t1) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    llh = jnp.asarray(rng.normal(size=(T, B, S)).astype(np.float32)) - 50.0
    lengths = rng.integers(T // 2, T + 1, size=B)
    mask = jnp.asarray(
        (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32))
    trans = jnp.asarray(
        np.abs(rng.normal(size=(S, S))).astype(np.float32)) / S
    init = jnp.ones((B, S), jnp.float32) / S

    base = timeit(lambda l, t, i, m: forward_llh_pass(l, t, i, m),
                  llh, trans, init, mask)
    print(f"baseline: {base*1e3:.3f} ms", flush=True)
    for nc in (2, 4):
        dt = timeit(lambda l, t, i, m, nc=nc: chunked_fwd(l, t, i, m, nc),
                    llh, trans, init, mask)
        # correctness: outputs must match baseline
        p0, n0, _ = jax.jit(forward_llh_pass)(llh, trans, init, mask)
        p1, n1_, _ = jax.jit(
            lambda l, t, i, m: chunked_fwd(l, t, i, m, nc))(
                llh, trans, init, mask)
        err = float(jnp.max(jnp.abs(p0 - p1)))
        print(f"chunks={nc}: {dt*1e3:.3f} ms  max|Δp|={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
