"""Why does the forward kernel stream at ~100 GB/s?

Variants on the (T=500, B=512, S) f32 stream (read llh, write probs):
* xla-2x     — XLA elementwise y = 2x with an optimization barrier →
               the achievable HBM ceiling for the same traffic
* k8-s150    — stream-only Pallas kernel, K=8 steps/block (current)
* k32-s150   — K=32 (4x bigger slabs, 1/4 the grid steps)
* k8-s256    — S padded to a lane multiple (dense VMEM tiles)
* k32-s256   — both
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

from beer_tpu.ops.pallas_scan import _exp_tile, _pad_tm

B, T = 512, 500


def make_stream_kernel(k_steps, use_exp=True):
    def kernel(llh_ref, m_ref, prob_out, norm_out):
        for k in range(k_steps):
            m_t = m_ref[k].astype(jnp.float32)
            if use_exp:
                e_t, _ = _exp_tile(llh_ref[k].astype(jnp.float32), m_t)
            else:
                e_t = llh_ref[k].astype(jnp.float32) * m_t
            prob_out[k] = (2.0 * e_t).astype(prob_out.dtype)
            norm_out[k] = m_t.astype(norm_out.dtype)

    return kernel

def make_stream_kernel_wide(k_steps, use_exp=True):
    """Whole-block elementwise (one (K*B, S) op instead of K (B, S) ops)."""
    def kernel(llh_ref, m_ref, prob_out, norm_out):
        x = llh_ref[:].astype(jnp.float32)
        m = m_ref[:].astype(jnp.float32)
        if use_exp:
            mx = jnp.max(x, axis=-1, keepdims=True)
            e = m * jnp.exp(x - mx) + (1.0 - m)
        else:
            e = x * m
        prob_out[:] = (2.0 * e).astype(prob_out.dtype)
        norm_out[:] = m.astype(norm_out.dtype)

    return kernel


def stream(llh_tm, mask, k_steps, use_exp=True, wide=False):
    t_len, b, s = llh_tm.shape
    t_pad = -(-t_len // k_steps) * k_steps
    llh_p = _pad_tm(llh_tm, t_pad, 0.0)
    m_tm = _pad_tm(mask.T, t_pad, 0.0)[..., None]
    n_blocks = t_pad // k_steps
    idx = lambda t: (t, 0, 0)
    big = pl.BlockSpec((k_steps, b, s), idx, memory_space=pltpu.VMEM)
    small = pl.BlockSpec((k_steps, b, 1), idx, memory_space=pltpu.VMEM)
    maker = make_stream_kernel_wide if wide else make_stream_kernel
    probs, norms = pl.pallas_call(
        maker(k_steps, use_exp),
        grid=(n_blocks,),
        in_specs=[big, small],
        out_specs=[big, small],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, s), llh_tm.dtype),
            jax.ShapeDtypeStruct((t_pad, b, 1), llh_tm.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(llh_p, m_tm)
    return probs, norms


def timeit(fn, args, n1=4, n2=16, outer=3):
    def chain(inner):
        @jax.jit
        def run(llh, mask):
            def step(c, _):
                p, n = fn(llh * (1 + c * 1e-30), mask)
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


def xla_2x(llh, mask):
    y = jax.lax.optimization_barrier(2.0 * llh)
    return y, mask


def main():
    rng = np.random.default_rng(0)
    lengths = rng.integers(T // 2, T + 1, size=B)
    mask = jnp.asarray(
        (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32))
    llh = jnp.asarray(rng.normal(size=(T, B, 150)).astype(np.float32))
    for name, kw in [("copy-k8", dict(k_steps=8, use_exp=False)),
                     ("wide-exp-k8", dict(k_steps=8, wide=True)),
                     ("wide-copy-k8", dict(k_steps=8, use_exp=False, wide=True))]:
        dt = timeit(lambda l, m, kw=kw: stream(l, m, **kw), (llh, mask))
        mb = (T * B * 150 * 4 * 2) / 1e6
        print(f"{name}: {dt*1e3:.3f} ms ({mb/dt/1e3:.0f} GB/s)", flush=True)
    return
    for s in (150, 256):
        llh = jnp.asarray(rng.normal(size=(T, B, s)).astype(np.float32))
        mb = (T * B * s * 4 * 2) / 1e6
        if s == 150:
            dt = timeit(xla_2x, (llh, mask))
            print(f"xla-2x s{s}: {dt*1e3:.3f} ms "
                  f"({mb/dt/1e3:.0f} GB/s)", flush=True)
        for k in (8, 32):
            dt = timeit(lambda l, m, k=k: stream(l, m, k), (llh, mask))
            print(f"k{k}-s{s}: {dt*1e3:.3f} ms ({mb/dt/1e3:.0f} GB/s)",
                  flush=True)


if __name__ == "__main__":
    main()
