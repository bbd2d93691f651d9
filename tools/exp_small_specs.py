"""Are the (K, B, 1) minor-dim-1 side streams the hidden cost?

Stream-kernel variants on (T=500, B=512, S=150):
* all      — big in/out + mask in + norm out (the current structure)
* no-small — big in/out only
* mask-in  — big in/out + mask in (no small output)
* norm-out — big in/out + norm out (no mask input)
* packed   — mask rides an extra lane of the big input; norm rides an
             extra lane of the big output (no (K, B, 1) specs at all)
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

from beer_tpu.ops.pallas_scan import _pad_tm

B, T, S = 512, 500, 150
K = 8


def variant(llh_tm, mask, mode):
    t_len, b, s = llh_tm.shape
    t_pad = -(-t_len // K) * K
    llh_p = _pad_tm(llh_tm, t_pad, 0.0)
    m_tm = _pad_tm(mask.T, t_pad, 0.0)[..., None]
    n_blocks = t_pad // K
    idx = lambda t: (t, 0, 0)
    big = pl.BlockSpec((K, b, s), idx, memory_space=pltpu.VMEM)
    small = pl.BlockSpec((K, b, 1), idx, memory_space=pltpu.VMEM)

    if mode == "packed":
        sp = s + 1
        big_p = pl.BlockSpec((K, b, sp), idx, memory_space=pltpu.VMEM)
        llh_m = jnp.concatenate([llh_p, m_tm], axis=-1)  # (T, B, S+1)

        def kernel(x_ref, o_ref):
            x = x_ref[:].astype(jnp.float32)
            m = x[:, :, s:]
            e = m * jnp.exp(x[:, :, :s]) + (1.0 - m)
            o_ref[:] = jnp.concatenate(
                [2.0 * e, m], axis=-1).astype(o_ref.dtype)

        out = pl.pallas_call(
            kernel, grid=(n_blocks,),
            in_specs=[big_p], out_specs=big_p,
            out_shape=jax.ShapeDtypeStruct((t_pad, b, sp), llh_tm.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(llh_m)
        return out[:, :, :s], out[:, :1, s]

    use_mask = mode in ("all", "mask-in")
    use_norm = mode in ("all", "norm-out")

    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1
        m_ref = refs[i] if use_mask else None
        i += use_mask
        o_ref = refs[i]; i += 1
        n_ref = refs[i] if use_norm else None
        x = x_ref[:].astype(jnp.float32)
        if m_ref is not None:
            m = m_ref[:].astype(jnp.float32)
            e = m * jnp.exp(x) + (1.0 - m)
        else:
            e = jnp.exp(x)
        o_ref[:] = (2.0 * e).astype(o_ref.dtype)
        if n_ref is not None:
            n_ref[:] = e.sum(-1, keepdims=True).astype(n_ref.dtype)

    in_specs = [big] + ([small] if use_mask else [])
    out_specs = [big] + ([small] if use_norm else [])
    out_shape = [jax.ShapeDtypeStruct((t_pad, b, s), llh_tm.dtype)] + (
        [jax.ShapeDtypeStruct((t_pad, b, 1), llh_tm.dtype)]
        if use_norm else [])
    args = (llh_p, m_tm) if use_mask else (llh_p,)
    out = pl.pallas_call(
        kernel, grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs if use_norm else out_specs[0],
        out_shape=out_shape if use_norm else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)
    if use_norm:
        return out[0], out[1][:, :1, 0]
    return out, out[:1, 0, 0]


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


def main():
    rng = np.random.default_rng(0)
    llh = jnp.asarray(rng.normal(size=(T, B, S)).astype(np.float32)) - 2.0
    lengths = rng.integers(T // 2, T + 1, size=B)
    mask = jnp.asarray(
        (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32))
    for mode in ("all", "no-small", "mask-in", "norm-out", "packed"):
        dt = timeit(lambda l, m, mode=mode: variant(l, m, mode),
                    (llh, mask))
        print(f"{mode}: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
