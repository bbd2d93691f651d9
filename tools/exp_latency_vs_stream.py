"""What binds the forward scan kernel now: serial recursion latency or
the HBM stream?

Variants at the bench shape (T=500, B=512, S=150, P=78, K=8):
* stream150 — stream-only (read (K,B,150), exp, fold into carry; no matmul)
* stream78  — same but reading (K,B,78) (the reduced-stats width)
* stream128 — same reading a lane-aligned (K,B,128)
* recur     — recursion-only: no big input; per-step _dot3 + normalize
              chain in VMEM (serial MXU latency exposed, no stream)
* recur+s150 — full current kernel shape: stream (K,B,150) + recursion
* ellh78    — stream (K,B,78), block (K*B,78)@(78,150) HIGHEST matmul,
              + recursion (the fused-ELLH forward)
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

from beer_tpu.ops.pallas_scan import _pad_tm, _split_bf16, _dot3

B, T, S, P = 512, 500, 150, 78
K = 8


def build(mode):
    t_pad = -(-T // K) * K
    n_blocks = t_pad // K
    idx = lambda t: (t, 0, 0)
    width = {"stream150": S, "stream78": P, "stream128": 128,
             "recur": 0, "recur+s150": S, "ellh78": P}[mode]
    has_recur = mode in ("recur", "recur+s150", "ellh78")
    has_ellh = mode == "ellh78"

    def kernel(*refs):
        i = 0
        x_ref = None
        if width:
            x_ref = refs[i]; i += 1
        w_ref = None
        if has_ellh:
            w_ref = refs[i]; i += 1
        trans_ref = refs[i]; i += 1
        out_ref = refs[i]; i += 1
        carry = refs[i]

        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            carry[:] = jnp.full_like(carry, 1.0 / S)

        p = carry[:]
        if has_recur:
            t_hi, t_lo = _split_bf16(trans_ref[:])
        if has_ellh:
            x = x_ref[:].astype(jnp.float32)
            llh = jnp.dot(
                x.reshape(K * B, P), w_ref[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(K, B, S)
        acc = jnp.zeros_like(p)
        for k in range(K):
            if has_ellh:
                e = jnp.exp(llh[k] - llh[k].max(-1, keepdims=True))
            elif width:
                x = x_ref[k].astype(jnp.float32)
                e = jnp.exp(x - x.max(-1, keepdims=True))
                if e.shape[-1] != p.shape[-1]:
                    e = jnp.pad(e, ((0, 0), (0, p.shape[-1] - e.shape[-1])),
                                constant_values=1.0)
            else:
                e = 1.0
            if has_recur:
                raw = _dot3(p, t_hi, t_lo) * e
                p = raw / jnp.maximum(raw.sum(-1, keepdims=True), 1e-30)
            else:
                acc = acc * 0.5 + e
        carry[:] = p if has_recur else acc
        out_ref[0] = (p if has_recur else acc).astype(out_ref.dtype)

    in_specs = []
    if width:
        in_specs.append(pl.BlockSpec((K, B, width), idx,
                                     memory_space=pltpu.VMEM))
    if has_ellh:
        in_specs.append(pl.BlockSpec((P, S), lambda t: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((S, S), lambda t: (0, 0),
                                 memory_space=pltpu.VMEM))

    def run(x, w, trans):
        args = []
        if width:
            args.append(x[:, :, :width] if width <= x.shape[-1] else
                        jnp.pad(x, ((0, 0), (0, 0),
                                    (0, width - x.shape[-1]))))
        if has_ellh:
            args.append(w)
        args.append(trans)
        out = pl.pallas_call(
            kernel, grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, B, S), lambda t: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, B, S), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*args)
        return out[0]

    return run


def timeit(fn, args, n1=4, n2=16, outer=3):
    def chain(inner):
        @jax.jit
        def run(x, w, trans):
            def step(c, _):
                r = fn(x * (1 + c * 1e-30), w, trans)
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
    x = jnp.asarray(rng.normal(size=(t_pad, B, S)).astype(np.float32)) - 2.0
    w = jnp.asarray(rng.normal(size=(P, S)).astype(np.float32) * 0.1)
    trans = jnp.asarray(
        np.abs(rng.normal(size=(S, S))).astype(np.float32))
    trans = trans / trans.sum(-1, keepdims=True)
    for mode in ("stream150", "stream78", "stream128", "recur",
                 "recur+s150", "ellh78"):
        dt = timeit(build(mode), (x, w, trans))
        print(f"{mode}: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
