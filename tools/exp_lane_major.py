"""Probe: banded chain-step cost, batch-major (B, S) vs lane-major (S, B).

At the bench shape S=150 pads to 256 lanes — every VPU op on a (B, S)
tile wastes 41% of its lanes, and the serial chain is ~all VPU ops
(banded propagate + normalize + mask blend).  Lane-major flips the tile
to (S, B): S=150 pads to 152 sublanes (1.3% waste) while B=512 fills
4×128 lanes exactly — (19×4)=76 vregs vs (64×2)=128 per value, a 40%
VPU-work cut IF the ops translate 1:1:

    batch-major                     lane-major
    q = (p·exit).sum(lanes)         q = (p·exitᵀ).sum(sublanes)
    roll along lanes                roll along sublanes
    (B, 1) norm broadcast → lanes   (1, B) norm broadcast → sublanes

This times ONE forward-style chain (propagate → ⊙e → norm → blend) over
T steps in both orientations, plus the same with the dense-matmul
propagate for reference.  A ≥25% lane-major win justifies porting the
production ckpt kernel pair (docs/PERFORMANCE.md next-lever note).
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

from beer_tpu.ops.pallas_scan import _shift_right

B, T, S = 512, 500, 150
K = 8


def _shift_down(x):
    """roll +1 along the SUBLANE (first) dim, zero-filling row 0."""
    rolled = jnp.roll(x, 1, axis=0)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(idx == 0, 0.0, rolled)


def build(orient):
    lane_major = orient == "lane"
    t_pad = -(-T // K) * K
    n_blocks = t_pad // K
    shp = (S, B) if lane_major else (B, S)
    red_ax = 0 if lane_major else -1

    def kernel(e_ref, band_ref, out_ref, carry):
        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            carry[:] = jnp.full_like(carry, 1.0 / S)

        tb = band_ref[:].astype(jnp.float32)
        if lane_major:
            # bands live one-per-sublane-row: (4, S) → column vectors
            a_self, a_adv = tb[0][:, None], tb[1][:, None]
            exit_v, w_v = tb[2][:, None], tb[3][:, None]
        else:
            a_self, a_adv = tb[0:1], tb[1:2]
            exit_v, w_v = tb[2:3], tb[3:4]
        p = carry[:]
        for k in range(K):
            e = e_ref[k].astype(jnp.float32)
            q = (p * exit_v).sum(red_ax, keepdims=True)
            if lane_major:
                prop = p * a_self + _shift_down(p * a_adv) + q * w_v
            else:
                prop = p * a_self + _shift_right(p * a_adv) + q * w_v
            raw = prop * e
            norm = jnp.maximum(raw.sum(red_ax, keepdims=True), tiny)
            p = raw / norm
        carry[:] = p
        out_ref[0] = p.astype(out_ref.dtype)

    big = pl.BlockSpec((K,) + shp, lambda t: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    fixed = pl.BlockSpec((1,) + shp, lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM)

    def run(e, bands):
        out = pl.pallas_call(
            kernel, grid=(n_blocks,),
            in_specs=[big, pl.BlockSpec((4, S), lambda t: (0, 0),
                                        memory_space=pltpu.VMEM)],
            out_specs=fixed,
            out_shape=jax.ShapeDtypeStruct((1,) + shp, jnp.float32),
            scratch_shapes=[pltpu.VMEM(shp, jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=jax.default_backend() == "cpu",
        )(e, bands)
        return out[0].sum()

    return run, shp


def timeit(fn, args, n1=4, n2=16, outer=3):
    def chain(inner):
        @jax.jit
        def run(e, bands):
            def step(c, _):
                r = fn(e, bands * (1 + c * 1e-30))
                return r * 1e-30, None
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
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    t_pad = -(-T // K) * K
    ids = np.arange(S)
    a_self = np.full(S, 0.6, np.float32)
    a_adv = np.where(ids % 3 != 2, 0.4, 0.0).astype(np.float32)
    exit_v = np.zeros(S, np.float32); exit_v[ids % 3 == 2] = 0.2
    w_v = np.zeros(S, np.float32)
    w_raw = rng.random(S // 3).astype(np.float32)
    w_v[ids % 3 == 0] = w_raw / w_raw.sum()
    bands = jnp.asarray(np.stack([a_self, a_adv, exit_v, w_v]))

    e_bm = jnp.asarray(
        np.exp(rng.normal(size=(t_pad, B, S)) - 2).astype(np.float32))
    e_lm = jnp.swapaxes(e_bm, 1, 2)

    run_b, _ = build("batch")
    run_l, _ = build("lane")
    # correctness cross-check first
    rb = jax.jit(run_b)(e_bm, bands)
    rl = jax.jit(run_l)(e_lm, bands)
    print(f"sum check: batch {float(rb):.6f} lane {float(rl):.6f}",
          flush=True)
    dt = timeit(run_b, (e_bm, bands))
    print(f"batch-major (B,S): {dt*1e3:7.3f} ms", flush=True)
    dt = timeit(run_l, (e_lm, bands))
    print(f"lane-major  (S,B): {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
