"""Reproduce the real forward kernel's cost from pieces.

Start from recursion+stream (1.2 ms) and add the production kernel's
remaining ops one at a time to find the unexplained ~0.9 ms:
* base      — stream (K,B,150) + _dot3 recursion + normalize
* +exp      — in-kernel exp(llh − rowmax) with mask blend (lens compare)
* +logz     — per-step log(norm) accumulated into a (B,1) carry
* +ckpt     — block-entry checkpoint output (n_blocks,B,S) + last/logz outs
* full      — all of the above (== production forward_llh_ckpt_pass shape)
* prod      — the actual forward_llh_ckpt_pass for comparison
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

from beer_tpu.ops import pallas_scan
from beer_tpu.ops.pallas_scan import (_split_bf16, _dot3, _exp_tile,
                                      _shift_right)

B, T, S = 512, 500, 150
K = 8


def build(mode):
    t_pad = -(-T // K) * K
    n_blocks = t_pad // K
    idx = lambda t: (t, 0, 0)
    use_exp = mode in ("+exp", "+logz", "+ckpt", "full", "banded")
    use_logz = mode in ("+logz", "+ckpt", "full", "banded")
    use_ckpt = mode in ("+ckpt", "full", "banded")
    use_band = mode == "banded"

    def kernel(*refs):
        x_ref, len_ref, trans_ref = refs[:3]
        i = 3
        if use_ckpt:
            ckpt_out, last_out, logz_out = refs[i:i + 3]
            i += 3
        else:
            out_ref = refs[i]; i += 1
        carry = refs[i]; i += 1
        carry_z = refs[i] if use_logz else None

        pid = pl.program_id(0)
        tiny = jnp.finfo(jnp.float32).tiny

        @pl.when(pid == 0)
        def _():
            carry[:] = jnp.full_like(carry, 1.0 / S)
            if use_logz:
                carry_z[:] = jnp.zeros_like(carry_z)

        p = carry[:]
        z = carry_z[:] if use_logz else None
        if use_ckpt:
            ckpt_out[0] = p.astype(ckpt_out.dtype)
        t_hi, t_lo = _split_bf16(trans_ref[:])
        if use_band:
            a_self = trans_ref[0:1, :]
            a_adv = trans_ref[1:2, :]
            exit_v = trans_ref[2:3, :]
            w_v = trans_ref[3:4, :]
        lens = len_ref[:].astype(jnp.float32)
        t0 = (pid * K).astype(jnp.float32)
        for k in range(K):
            x = x_ref[k].astype(jnp.float32)
            if use_exp:
                m_t = (lens > t0 + k).astype(jnp.float32)
                e, mllh = _exp_tile(x, m_t)
            else:
                e = jnp.exp(x - x.max(-1, keepdims=True))
                m_t = None
            if use_band:
                q = (p * exit_v).sum(-1, keepdims=True)
                prop = p * a_self + _shift_right(p * a_adv) + q * w_v
            else:
                prop = _dot3(p, t_hi, t_lo)
            raw = prop * e
            norm = jnp.maximum(raw.sum(-1, keepdims=True), tiny)
            new_p = raw / norm
            if use_exp:
                keep = m_t
                if k == 0:
                    keep = jnp.where(pid == 0, 1.0, keep)
                p = keep * new_p + (1.0 - keep) * p
            else:
                p = new_p
            if use_logz:
                z = z + (keep if use_exp else 1.0) * jnp.log(norm) \
                    + (mllh if use_exp else 0.0)
        carry[:] = p
        if use_logz:
            carry_z[:] = z
        if use_ckpt:
            last_out[0] = p.astype(last_out.dtype)
            logz_out[0] = z.astype(logz_out.dtype)
        else:
            out_ref[0] = p.astype(out_ref.dtype)

    big = pl.BlockSpec((K, B, S), idx, memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0),
                                        memory_space=pltpu.VMEM)
    fixed_one = pl.BlockSpec((1, B, S), lambda t: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    fixed_small = pl.BlockSpec((1, B, 1), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM)

    def run(x, lens, trans):
        scratch = [pltpu.VMEM((B, S), jnp.float32)]
        if use_logz:
            scratch.append(pltpu.VMEM((B, 1), jnp.float32))
        if use_ckpt:
            out_specs = [pl.BlockSpec((1, B, S), idx,
                                      memory_space=pltpu.VMEM),
                         fixed_one, fixed_small]
            out_shape = [
                jax.ShapeDtypeStruct((n_blocks, B, S), jnp.float32),
                jax.ShapeDtypeStruct((1, B, S), jnp.float32),
                jax.ShapeDtypeStruct((1, B, 1), jnp.float32),
            ]
        else:
            out_specs = fixed_one
            out_shape = jax.ShapeDtypeStruct((1, B, S), jnp.float32)
        out = pl.pallas_call(
            kernel, grid=(n_blocks,),
            in_specs=[big, const2((B, 1)), const2((S, S))],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, lens, trans)
        if use_ckpt:
            return out[0][-1] + out[1][0] + out[2][0]
        return out[0]

    return run


def prod(x, lens, trans):
    mask = (jnp.arange(T)[None, :]
            < lens[:, 0:1]).astype(jnp.float32)
    iv = jnp.full((B, S), 1.0 / S, jnp.float32)
    ck, last, zb = pallas_scan.forward_llh_ckpt_pass(
        x[:T], trans, iv, mask)
    return ck[-1] + last + zb[:, None]


def timeit(fn, args, n1=4, n2=16, outer=3):
    # perturb the (S, S) transition matrix, NOT the big stream: a big-
    # array perturbation makes XLA materialize a full temp before the
    # pallas_call (~0.5 ms of phantom stream at the bench shape)
    def chain(inner):
        @jax.jit
        def run(x, lens, trans):
            def step(c, _):
                r = fn(x, lens, trans * (1 + c * 1e-30))
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
    lengths = rng.integers(T // 2, T + 1, size=B).astype(np.float32)
    lens = jnp.asarray(lengths)[:, None]
    trans = jnp.asarray(np.abs(rng.normal(size=(S, S))).astype(np.float32))
    trans = trans / trans.sum(-1, keepdims=True)
    for mode in ("full", "banded"):
        dt = timeit(build(mode), (x, lens, trans))
        print(f"{mode}: {dt*1e3:.3f} ms", flush=True)
    dt = timeit(prod, (x, lens, trans))
    print(f"prod: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
