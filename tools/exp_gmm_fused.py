"""Variants of a fully-fused GMM E-step kernel, timed on the real chip.

Bench config 1 (GMM full-cov D=39 K=64) sits at 17.9M frames/s / 3.65%
MFU because the E-step runs as two kernels (fused_ellh_full +
fused_accumulate_full) that EACH build the (T, D^2) xx^T block with a
39-piece lane concat, run every matmul at HIGHEST (6-pass bf16), and
round-trip the (T, K) responsibilities through HBM.  This experiment
measures single-kernel fusions:

  v1_xx   — xx^T built once per tile (_flat_outer), llh + softmax +
            resp-weighted accumulators all in VMEM.
  v3_sel  — xx^T built by two selector matmuls A = x@E1, B = x@E2,
            xx = A*B (MXU does the lane broadcast instead of the VPU).
  v4_slice— no xx^T at all: Y = x @ M (D, D*K), quad via 39 aligned
            (Tt, K) slice-FMAs; accumulate via Z (Tt, D*K) slice build
            + Z^T @ x, reordered to (K, D^2) outside the kernel.

each at precision HIGH / HIGHEST and TILE_T 256 / 512, against the
current two-kernel path, with f64 numpy oracle error per variant.
"""

import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_2PI = math.log(2.0 * math.pi)
B, T, D = 512, 500, 39
K = 64
HI = jax.lax.Precision.HIGHEST
H3 = jax.lax.Precision.HIGH


def _flat_outer(x):
    d = x.shape[-1]
    return jnp.concatenate([x[:, i : i + 1] * x for i in range(d)], axis=1)


# ----------------------------------------------------------------------
# shared kernel tail: softmax + accumulators.  quad_lin = joint (Tt, K)
# ----------------------------------------------------------------------
def _softmax_resps(joint, msk):
    m = jnp.max(joint, axis=-1, keepdims=True)
    p = jnp.exp(joint - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    llh = (m + jnp.log(s)) * msk
    r = (p / s) * msk
    return llh, r


def make_v1(d, k, tile, prec):
    p_stats = d * d + d + 2

    def kernel(x_ref, m_ref, wq_ref, wl_ref, cb_ref, llh_ref, acc_ref,
               a_xx, a_x, a_c):
        @pl.when(pl.program_id(0) == 0)
        def _():
            a_xx[:] = jnp.zeros_like(a_xx)
            a_x[:] = jnp.zeros_like(a_x)
            a_c[:] = jnp.zeros_like(a_c)

        x = x_ref[:]
        msk = m_ref[:]
        xx = _flat_outer(x)
        quad = jnp.dot(xx, wq_ref[:], preferred_element_type=jnp.float32,
                       precision=prec)
        lin = jnp.dot(x, wl_ref[:], preferred_element_type=jnp.float32,
                      precision=prec)
        joint = quad + lin + cb_ref[:]
        llh, r = _softmax_resps(joint, msk)
        llh_ref[:] = llh
        a_xx[:] += jnp.dot(r.T, xx, preferred_element_type=jnp.float32,
                           precision=prec)
        a_x[:] += jnp.dot(r.T, x, preferred_element_type=jnp.float32,
                          precision=prec)
        a_c[:] += jnp.sum(r, axis=0, keepdims=True)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            c = a_c[:].T
            acc_ref[:] = jnp.concatenate(
                [-0.5 * a_xx[:], a_x[:], -0.5 * c, 0.5 * c], axis=1)

    def run(x, msk, wq, wl, cb):
        tp = x.shape[0]
        grid = (tp // tile,)
        llh, acc = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[
                pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d * d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, p_stats), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((tp, 1), jnp.float32),
                jax.ShapeDtypeStruct((k, p_stats), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((k, d * d), jnp.float32),
                pltpu.VMEM((k, d), jnp.float32),
                pltpu.VMEM((1, k), jnp.float32),
            ],
        )(x, msk, wq, wl, cb)
        return llh[:, 0], acc

    return run


def make_v3(d, k, tile, prec):
    """xx^T via two selector matmuls (exact at >=HIGH: bf16x3 splits
    reconstruct f32 against a 0/1 operand)."""
    p_stats = d * d + d + 2

    def kernel(x_ref, m_ref, e1_ref, e2_ref, wq_ref, wl_ref, cb_ref,
               llh_ref, acc_ref, a_xx, a_x, a_c):
        @pl.when(pl.program_id(0) == 0)
        def _():
            a_xx[:] = jnp.zeros_like(a_xx)
            a_x[:] = jnp.zeros_like(a_x)
            a_c[:] = jnp.zeros_like(a_c)

        x = x_ref[:]
        msk = m_ref[:]
        a = jnp.dot(x, e1_ref[:], preferred_element_type=jnp.float32,
                    precision=H3)
        b = jnp.dot(x, e2_ref[:], preferred_element_type=jnp.float32,
                    precision=H3)
        xx = a * b
        quad = jnp.dot(xx, wq_ref[:], preferred_element_type=jnp.float32,
                       precision=prec)
        lin = jnp.dot(x, wl_ref[:], preferred_element_type=jnp.float32,
                      precision=prec)
        joint = quad + lin + cb_ref[:]
        llh, r = _softmax_resps(joint, msk)
        llh_ref[:] = llh
        a_xx[:] += jnp.dot(r.T, xx, preferred_element_type=jnp.float32,
                           precision=prec)
        a_x[:] += jnp.dot(r.T, x, preferred_element_type=jnp.float32,
                          precision=prec)
        a_c[:] += jnp.sum(r, axis=0, keepdims=True)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            c = a_c[:].T
            acc_ref[:] = jnp.concatenate(
                [-0.5 * a_xx[:], a_x[:], -0.5 * c, 0.5 * c], axis=1)

    e1 = np.zeros((d, d * d), np.float32)   # A[t, i*d+j] = x_i
    e2 = np.zeros((d, d * d), np.float32)   # B[t, i*d+j] = x_j
    for i in range(d):
        for j in range(d):
            e1[i, i * d + j] = 1.0
            e2[j, i * d + j] = 1.0
    e1, e2 = jnp.asarray(e1), jnp.asarray(e2)

    def run(x, msk, wq, wl, cb):
        tp = x.shape[0]
        grid = (tp // tile,)
        llh, acc = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[
                pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d * d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, p_stats), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((tp, 1), jnp.float32),
                jax.ShapeDtypeStruct((k, p_stats), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((k, d * d), jnp.float32),
                pltpu.VMEM((k, d), jnp.float32),
                pltpu.VMEM((1, k), jnp.float32),
            ],
        )(x, msk, e1, e2, wq, wl, cb)
        return llh[:, 0], acc

    return run


def make_v4(d, k, tile, prec):
    """No xx^T: Y = x @ M with M[e, i*K+k] = E[Lam_k]_ie; quad via D
    aligned slice-FMAs; accumulate Z^T @ x with Z[t, i*K+k] = r*x_i,
    reordered outside."""

    def kernel(x_ref, m_ref, mm_ref, wl_ref, cb_ref, llh_ref, acc2_ref,
               accx_ref, a_2, a_x, a_c):
        @pl.when(pl.program_id(0) == 0)
        def _():
            a_2[:] = jnp.zeros_like(a_2)
            a_x[:] = jnp.zeros_like(a_x)
            a_c[:] = jnp.zeros_like(a_c)

        x = x_ref[:]
        msk = m_ref[:]
        y = jnp.dot(x, mm_ref[:], preferred_element_type=jnp.float32,
                    precision=prec)                      # (Tt, D*K)
        quad = jnp.zeros((x.shape[0], k), jnp.float32)
        for i in range(d):
            quad += x[:, i : i + 1] * y[:, i * k : (i + 1) * k]
        lin = jnp.dot(x, wl_ref[:], preferred_element_type=jnp.float32,
                      precision=prec)
        joint = -0.5 * quad + lin + cb_ref[:]
        llh, r = _softmax_resps(joint, msk)
        llh_ref[:] = llh
        z_parts = [r * x[:, i : i + 1] for i in range(d)]
        z = jnp.concatenate(z_parts, axis=1)             # (Tt, D*K)
        a_2[:] += jnp.dot(z.T, x, preferred_element_type=jnp.float32,
                          precision=prec)                # (D*K, D)
        a_x[:] += jnp.dot(r.T, x, preferred_element_type=jnp.float32,
                          precision=prec)
        a_c[:] += jnp.sum(r, axis=0, keepdims=True)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            acc2_ref[:] = a_2[:]
            accx_ref[:] = jnp.concatenate(
                [a_x[:], a_c[:].T], axis=1)

    def run(x, msk, mm, wl, cb):
        tp = x.shape[0]
        grid = (tp // tile,)
        llh, acc2, accx = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[
                pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d * k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d * k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, d + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((tp, 1), jnp.float32),
                jax.ShapeDtypeStruct((d * k, d), jnp.float32),
                jax.ShapeDtypeStruct((k, d + 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((d * k, d), jnp.float32),
                pltpu.VMEM((k, d), jnp.float32),
                pltpu.VMEM((1, k), jnp.float32),
            ],
        )(x, msk, mm, wl, cb)
        # reorder acc2 (i*K+k, e) -> (k, i*D+e) outside the kernel
        a2 = acc2.reshape(d, k, d).transpose(1, 0, 2).reshape(k, d * d)
        c = accx[:, d:]
        acc = jnp.concatenate([-0.5 * a2, accx[:, :d], -0.5 * c, 0.5 * c],
                              axis=1)
        return llh[:, 0], acc

    return run


# ----------------------------------------------------------------------
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, nargs=2, default=[4, 12])
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--variants", default="v1,v3,v4")
    ap.add_argument("--tiles", default="256,512")
    ap.add_argument("--precisions", default="high,highest")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n = B * T
    x_np = rng.normal(size=(n, D)).astype(np.float32)

    # realistic expected natural parameters from a NormalSet posterior
    import beer_tpu
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.eye(D), size=K, cov_type="full",
        noise_std=0.5, key=jax.random.PRNGKey(2))
    e_stats = np.asarray(
        nset.means_precisions.expected_sufficient_statistics(), np.float64)
    log_w = np.log(np.full(K, 1.0 / K))

    elam = e_stats[:, : D * D]                       # (K, D^2) E[Lam] flat
    elin = e_stats[:, D * D : D * D + D]             # (K, D)   E[Lam mu]
    const = (-0.5 * e_stats[:, -2] + 0.5 * e_stats[:, -1]
             - 0.5 * D * LOG_2PI + log_w)            # (K,)

    # f64 oracle
    xd = x_np.astype(np.float64)
    quad = np.einsum("td,kde,te->tk", xd, elam.reshape(K, D, D), xd)
    joint = -0.5 * quad + xd @ elin.T + const
    m = joint.max(-1, keepdims=True)
    p = np.exp(joint - m)
    s = p.sum(-1, keepdims=True)
    llh64 = (m + np.log(s))[:, 0]
    r64 = p / s
    accxx = np.einsum("tk,td,te->kde", r64, xd, xd).reshape(K, D * D)
    c64 = r64.sum(0)
    acc64 = np.concatenate(
        [-0.5 * accxx, r64.T @ xd, -0.5 * c64[:, None], 0.5 * c64[:, None]], 1)

    x = jnp.asarray(x_np)
    msk = jnp.ones((n, 1), jnp.float32)
    wq = jnp.asarray((-0.5 * elam.T).astype(np.float32))   # (D^2, K)
    wl = jnp.asarray(elin.T.astype(np.float32))            # (D, K)
    cb = jnp.asarray(const[None, :].astype(np.float32))    # (1, K)
    mm = jnp.asarray(                                      # (D, D*K) for v4
        elam.reshape(K, D, D).transpose(2, 1, 0).reshape(D, D * K)
        .astype(np.float32))
    # mm[e, i*K+k] = elam[k, i*D+e]  (v4 contracts x_e, slices i)

    makers = {"v1": make_v1, "v3": make_v3, "v4": make_v4}
    precs = {"high": H3, "highest": HI, "default": jax.lax.Precision.DEFAULT}

    def harness(run, wmat, inner):
        @jax.jit
        def f(x):
            def step(c, _):
                xp = x * (1.0 + c * 1e-30)
                llh, acc = run(xp, msk, wmat, wl, cb)
                return (llh.sum() + sum(jnp.sum(v) for v in
                                        jax.tree.leaves(acc))) * 1e-30, None
            c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=inner)
            return c
        return f

    n1, n2 = args.inner
    results = {}
    for vname in args.variants.split(","):
        for tile in map(int, args.tiles.split(",")):
            for pname in args.precisions.split(","):
                maker = makers[vname]
                run = maker(D, K, tile, precs[pname])
                wmat = mm if vname == "v4" else wq
                try:
                    llh, acc = jax.jit(
                        lambda x: run(x, msk, wmat, wl, cb))(x)
                    llh, acc = np.asarray(llh), np.asarray(acc)
                except Exception as e:
                    print(f"{vname}/t{tile}/{pname}: FAILED {type(e).__name__}: {e}")
                    continue
                err_llh = np.abs(llh - llh64).max()
                err_elbo = abs(llh.sum() - llh64.sum()) / n
                scale = np.abs(acc64).max()
                err_acc = np.abs(acc - acc64).max() / scale
                f1 = harness(run, wmat, n1)
                f2 = harness(run, wmat, n2)
                float(f1(x)); float(f2(x))
                def t(f):
                    t0 = time.time()
                    for _ in range(args.outer):
                        float(f(x))
                    return (time.time() - t0) / args.outer
                dt = (t(f2) - t(f1)) / (n2 - n1)
                key = f"{vname}/t{tile}/{pname}"
                results[key] = dict(ms=round(dt * 1e3, 3),
                                    mfps=round(n / dt / 1e6, 1),
                                    err_llh=float(err_llh),
                                    err_elbo_pf=float(err_elbo),
                                    err_acc_rel=float(err_acc))
                print(f"{key}: {dt*1e3:.3f} ms ({n/dt/1e6:.1f}M f/s) "
                      f"|dllh|max={err_llh:.2e} |delbo|/f={err_elbo:.2e} "
                      f"|dacc|rel={err_acc:.2e}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
