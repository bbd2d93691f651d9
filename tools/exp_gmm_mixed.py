"""Attribution: packed 4-pass joint + HIGHEST accumulation.

The retracted j4 variant packed BOTH hot matmuls into bf16 limb passes
and failed the trajectory gate.  Theory (docs/PERFORMANCE.md): the
accumulation's 16-bit responsibility limbs were the oscillation driver
(covariance-cancellation amplification), while the joint's 6-limb
products should be bf16x6-quality.  This tests the mixed kernel: j4
packed joint (4 DEFAULT passes, 2K lanes) + HIGHEST r^T @ S, via a
monkeypatch of stats_kernels.fused_gmm_estep, running the same
fused-vs-exact VB trajectory + timing as the other tools.

Run with a FRESH --t (compile-cache staleness).
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import beer_tpu
from beer_tpu.ops import stats_kernels as sk
from beer_tpu.vbi import vb_step

D, K = 39, 64


def _pack_w3(w_mat):
    w1 = w_mat.astype(jnp.bfloat16)
    r1 = w_mat - w1.astype(w_mat.dtype)
    w2 = r1.astype(jnp.bfloat16)
    w3 = (r1 - w2.astype(w_mat.dtype)).astype(jnp.bfloat16)
    return (jnp.concatenate([w1, w2], axis=1),
            jnp.concatenate([w3, w3], axis=1))


def _kernel(xcat_ref, m_ref, e1_ref, e2_ref, w12_ref, w33_ref,
            llh_ref, acc_ref, a_acc):
    @pl.when(pl.program_id(0) == 0)
    def _():
        a_acc[:] = jnp.zeros_like(a_acc)

    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    xcat = xcat_ref[:]
    a = jnp.dot(xcat, e1_ref[:], preferred_element_type=f32)
    b = jnp.dot(xcat, e2_ref[:], preferred_element_type=f32)
    s = a * b
    s1 = s.astype(jnp.bfloat16)
    r1_ = s - s1.astype(f32)
    s2 = r1_.astype(jnp.bfloat16)
    s3 = (r1_ - s2.astype(f32)).astype(jnp.bfloat16)
    k = w12_ref.shape[1] // 2
    j1 = jnp.dot(s1, w12_ref[:], preferred_element_type=f32)
    j2 = jnp.dot(s2, w12_ref[:], preferred_element_type=f32)
    j3 = jnp.dot(s3, w12_ref[:], preferred_element_type=f32)
    j4 = jnp.dot(s1, w33_ref[:], preferred_element_type=f32)
    joint = (((j3[:, :k] + j4[:, :k]) + (j2[:, :k] + j2[:, k:]))
             + (j1[:, :k] + j1[:, k:]))
    msk = m_ref[:]
    m = jnp.max(joint, axis=-1, keepdims=True)
    p = jnp.exp(joint - m)
    ssum = jnp.sum(p, axis=-1, keepdims=True)
    llh_ref[:] = (m + jnp.log(ssum)) * msk
    r = (p / ssum) * msk
    dn = (((0,), (0,)), ((), ()))
    a_acc[:] += jax.lax.dot_general(r, s, dn, precision=hi,
                                    preferred_element_type=f32)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        acc_ref[:] = a_acc[:]


def mixed_estep(x, e_stats, log_w, dim, mask=None, interpret=False):
    d, k = dim, e_stats.shape[0]
    xcat, w_mat, n_ut = sk._gmm_pack_inputs(x, e_stats, log_w, d)
    w12, w33 = _pack_w3(w_mat)
    L = n_ut + d + 1
    e1_np, e2_np = sk._gmm_selectors(d)
    e1 = jnp.asarray(e1_np, jnp.bfloat16)
    e2 = jnp.asarray(e2_np, jnp.bfloat16)
    tile = sk.GMM_TILE_T
    xcat_p, t = sk._pad_time(xcat, tile)
    if mask is None:
        mask = jnp.ones((t, 1), jnp.float32)
    else:
        mask = mask.reshape(t, 1).astype(jnp.float32)
    mask_p, _ = sk._pad_time(mask, tile)
    grid = (xcat_p.shape[0] // tile,)
    llh, acc_raw = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, xcat.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e1.shape[0], L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e2.shape[0], L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 2 * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 2 * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((xcat_p.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((k, L), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((k, L), jnp.float32)],
        interpret=interpret,
    )(xcat_p, mask_p, e1, e2, w12, w33)
    acc_s = acc_raw
    acc_xx = acc_s[:, jnp.asarray(sk._ut_unpack_index(d))]
    acc_x = acc_s[:, n_ut : n_ut + d]
    counts = acc_s[:, n_ut + d]
    c = counts[:, None]
    acc = jnp.concatenate([-0.5 * acc_xx, acc_x, -0.5 * c, 0.5 * c],
                          axis=1)
    return llh[:t, 0], acc, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=122_880)
    T = ap.parse_args().t
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(8, D)) * 2.0
    x = jnp.asarray((centers[rng.integers(0, 8, size=T)]
                     + rng.normal(size=(T, D))).astype(np.float32))

    sk.fused_gmm_estep = mixed_estep  # route Mixture through the variant

    def make(fused):
        nset = beer_tpu.NormalSet.create(
            jnp.zeros(D), jnp.eye(D), size=K, cov_type="full",
            noise_std=0.5, key=jax.random.PRNGKey(2))
        return beer_tpu.Mixture.create(nset.replace(fused=fused))

    trajs = {}
    for name, fused in (("mixed", True), ("exact", False)):
        step = jax.jit(lambda m, x: vb_step(m, x))
        m = make(fused)
        elbos = []
        for _ in range(15):
            e, m = step(m, x)
            elbos.append(float(e) / T)
        trajs[name] = np.array(elbos)
        mono = max(elbos[i] - elbos[i + 1] for i in range(3, 14))
        print(name, " ".join(f"{v:.6f}" for v in elbos), flush=True)
        print(f"  worst monotonicity violation after iter 3: {mono:.6f}",
              flush=True)
    d = np.abs(trajs["mixed"] - trajs["exact"])
    print(f"mixed: worst |dELBO|/frame vs exact: {d.max():.6f}", flush=True)

    # timing
    nset = make(True).modelset
    e_stats = nset.means_precisions.expected_sufficient_statistics()
    lw = jnp.log(jnp.full(K, 1.0 / K))

    def harness(inner):
        @jax.jit
        def g(x):
            def stepf(c, _):
                llh, acc, cnt = mixed_estep(
                    x * (1.0 + c * 1e-30), e_stats, lw, D)
                return (llh.sum() + acc.sum() + cnt.sum()) * 1e-30, None
            c, _ = jax.lax.scan(stepf, jnp.float32(0.0), None,
                                length=inner)
            return c
        return g

    f1, f2 = harness(4), harness(12)
    float(f1(x)); float(f2(x))

    def t(f):
        t0 = time.time()
        for _ in range(3):
            float(f(x))
        return (time.time() - t0) / 3

    dt = (t(f2) - t(f1)) / 8
    print(f"mixed estep: {dt*1e3:.3f} ms ({T/dt/1e6:.1f}M frames/s)",
          flush=True)


if __name__ == "__main__":
    main()
