"""Round-4 GMM kernel accuracy/speed iteration on cluster-shaped data.

The 2-pass (bf16 hi/lo x hi/lo, 4-product) joint fails the trajectory
gate on clustered data with sharpened precisions (worst |dELBO|/frame
0.136 — tools/exp_gmm_traj_check.py): the expanded quadratic form
cancels catastrophically once |x| ~ 6 and E[Lam] grows.  This measures
the 6-product (bf16x6-quality) 4-pass joint against it, on data/model
snapshots taken mid-trajectory (10 exact VB steps first), with f64
oracles.

Variants:
  j2 — current fused_gmm_estep (2-pass joint)
  j4 — 4-pass joint: s1@[w1|w2], s2@[w1|w2], s3@[w1|w2], s1@[w3|w3]
  j4a — j4 + 3-limb accumulation
Timing via chained scan; error vs f64 numpy oracle.
"""

import functools
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

import beer_tpu
from beer_tpu.ops import stats_kernels as sk
from beer_tpu.vbi import vb_step

LOG_2PI = math.log(2.0 * math.pi)
T, D, K = 256_000, 39, 64
TILE = 512


def sharpen_model(x):
    """10 exact VB steps so E[Lam] has realistic (converged) scale."""
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.eye(D), size=K, cov_type="full",
        noise_std=0.5, key=jax.random.PRNGKey(2))
    nset = nset.replace(fused=False)
    gmm = beer_tpu.Mixture.create(nset)
    step = jax.jit(lambda m, x: vb_step(m, x))
    for _ in range(10):
        _, gmm = step(gmm, x)
    return gmm


def oracle(x_np, e_stats64, log_w):
    xd = x_np.astype(np.float64)
    elam = e_stats64[:, : D * D].reshape(K, D, D)
    elin = e_stats64[:, D * D : D * D + D]
    const = (-0.5 * e_stats64[:, -2] + 0.5 * e_stats64[:, -1]
             - 0.5 * D * np.log(2 * np.pi) + log_w)
    quad = np.einsum("td,kde,te->tk", xd, elam, xd)
    joint = -0.5 * quad + xd @ elin.T + const
    m = joint.max(-1, keepdims=True)
    p = np.exp(joint - m)
    s = p.sum(-1, keepdims=True)
    llh64 = (m + np.log(s))[:, 0]
    r64 = p / s
    accxx = np.einsum("tk,td,te->kde", r64, xd, xd).reshape(K, D * D)
    c64 = r64.sum(0)
    acc64 = np.concatenate(
        [-0.5 * accxx, r64.T @ xd, -0.5 * c64[:, None],
         0.5 * c64[:, None]], 1)
    return llh64, acc64, c64


# ----------------------------------------------------------------------
# j4 kernel: 6-product joint (s: 3 limbs, w: 3 limbs)
# ----------------------------------------------------------------------
def _gmm_pack_w3(e_stats, log_w, d):
    pairs = sk._ut_pairs(d)
    elam = e_stats[:, : d * d]
    elin = e_stats[:, d * d : d * d + d]
    const = (-0.5 * e_stats[:, -2] + 0.5 * e_stats[:, -1]
             - 0.5 * d * LOG_2PI + log_w)
    rows = []
    for (i, j) in pairs:
        w = elam[:, i * d + j] * (1.0 if i == j else 2.0)
        rows.append(-0.5 * w)
    w_mat = jnp.stack(rows + [elin[:, j] for j in range(d)] + [const])
    w1 = w_mat.astype(jnp.bfloat16)
    r1 = w_mat - w1.astype(w_mat.dtype)
    w2 = r1.astype(jnp.bfloat16)
    w3 = (r1 - w2.astype(w_mat.dtype)).astype(jnp.bfloat16)
    w12 = jnp.concatenate([w1, w2], axis=1)       # (L, 2K)
    w33 = jnp.concatenate([w3, w3], axis=1)       # (L, 2K) (second half unused)
    return w12, w33


def _split3(s):
    f32 = jnp.float32
    s1 = s.astype(jnp.bfloat16)
    r1 = s - s1.astype(f32)
    s2 = r1.astype(jnp.bfloat16)
    s3 = (r1 - s2.astype(f32)).astype(jnp.bfloat16)
    return s1, s2, s3


def make_j4(acc3: bool):
    def kernel(xcat_ref, m_ref, e1_ref, e2_ref, w12_ref, w33_ref,
               llh_ref, acc_ref, a_acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            a_acc[:] = jnp.zeros_like(a_acc)

        f32 = jnp.float32
        xcat = xcat_ref[:]
        a = jnp.dot(xcat, e1_ref[:], preferred_element_type=f32)
        b = jnp.dot(xcat, e2_ref[:], preferred_element_type=f32)
        s = a * b
        s1, s2, s3 = _split3(s)
        k2 = w12_ref.shape[1]
        k = k2 // 2
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
        r_hi = r.astype(jnp.bfloat16)
        r_lo = (r - r_hi.astype(f32)).astype(jnp.bfloat16)
        rcat = jnp.concatenate([r_hi, r_lo], axis=1)
        dn = (((0,), (0,)), ((), ()))
        a_acc[:] += jax.lax.dot_general(rcat, s1, dn,
                                        preferred_element_type=f32)
        a_acc[:] += jax.lax.dot_general(
            jnp.concatenate([r_hi, jnp.zeros_like(r_hi)], axis=1), s2, dn,
            preferred_element_type=f32)
        if acc3:
            a_acc[:] += jax.lax.dot_general(
                jnp.concatenate([r_hi, jnp.zeros_like(r_hi)], axis=1), s3,
                dn, preferred_element_type=f32)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            acc_ref[:] = a_acc[:]

    return kernel


def j4_estep(x, e_stats, log_w, acc3=False):
    d, k = D, K
    pairs = sk._ut_pairs(d)
    n_ut = len(pairs)
    L = n_ut + d + 1
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    x_aug = jnp.concatenate([x, ones], axis=-1)
    h1, h2, h3 = sk._split3_bf16(x_aug)
    xcat = jnp.concatenate([h1, h2, h3], axis=-1)
    w12, w33 = _gmm_pack_w3(e_stats, log_w, d)
    e1_np, e2_np = sk._gmm_selectors(d)
    e1 = jnp.asarray(e1_np, jnp.bfloat16)
    e2 = jnp.asarray(e2_np, jnp.bfloat16)
    xcat_p, t = sk._pad_time(xcat, TILE)
    mask = jnp.ones((t, 1), jnp.float32)
    mask_p, _ = sk._pad_time(mask, TILE)
    grid = (xcat_p.shape[0] // TILE,)
    llh, acc_raw = pl.pallas_call(
        make_j4(acc3),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, xcat.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
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
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * k, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((xcat_p.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((2 * k, L), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2 * k, L), jnp.float32)],
    )(xcat_p, mask_p, e1, e2, w12, w33)
    acc_s = acc_raw[:k] + acc_raw[k:]
    acc_xx = acc_s[:, jnp.asarray(sk._ut_unpack_index(d))]
    acc_x = acc_s[:, n_ut : n_ut + d]
    counts = acc_s[:, n_ut + d]
    c = counts[:, None]
    acc = jnp.concatenate([-0.5 * acc_xx, acc_x, -0.5 * c, 0.5 * c], axis=1)
    return llh[:t, 0], acc, counts


def timeit(fn, x):
    def harness(inner):
        @jax.jit
        def g(x):
            def step(c, _):
                xp = x * (1.0 + c * 1e-30)
                llh, acc, counts = fn(xp)
                return (llh.sum() + acc.sum() + counts.sum()) * 1e-30, None
            c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=inner)
            return c
        return g

    f1, f2 = harness(4), harness(12)
    float(f1(x)); float(f2(x))

    def t(f):
        t0 = time.time()
        for _ in range(3):
            float(f(x))
        return (time.time() - t0) / 3

    return (t(f2) - t(f1)) / 8


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(8, D)) * 2.0
    x_np = (centers[rng.integers(0, 8, size=T)]
            + rng.normal(size=(T, D))).astype(np.float32)
    x = jnp.asarray(x_np)
    print("sharpening model (10 exact VB steps)...", flush=True)
    gmm = sharpen_model(x)
    e_stats = gmm.modelset.means_precisions.expected_sufficient_statistics()
    log_w = gmm.categorical.expected_log_weights()
    e64 = np.asarray(e_stats, np.float64)
    lw64 = np.asarray(log_w, np.float64)
    print("f64 oracle...", flush=True)
    llh64, acc64, c64 = oracle(x_np, e64, lw64)

    variants = {
        "j2": lambda xp: sk.fused_gmm_estep(xp, e_stats, log_w, D),
        "j4": lambda xp: j4_estep(xp, e_stats, log_w, acc3=False),
        "j4a": lambda xp: j4_estep(xp, e_stats, log_w, acc3=True),
    }
    for name, fn in variants.items():
        llh, acc, counts = map(np.asarray, jax.jit(fn)(x))
        dt = timeit(fn, x)
        print(f"{name}: {dt*1e3:.3f} ms ({T/dt/1e6:.1f}M f/s) "
              f"llh_max={np.abs(llh - llh64).max():.2e} "
              f"elbo/fr={abs(llh.sum() - llh64.sum())/T:.2e} "
              f"acc_rel={np.abs(acc - acc64).max()/np.abs(acc64).max():.2e} "
              f"cnt_rel={np.abs(counts - c64).max()/c64.max():.2e}",
              flush=True)


if __name__ == "__main__":
    main()
