"""On-chip gate for the stats-streaming lane-major E-step
(BEER_FUSE_ELLH): llh computed in VMEM by both kernels vs the llh
stream produced by the XLA einsum.  See
pallas_scan._make_fwd_llh_ckpt_kernel_lm / docs/PERFORMANCE.md — the
batch-major fuse_ellh measured as a loss; this re-gates it in the
lane-major + fuse_acc configuration where llh's write and both reads
(~450 MB at the bench shape) disappear."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu.models.phoneloop import PhoneLoop
from beer_tpu.ops import pallas_scan
from beer_tpu.vbi import vb_step

B, T, D, UNITS, SPU = 512, 500, 39, 50, 3


def make_model_data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    lengths = rng.integers(T // 2, T + 1, size=B)
    m = jnp.asarray(
        (np.arange(T)[None] < lengths[:, None]).astype(np.float32))
    ns = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.ones(D), size=UNITS * SPU, cov_type="diagonal",
        noise_std=0.5, key=jax.random.PRNGKey(1))
    return PhoneLoop.create(UNITS, SPU, ns), x, m


def trajectory_and_time(fuse_ellh, model, x, m, steps=8, n1=5, n2=20,
                        outer=3):
    pallas_scan.FUSE_ACC = True
    pallas_scan.FUSE_ELLH = fuse_ellh

    def chain(n):
        @jax.jit
        def run(model, x, m):
            def body(model, _):
                elbo, model = vb_step(model, x, mask=m)
                return model, elbo
            return jax.lax.scan(body, model, None, length=n)
        return run

    _, elbos = chain(steps)(model, x, m)
    elbos = np.asarray(elbos)

    f1, f2 = chain(n1), chain(n2)
    float(f1(model, x, m)[1][-1]); float(f2(model, x, m)[1][-1])

    def run(f):
        t0 = time.time()
        for _ in range(outer):
            float(f(model, x, m)[1][-1])
        return (time.time() - t0) / outer

    dt = (run(f2) - run(f1)) / (n2 - n1)
    return elbos, dt


def main():
    print("devices:", jax.devices(), flush=True)
    model, x, m = make_model_data()
    frames = float(m.sum())
    e_off, dt_off = trajectory_and_time(False, model, x, m)
    print(f"acc only (llh stream): {dt_off*1e3:7.3f} ms/epoch "
          f"({frames/dt_off/1e6:.1f}M frames/s)", flush=True)
    e_on, dt_on = trajectory_and_time(True, model, x, m)
    print(f"acc + fused ELLH     : {dt_on*1e3:7.3f} ms/epoch "
          f"({frames/dt_on/1e6:.1f}M frames/s)", flush=True)
    worst = np.max(np.abs(e_on - e_off)) / frames
    print(f"trajectory |dELBO|/frame worst over 8 steps: {worst:.3e}",
          flush=True)
    print("GATE:", "FUSE_ELLH wins" if dt_on < dt_off else
          "FUSE_ELLH loses", flush=True)


if __name__ == "__main__":
    main()
