"""On-chip gate: fused-kernel phone-loop VB-EM == general path.

Runs ``n`` VB steps twice on the bench shape — once with the fused
Pallas E-step (production path) and once with ``_fused_estep_ok``
forced False (general jnp/scan path) — and reports the worst per-frame
ELBO difference.

Gate: ≤ 1e-5/frame.  The two paths intentionally differ in arithmetic:
the fused path propagates with exact-f32 band + rank-1 VPU products and
its loop-back weights are exp(log_exit)·exp(elogw), while the general
path uses the dense matrix exp(log_exit + elogw) and 3-bf16-pass
matmuls — a ~1e-7/entry representation difference that accumulates to
a few 1e-6/frame over T=500 (measured 7.6e-6).  The external
correctness contract is tools/parity_check.py (≤ 1e-4/frame vs CPU
torch f64), which both paths meet.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu.models.phoneloop import PhoneLoop
from beer_tpu.vbi import vb_step

B, T, D = 512, 500, 39
N_UNITS, SPP = 50, 3


def make_model_and_data():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(B, T, D)).astype(np.float32)
    lengths = rng.integers(T // 2, T + 1, size=B)
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.ones(D), size=N_UNITS * SPP,
        cov_type="diagonal", noise_std=0.5, key=jax.random.PRNGKey(1),
    )
    loop = PhoneLoop.create(N_UNITS, SPP, nset)
    return loop, jnp.asarray(data), jnp.asarray(mask)


def trajectory(loop, data, mask, n):
    frames = float(mask.sum())

    @jax.jit
    def run(loop):
        def step(m, _):
            elbo, m = vb_step(m, data, mask=mask)
            return m, elbo
        _, elbos = jax.lax.scan(step, loop, None, length=n)
        return elbos

    return np.asarray(run(loop)) / frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--gate", type=float, default=1e-5)
    args = ap.parse_args()

    loop, data, mask = make_model_and_data()
    fused = trajectory(loop, data, mask, args.steps)
    orig = PhoneLoop._fused_estep_ok
    try:
        PhoneLoop._fused_estep_ok = lambda self: False
        general = trajectory(loop, data, mask, args.steps)
    finally:
        PhoneLoop._fused_estep_ok = orig
    diff = np.abs(fused - general)
    print("fused  :", np.array2string(fused, precision=8))
    print("general:", np.array2string(general, precision=8))
    worst = float(diff.max())
    print(f"worst |Δelbo|/frame = {worst:.3e} (gate {args.gate:g})")
    if worst > args.gate:
        print("GATE FAILED")
        sys.exit(1)
    print("GATE OK")


if __name__ == "__main__":
    main()
