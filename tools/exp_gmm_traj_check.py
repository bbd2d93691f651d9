"""Fused-vs-exact GMM VB-EM trajectory drift at the bench shape.

Runs 15 vb_step iterations at (T=128k, D=39, K=64) twice on the default
device — once through the fused single-kernel E-step route
(NormalSet.fused=True) and once through the exact XLA route — and
prints the per-iteration |dELBO|/frame.  Gate: worst <= 1e-4 (the
BASELINE parity budget).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import numpy as np
import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu.vbi import vb_step

T, D, K = 128_000, 39, 64


def main():
    # NOTE: the axon sidechannel compile cache has been observed serving
    # STALE executables across kernel-source changes (round 4: two runs
    # of this tool bracketing a Pallas kernel rewrite returned
    # bit-identical trajectories).  Pass a fresh --t after touching the
    # kernel so the compile key cannot collide with an older binary.
    global T
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=T)
    ap.add_argument("--routes", default="new,exact",
                    help="comma list of {new, old, exact}: new = "
                    "fused_gmm_estep single kernel; old = round-3 "
                    "fused_ellh_full + fused_accumulate_full (HIGHEST); "
                    "exact = pure-XLA reference")
    args = ap.parse_args()
    T = args.t
    routes = args.routes.split(",")
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(8, D)) * 2.0
    x_np = (centers[rng.integers(0, 8, size=T)]
            + rng.normal(size=(T, D))).astype(np.float32)
    x = jnp.asarray(x_np)

    from beer_tpu.models.mixture import Mixture

    def make(fused):
        nset = beer_tpu.NormalSet.create(
            jnp.zeros(D), jnp.eye(D), size=K, cov_type="full",
            noise_std=0.5, key=jax.random.PRNGKey(2))
        nset = nset.replace(fused=fused)
        return beer_tpu.Mixture.create(nset)

    orig_gate = Mixture._fused_gmm
    step = jax.jit(lambda m, x: vb_step(m, x))
    trajs = {}
    for route in routes:
        # 'old' keeps modelset.fused=True (fused_ellh_full +
        # fused_accumulate_full kernels) but disables the single-kernel
        # E-step gate; jit must be rebuilt: the gate is trace-time.
        Mixture._fused_gmm = (
            (lambda self: False) if route == "old" else orig_gate)
        step_r = jax.jit(lambda m, x: vb_step(m, x))
        m = make(route != "exact")
        elbos = []
        for i in range(15):
            e, m = step_r(m, x)
            elbos.append(float(e) / T)
        trajs[route] = np.array(elbos)
        print(route, " ".join(f"{v:.6f}" for v in elbos), flush=True)
        mono = max(
            (elbos[i] - elbos[i + 1] for i in range(3, len(elbos) - 1)),
            default=0.0)
        print(f"  worst monotonicity violation after iter 3: {mono:.6f}",
              flush=True)
    Mixture._fused_gmm = orig_gate
    if "exact" in trajs:
        for route in routes:
            if route == "exact":
                continue
            d = np.abs(trajs[route] - trajs["exact"])
            print(f"{route}: worst |dELBO|/frame vs exact: {d.max():.6f} "
                  f"final-5 mean gap: "
                  f"{abs(trajs[route][-5:].mean() - trajs['exact'][-5:].mean()):.6f}")


if __name__ == "__main__":
    main()
