"""K-scaling check for the fused full-covariance GMM E-step.

VERDICT r4 ask #3: the speed-of-light argument
(docs/PERFORMANCE.md "GMM accumulation precision floor") predicts
that at K=64 the (T, 4+D+D²) x (., K) MXU passes idle ~half their
128-wide output lane groups, so a K=128 (or D=80) workload should
raise frames/s x MXU-lane utilization roughly in proportion —
frames/s should *drop by clearly less than 2x* when K doubles
(FLOPs/frame double but lane occupancy doubles too).

Measures full VB-EM epochs (fused kernel route) at a grid of (K, D)
with the robust slope method; prints a JSON table.

Usage: python tools/exp_gmm_kscale.py [--n 262144] [--t 0]
       --t busts the axon compile cache via a fresh frame count.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu.vbi import vb_step

N_SLOPES = 5


def measure(n_frames, k, d, inner=10, outer=4):
    rng = np.random.default_rng(2)
    flat = rng.normal(size=(n_frames, d)).astype(np.float32)
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(d), jnp.eye(d), size=k, cov_type="full",
        noise_std=0.5, key=jax.random.PRNGKey(2),
    )
    gmm = beer_tpu.Mixture.create(nset)
    x = jnp.asarray(flat)

    def make_epochs(n):
        @jax.jit
        def train_epochs_kscale(model, x):
            def body(model, _):
                elbo, model = vb_step(model, x)
                return model, elbo

            model, elbos = jax.lax.scan(body, model, None, length=n)
            return model, elbos[-1]

        return train_epochs_kscale

    def one_call(fn):
        t0 = time.time()
        _, elbo = fn(gmm, x)
        float(elbo)
        return time.time() - t0

    n_small = max(1, inner // 4)
    fb, fs = make_epochs(inner), make_epochs(n_small)
    one_call(fb)
    one_call(fs)
    # auto-rescale so the span dominates tunnel jitter (>=150 ms)
    d0 = one_call(fb) - one_call(fs)
    if d0 < 0.15:
        scale = min(64, max(2, int(np.ceil(0.3 / max(d0, 1e-3)))))
        inner, n_small = inner * scale, n_small * scale
        fb, fs = make_epochs(inner), make_epochs(n_small)
        one_call(fb)
        one_call(fs)
    slopes = []
    for _ in range(N_SLOPES):
        slopes.append((one_call(fb) - one_call(fs)) / (inner - n_small))
    tputs = sorted(n_frames / s for s in slopes)
    return {
        "median": round(float(np.median(tputs)), 1),
        "min": round(tputs[0], 1),
        "max": round(tputs[-1], 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--t", type=int, default=0,
                    help="add to --n (fresh shape busts the stale "
                    "compile cache)")
    ap.add_argument("--grid", default="64x39,128x39,64x80",
                    help="comma list of KxD points")
    args = ap.parse_args()
    n = args.n + args.t

    out = {}
    for point in args.grid.split(","):
        k, d = (int(v) for v in point.split("x"))
        r = measure(n, k, d)
        out[point] = r
        # MAC passes/frame model (docs/PERFORMANCE.md): ELLH pass
        # streams (4+D+D*D) stats into K lanes; lane groups of 128.
        p = 4 + d + d * d
        lanes = -(-k // 128) * 128
        out[point]["model_mac_passes_per_frame"] = p * lanes // 128
        print(f"{point}: {r['median']/1e6:.2f}M frames/s "
              f"[{r['min']/1e6:.2f}, {r['max']/1e6:.2f}]", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
