"""Robust headline measurement: phone-loop VB E-step frames/s.

Standalone (no bench.py import) so it can run unchanged against any
checkout of the tree — used to settle the round-3 -> round-4 headline
drift (VERDICT r4 ask #1).  Reports median/min/max over N independent
long-span slopes; ``--t`` busts the axon compile cache (the stale-
binary gotcha, docs/PERFORMANCE.md round 4).

Usage: PYTHONPATH=<tree> python tools/measure_headline.py --t 498
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=500)
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--big", type=int, default=220)
    ap.add_argument("--small", type=int, default=55)
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import beer_tpu
    from beer_tpu.models.phoneloop import PhoneLoop
    from beer_tpu.vbi import vb_step

    B, T, D = args.b, args.t, 39
    N_UNITS, SPU = 50, 3
    rng = np.random.default_rng(0)
    data = rng.normal(size=(B, T, D)).astype(np.float32)
    lengths = rng.integers(T // 2, T + 1, size=B)
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)

    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.ones(D), size=N_UNITS * SPU,
        cov_type="diagonal", noise_std=0.5, key=jax.random.PRNGKey(1),
    )
    loop = PhoneLoop.create(N_UNITS, SPU, nset)
    x, m = jnp.asarray(data), jnp.asarray(mask)
    frames = float(mask.sum())

    def make_epochs(n):
        @jax.jit
        def train(model, x, mask):
            def body(model, _):
                elbo, model = vb_step(model, x, mask=mask)
                return model, elbo
            model, elbos = jax.lax.scan(body, model, None, length=n)
            return model, elbos[-1]
        return train

    fn_big, fn_small = make_epochs(args.big), make_epochs(args.small)

    def one(fn):
        t0 = time.time()
        _, e = fn(loop, x, m)
        float(e)
        return time.time() - t0

    one(fn_big)
    one(fn_small)  # compile both
    tputs = []
    for _ in range(args.n):
        tb, ts = one(fn_big), one(fn_small)
        tputs.append(frames * (args.big - args.small) / (tb - ts))
    tputs.sort()
    print(json.dumps({
        "t": args.t, "b": args.b,
        "median_frames_per_s": round(float(np.median(tputs)), 1),
        "min": round(tputs[0], 1), "max": round(tputs[-1], 1),
        "n_slopes": len(tputs),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
