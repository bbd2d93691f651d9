"""Dependent-kernel latency floor of the chip for tiny scan bodies.

Bounds the H-SHMM subspace step (bench config 6): the compiled train
scan's body is ~30 sequential tiny kernels per step (19 fusions +
3 RNG custom-calls + 3 other custom-calls + copies; see
docs/PERFORMANCE.md round-5 GSM section) at ~34 µs/step with the rbg
key — ~1.1 µs per kernel.  Is that the CHIP's floor for dependent
tiny-kernel issue, or is there slack?

Method: slope-timed ``lax.scan`` whose body is ``n_k`` *dependent*
tiny fusions on an (8, 128) f32 tile — one vreg, so per-kernel work is
negligible and the marginal cost of one more fusion IS the sequential
kernel overhead.  ``jax.lax.optimization_barrier`` between fusions
stops XLA from collapsing the chain into one kernel; the compiled HLO
is checked to confirm the fusion count scales with ``n_k``.  Two inner
scan lengths are differenced so tunnel fetch latency cancels (the
slope method used by every other tool here).

Output: marginal ns per dependent fusion.  If the GSM step's
per-kernel cost ~= this floor, the step is latency-floor-limited and
further gains need FEWER kernels (fusing the update), not faster ones.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def make_run(n_k, inner):
    def body(c, _):
        v, w = c
        for i in range(n_k):
            # a tiny fusion the compiler cannot merge across the barrier:
            # multiply + add keeps both operands live
            v = v * w + 1e-7
            v, w = jax.lax.optimization_barrier((v, w))
        return (v, w), None

    @jax.jit
    def run(v, w):
        (v, w), _ = jax.lax.scan(body, (v, w), None, length=inner)
        return v.sum()

    return run


def fusion_count(run, v, w):
    txt = run.lower(v, w).compile().as_text()
    # count fusion/custom-call launches in the while body (rough):
    return txt.count("fusion"), txt.count("custom-call")


def timed(run, v, w, outer):
    float(run(v, w))  # compile + warm
    t0 = time.time()
    for _ in range(outer):
        float(run(v, w))
    return (time.time() - t0) / outer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, nargs=2, default=[400, 4400])
    ap.add_argument("--nk", type=int, nargs="+", default=[1, 2, 4, 8, 16, 32])
    ap.add_argument("--outer", type=int, default=5)
    ap.add_argument("--shape", type=int, nargs=2, default=[8, 128])
    args = ap.parse_args()
    n1, n2 = args.inner

    v = jnp.ones(tuple(args.shape), jnp.float32) * 0.5
    w = jnp.ones(tuple(args.shape), jnp.float32) * (1.0 + 1e-7)

    out = {"shape": args.shape, "points": {}}
    prev = None
    for nk in args.nk:
        r1 = make_run(nk, n1)
        r2 = make_run(nk, n2)
        nf, ncc = fusion_count(r2, v, w)
        t1 = timed(r1, v, w, args.outer)
        t2 = timed(r2, v, w, args.outer)
        ns = (t2 - t1) / (n2 - n1) * 1e9
        msg = (f"nk={nk:3d}: {ns:9.1f} ns/step ({ns/nk:7.1f} ns/kernel)"
               f"  [hlo: {nf} fusions, {ncc} custom-calls]")
        if prev is not None:
            dk, dns = nk - prev[0], ns - prev[1]
            msg += f"  marginal {dns/dk:7.1f} ns/kernel"
        print(msg, flush=True)
        out["points"][str(nk)] = round(ns, 1)
        prev = (nk, ns)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
