"""VPU issue-occupancy micro-benchmark for the smoothing-chain roofline.

VERDICT r4 ask #2: the fused E-step's serial chains (forward recompute
+ backward smoothing) are 60% of the flagship epoch and the parked
two-level-blocked-scan counter-analysis ends with "measure VPU issue
occupancy first".  This tool measures it directly with a family of
Pallas micro-kernels that reproduce ONLY the chain structure — a
serial per-step recurrence on a lane-major (S, B) f32 tile — with
dilution knobs:

* ``--ops N``      — N *dependent* full-tile multiplies per step
                     (v <- v*c, chained).  Slope of time vs N = the
                     dependent-issue cost of one (S, B) vector op;
                     together with the vreg count that is the VPU's
                     effective issue rate for this access pattern.
* ``--chains C``   — C *independent* interleaved chains of --ops each.
                     If the VPU multi-issues (4 ALUs), C=2 at half the
                     per-chain ops should cost ~the C=1 time; if it
                     retires ~1 vreg-op/cycle regardless, time scales
                     with total ops.
* ``--reduce``     — adds one sublane sum ((S,B) -> (1,B)) + broadcast
                     multiply per step (the chain's normalizer /
                     rank-1 term shape).
* ``--stream R``   — streams R copies of a (K, S, B) block from HBM
                     per grid step (the e/llh/stats stream), touching
                     each (so the DMA is live) with ONE extra op.
                     Time vs R isolates the pallas-pipeline stream
                     rate and how much of it hides under the chain.

Timing uses the same two-length slope method as the other tools (two
grid lengths, difference) so tunnel fetch latency cancels.

The verdict this feeds (docs/PERFORMANCE.md "Round 5: chain roofline"):
if measured issue cost ~= the real kernels' per-step vreg count /
measured rate, the chains are at the VPU issue roofline and the 140M
aspiration retires; spare capacity instead means a blocked/interleaved
redesign pays.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_up(x):
    z = jnp.zeros_like(x[:1])
    return jnp.concatenate([x[1:], z], axis=0)


def make_kernel(k_steps, n_ops, n_chains, with_reduce, n_stream):
    """Grid steps each run k_steps serial iterations on (S, B) carries."""

    def kernel(*refs):
        c_ref = refs[0]
        stream_refs = refs[1 : 1 + n_stream]
        out_ref = refs[1 + n_stream]
        carries = refs[2 + n_stream :]          # n_chains scratch (S, B)
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            for cr in carries:
                cr[:] = c_ref[:]

        c = c_ref[:]
        # touch each streamed block once so its DMA must complete
        s_add = None
        for sr in stream_refs:
            blk = sr[:]                          # (K, S, B)
            s_add = blk[0] if s_add is None else s_add + blk[0]
        vs = [cr[:] for cr in carries]
        for _ in range(k_steps):
            nxt = []
            for v in vs:
                for _o in range(n_ops):
                    v = v * c
                if s_add is not None:
                    v = v + s_add * 1e-30
                if with_reduce:
                    r = v.sum(0, keepdims=True)
                    v = v * (1.0 + r * 1e-30)
                nxt.append(v)
            vs = nxt
        for cr, v in zip(carries, vs):
            cr[:] = v
        acc = vs[0]
        for v in vs[1:]:
            acc = acc + v
        out_ref[:] = acc

    return kernel


def run_chain(s, b, t, k_steps, n_ops, n_chains, with_reduce, n_stream,
              outer=3):
    n_blocks = t // k_steps
    c = (1.0 - 1e-7) * jnp.ones((s, b), jnp.float32)
    streams = [
        jnp.ones((n_blocks * k_steps, s, b), jnp.float32) * 1e-30
        for _ in range(n_stream)
    ]

    kernel = make_kernel(k_steps, n_ops, n_chains, with_reduce, n_stream)
    in_specs = [pl.BlockSpec((s, b), lambda i: (0, 0))] + [
        pl.BlockSpec((k_steps, s, b), lambda i: (i, 0, 0))
        for _ in range(n_stream)
    ]
    fn = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((s, b), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((s, b), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((s, b), jnp.float32) for _ in range(n_chains)
        ],
        interpret=jax.default_backend() == "cpu",
    )
    f = jax.jit(lambda c, *st: fn(c, *st).sum())
    float(f(c, *streams))  # compile + run

    def t_once():
        t0 = time.time()
        for _ in range(outer):
            float(f(c, *streams))
        return (time.time() - t0) / outer

    return t_once()


def slope(s, b, t1, t2, k_steps, **kw):
    a = run_chain(s, b, t1, k_steps, **kw)
    c = run_chain(s, b, t2, k_steps, **kw)
    return (c - a) / (t2 - t1)  # seconds per step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=152)
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--t", type=int, nargs=2, default=[512, 4608])
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--ops", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    ap.add_argument("--chains", type=int, default=1)
    ap.add_argument("--reduce", action="store_true")
    ap.add_argument("--stream", type=int, default=0)
    ap.add_argument("--outer", type=int, default=3)
    args = ap.parse_args()
    t1, t2 = args.t
    vregs = -(-args.s // 8) * -(-args.b // 128)

    out = {"s": args.s, "b": args.b, "vregs_per_op": vregs,
           "chains": args.chains, "reduce": bool(args.reduce),
           "stream": args.stream, "points": {}}
    prev = None
    for n in args.ops:
        ns = slope(args.s, args.b, t1, t2, args.k, n_ops=n,
                   n_chains=args.chains, with_reduce=args.reduce,
                   n_stream=args.stream, outer=args.outer) * 1e9
        total_ops = n * args.chains
        msg = (f"ops={n} x{args.chains}: {ns:8.2f} ns/step "
               f"({ns/max(total_ops,1):6.2f} ns/op, "
               f"{ns/max(total_ops*vregs,1):5.3f} ns/vreg)")
        if prev is not None:
            dn, dns = total_ops - prev[0], ns - prev[1]
            if dn > 0:
                msg += f"  marginal {dns/dn:6.2f} ns/op"
        print(msg, flush=True)
        out["points"][str(n)] = round(ns, 2)
        prev = (total_ops, ns)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
