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


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_propagate(mode, c):
    """Per-step propagators mirroring the production kernels' dense
    paths on a lane-major (S, B) carry:

    * dot3  — `_dot3_lm`: 3 bf16 (S,S)@(S,B) MXU dots (hi/lo cross
              terms), summed in f32.
    * dot1  — the stacked candidate: ONE (S,3S)@(3S,B) dot computing
              the same three cross terms ([t_hi|t_lo|t_hi] against
              [p_hi;p_hi;p_lo]).
    * banded — the flagship rank-1+band form (for cross-checks).
    """
    if mode == "none":
        return None
    t_hi, t_lo = _split_bf16(c[:, :c.shape[0]] * 1e-3)   # (S, S)
    if mode == "dot3":
        def prop(p):
            p_hi, p_lo = _split_bf16(p)
            return (
                jnp.dot(t_hi, p_hi, preferred_element_type=jnp.float32)
                + jnp.dot(t_lo, p_hi, preferred_element_type=jnp.float32)
                + jnp.dot(t_hi, p_lo, preferred_element_type=jnp.float32)
            )
        return prop
    if mode == "dot1":
        t_st = jnp.concatenate([t_hi, t_lo, t_hi], axis=1)  # (S, 3S)

        def prop(p):
            p_hi, p_lo = _split_bf16(p)
            p_st = jnp.concatenate([p_hi, p_hi, p_lo], axis=0)  # (3S, B)
            return jnp.dot(t_st, p_st, preferred_element_type=jnp.float32)
        return prop
    if mode == "banded":
        a_self = c[:, 0:1] * 1e-3
        a_adv = c[:, 1:2] * 1e-3
        exit_v = c[:, 2:3] * 1e-3
        w_v = c[:, 3:4] * 1e-3

        def prop(v_hat):
            r = (v_hat * w_v).sum(0, keepdims=True)
            return v_hat * a_self + _shift_up(v_hat) * a_adv + r * exit_v
        return prop
    raise ValueError(mode)


def make_kernel(k_steps, n_ops, n_chains, with_reduce, n_stream,
                propagate_mode="none"):
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
        prop = _make_propagate(propagate_mode, c)
        # touch each streamed block once so its DMA must complete
        s_add = None
        for sr in stream_refs:
            blk = sr[:]                          # (K, S, B)
            s_add = blk[0] if s_add is None else s_add + blk[0]
        vs = [cr[:] for cr in carries]
        for _ in range(k_steps):
            nxt = []
            for v in vs:
                if prop is not None:
                    v = prop(v)
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
              outer=3, propagate_mode="none", cycle=256):
    n_blocks = t // k_steps
    # The stream arrays cycle over `cycle` real HBM blocks (index map
    # i % cycle) so the chain can run long enough for the slope method's
    # >=150 ms span rule (docs/PERFORMANCE.md round-5 drift note) without
    # allocating (t, s, b) in HBM; the per-step DMA traffic is identical
    # because consecutive grid steps still address different blocks.
    cycle = min(cycle, n_blocks)
    c = (1.0 - 1e-7) * jnp.ones((s, b), jnp.float32)
    streams = [
        jnp.ones((cycle * k_steps, s, b), jnp.float32) * 1e-30
        for _ in range(n_stream)
    ]

    kernel = make_kernel(k_steps, n_ops, n_chains, with_reduce, n_stream,
                         propagate_mode)
    in_specs = [pl.BlockSpec((s, b), lambda i: (0, 0))] + [
        pl.BlockSpec((k_steps, s, b), lambda i: (i % cycle, 0, 0))
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
    n1 = (t1 // k_steps) * k_steps
    n2 = (t2 // k_steps) * k_steps
    a = run_chain(s, b, n1, k_steps, **kw)
    c = run_chain(s, b, n2, k_steps, **kw)
    return (c - a) / (n2 - n1)  # seconds per step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=152)
    ap.add_argument("--b", type=int, default=512)
    # long spans: the round-5 drift lesson — a differenced span must be
    # >=150 ms against 1-3 ms tunnel jitter.  2M steps at ~100 ns/step
    # is ~200 ms; the non-stream configs hold only (S, B) tiles so the
    # chain length is free, and stream configs cycle a bounded buffer.
    ap.add_argument("--t", type=int, nargs=2, default=[65536, 2097152])
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--cycle", type=int, default=256,
                    help="stream arrays hold this many real blocks "
                         "(index map cycles i %% cycle)")
    ap.add_argument("--ops", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    ap.add_argument("--chains", type=int, default=1)
    ap.add_argument("--reduce", action="store_true")
    ap.add_argument("--stream", type=int, default=0)
    ap.add_argument("--propagate", default="none",
                    choices=["none", "dot3", "dot1", "banded"])
    ap.add_argument("--outer", type=int, default=3)
    args = ap.parse_args()
    t1, t2 = args.t
    vregs = -(-args.s // 8) * -(-args.b // 128)

    out = {"s": args.s, "b": args.b, "vregs_per_op": vregs,
           "chains": args.chains, "reduce": bool(args.reduce),
           "stream": args.stream, "propagate": args.propagate,
           "points": {}}
    prev = None
    for n in args.ops:
        ns = slope(args.s, args.b, t1, t2, args.k, n_ops=n,
                   n_chains=args.chains, with_reduce=args.reduce,
                   n_stream=args.stream, outer=args.outer,
                   propagate_mode=args.propagate, cycle=args.cycle) * 1e9
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
