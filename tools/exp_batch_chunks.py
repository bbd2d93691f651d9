"""Time the ckpt kernels with batch-split interleaved recursions.

docs/PERFORMANCE.md names the next latency lever: the serial chains
(~2-2.6 µs/step) could hide stalls by interleaving INDEPENDENT batch
sub-chains — chunk the (B, S) carry into C row blocks, each advancing
its own recursion, giving the scheduler C (forward) / 2C (smoothing)
dependency chains per step.  This measures the production kernel pair
(banded forward ckpt + banded fused E-step, the phone-loop hot path at
the bench shape) for C ∈ {1, 2, 4, 8}.

Per-row chain arithmetic is unchanged ⇒ chunked γ/α̂ outputs are
bit-identical (tests/test_pallas_scan.py::
test_batch_chunked_ckpt_matches_unchunked); this experiment is
wall-clock only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from beer_tpu.ops import pallas_scan

B, T, S = 512, 500, 150
N_UNITS, SPU = 50, 3


def make_inputs():
    rng = np.random.default_rng(0)
    k = pallas_scan._steps_per_block(B, S)
    t_pad = -(-T // k) * k
    llh_tm = jnp.asarray(
        rng.normal(size=(t_pad, B, S)).astype(np.float32)) - 2.0
    lengths = rng.integers(T // 2, T + 1, size=B)
    mask = jnp.asarray(
        (np.arange(t_pad)[None, :] < lengths[:, None]).astype(np.float32))
    ids = np.arange(S)
    a_self = np.full(S, 0.6, np.float32)
    a_adv = np.where(ids % SPU != SPU - 1, 0.4, 0.0).astype(np.float32)
    exit_v = np.zeros(S, np.float32)
    exit_v[ids % SPU == SPU - 1] = 0.2
    w_v = np.zeros(S, np.float32)
    w_raw = rng.random(N_UNITS).astype(np.float32)
    w_v[ids % SPU == 0] = w_raw / w_raw.sum()
    bands = jnp.asarray(np.stack([a_self, a_adv, exit_v, w_v]))
    iv = jnp.full((B, S), 1.0 / S, jnp.float32)
    fv = jnp.broadcast_to(jnp.asarray(exit_v), (B, S)).astype(jnp.float32)
    rows = jnp.arange(N_UNITS, dtype=jnp.int32) * SPU + SPU - 1
    cols = jnp.arange(N_UNITS, dtype=jnp.int32) * SPU
    sel_r = jax.nn.one_hot(rows, S, dtype=jnp.float32).T
    sel_c = jax.nn.one_hot(cols, S, dtype=jnp.float32).T
    return llh_tm, mask, bands, iv, fv, sel_r, sel_c


def timeit(fn, args, n1=4, n2=16, outer=3):
    # anti-CSE perturbation on the SMALL bands input only (perturbing
    # the big stream materializes a phantom HBM temp every iteration —
    # docs/PERFORMANCE.md retraction)
    def chain(inner):
        @jax.jit
        def run(llh_tm, mask, bands, iv, fv, sel_r, sel_c):
            def step(c, _):
                b = tuple(bands[i] * (1 + c * 1e-30) for i in range(4))
                r = fn(llh_tm, mask, b, iv, fv, sel_r, sel_c)
                return r * 1e-30, None
            c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=inner)
            return c
        return run

    f1, f2 = chain(n1), chain(n2)
    float(f1(*args)); float(f2(*args))

    def run(f):
        t0 = time.time()
        for _ in range(outer):
            float(f(*args))
        return (time.time() - t0) / outer

    return (run(f2) - run(f1)) / (n2 - n1)


def make_pair(chunks):
    def pair(llh_tm, mask, bands, iv, fv, sel_r, sel_c):
        ckpts, last, logz = pallas_scan.forward_llh_ckpt_pass(
            llh_tm, None, iv, mask, bands=bands, batch_chunks=chunks)
        gamma, xi = pallas_scan.phone_loop_estep_ckpt_pass(
            llh_tm, ckpts, None, fv, mask, sel_r, sel_c,
            bands=bands, batch_chunks=chunks)
        return (last.sum() + logz.sum() + gamma[::97].sum() + xi.sum())
    return pair


def make_fwd(chunks):
    def fwd(llh_tm, mask, bands, iv, fv, sel_r, sel_c):
        ckpts, last, logz = pallas_scan.forward_llh_ckpt_pass(
            llh_tm, None, iv, mask, bands=bands, batch_chunks=chunks)
        return last.sum() + logz.sum() + ckpts[::7].sum()
    return fwd


def lm_fwd(llh_tm, mask, bands, iv, fv, sel_r, sel_c):
    llh_lm = jnp.swapaxes(llh_tm, 1, 2)
    ckpts, last, logz = pallas_scan.forward_llh_ckpt_pass_lm(
        llh_lm, tuple(bands[i] for i in range(4)), iv.T, mask)
    return last.sum() + logz.sum() + ckpts[::7].sum()


def make_lm_pair(chunks):
    def lm_pair(llh_tm, mask, bands, iv, fv, sel_r, sel_c):
        llh_lm = jnp.swapaxes(llh_tm, 1, 2)
        bt = tuple(bands[i] for i in range(4))
        ckpts, last, logz = pallas_scan.forward_llh_ckpt_pass_lm(
            llh_lm, bt, iv.T, mask, batch_chunks=chunks)
        gamma, xi = pallas_scan.phone_loop_estep_ckpt_pass_lm(
            llh_lm, ckpts, bt, fv.T, mask, sel_r.T, sel_c.T,
            batch_chunks=chunks)
        return (last.sum() + logz.sum() + gamma[::97].sum() + xi.sum())
    return lm_pair


def main():
    print("devices:", jax.devices(), flush=True)
    args = make_inputs()
    for chunks in (1, 2, 4, 8):
        dt = timeit(make_fwd(chunks), args)
        print(f"forward  C={chunks}: {dt*1e3:7.3f} ms", flush=True)
    # NOTE: the lane-major runs pay an input transpose of the llh
    # stream inside the timed region (production produces llh lane-major
    # for free via the ELLH einsum) — subtract the transpose line.
    @jax.jit
    def transpose_only(llh_tm):
        return jnp.swapaxes(llh_tm, 1, 2).sum()
    import time as _t
    float(transpose_only(args[0]))
    t0 = _t.time()
    for _ in range(8):
        float(transpose_only(args[0]))
    print(f"llh transpose alone: {(_t.time()-t0)/8*1e3:7.3f} ms",
          flush=True)
    dt = timeit(lm_fwd, args)
    print(f"forward  lane-major: {dt*1e3:7.3f} ms (incl. transpose)",
          flush=True)
    for chunks in (1, 2, 4, 8):
        dt = timeit(make_pair(chunks), args)
        print(f"fwd+estep C={chunks}: {dt*1e3:7.3f} ms", flush=True)
    # the lm passes ignore batch_chunks (no lane-chunked kernels —
    # Mosaic layout limit + the measured loss above), so time the
    # unchunked lane-major pair only
    dt = timeit(make_lm_pair(1), args)
    print(f"fwd+estep lane-major: {dt*1e3:7.3f} ms "
          "(incl. transpose)", flush=True)


if __name__ == "__main__":
    main()
