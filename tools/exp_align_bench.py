"""Banded vs dense forced-alignment throughput (recognizer shape).

Companion to exp_decode_bench.py: shared left-to-right transcription
graphs (B=512 utterances, ~8 phones x 3 states), banded route vs the
dense (max,+) reference, with path parity.  Run with a fresh --t.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu.models import graph as graph_mod
from beer_tpu.models.hmm import HMM
from beer_tpu.ops import semiring_scan

B, D = 512, 39
N_PHONES, SPP = 12, 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=494)
    t_len = ap.parse_args().t
    rng = np.random.default_rng(0)
    transcriptions = [
        list(rng.integers(0, N_PHONES, size=int(rng.integers(6, 12))))
        for _ in range(B)
    ]
    data = rng.normal(size=(B, t_len, D)).astype(np.float32)
    lengths = rng.integers(t_len // 2, t_len + 1, size=B)
    mask = (np.arange(t_len)[None] < lengths[:, None]).astype(np.float32)
    x, m = jnp.asarray(data), jnp.asarray(mask)

    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.ones(D), size=N_PHONES * SPP,
        cov_type="diagonal", noise_std=0.5, key=jax.random.PRNGKey(1))
    graphs = graph_mod.transcription_graphs(transcriptions, N_PHONES, SPP)
    hmm = HMM.create(graphs, nset)

    def banded(mo, x, m):
        return mo.decode(x, m)

    def dense(mo, x, m):
        stats = mo.sufficient_statistics(x)
        llh = mo._state_llh(stats)
        return semiring_scan.viterbi(
            llh, mo._effective_log_trans(), mo.graph.log_init,
            mo.graph.log_final, m)

    frames = float(mask.sum())
    pb, sb = jax.jit(banded)(hmm, x, m)
    pd, sd = jax.jit(dense)(hmm, x, m)
    valid = np.asarray(m) > 0
    diff = int((np.asarray(pb)[valid] != np.asarray(pd)[valid]).sum())
    print(f"paths differing: {diff}/{int(valid.sum())}  score max diff: "
          f"{np.abs(np.asarray(sb) - np.asarray(sd)).max():.2e}", flush=True)

    def timeit(fn):
        def harness(inner):
            @jax.jit
            def g(mo, x, m):
                def stepf(c, _):
                    mo_p = mo.replace(graph=mo.graph.replace(
                        log_init=mo.graph.log_init + c * 1e-30))
                    paths, scores = fn(mo_p, x, m)
                    return (scores.sum() + paths.sum()) * 1e-30, None
                c, _ = jax.lax.scan(stepf, jnp.float32(0.0), None,
                                    length=inner)
                return c
            return g
        f1, f2 = harness(2), harness(6)
        float(f1(hmm, x, m)); float(f2(hmm, x, m))

        def t(f):
            t0 = time.time()
            for _ in range(3):
                float(f(hmm, x, m))
            return (time.time() - t0) / 3
        return (t(f2) - t(f1)) / 4

    for name, fn in (("banded", banded), ("dense", dense)):
        dt = timeit(fn)
        print(f"{name}: {dt*1e3:.3f} ms ({frames/dt/1e6:.1f}M frames/s)",
              flush=True)


if __name__ == "__main__":
    main()
