"""Component-wise timing of the small-S HMM configs (bench configs 2/3).

Same carry-perturbed slope method as tools/profile_phoneloop.py, applied
to the two small-state-count bench configs whose MFU has been flat for
two rounds (VERDICT r4 ask #4):

* ``--model hmm``        — config 2: shared ergodic graph, S=30,
  diagonal NormalSet, learn_transitions=True (stats-streaming lane-major
  route at bench shape).
* ``--model recognizer`` — config 3: per-utterance transcription
  graphs (pdf_ids.ndim == 2), S=18, 30 pdfs (one-hot selection +
  checkpointed kernels, gamma materialised).

The --b sweep separates fixed per-step issue latency from
B-proportional arithmetic: chain length is fixed by T, so time flat in
B == latency/issue-bound (pack tiles or block the scan), time ∝ B ==
VPU/MXU throughput-bound (the small (S,S) tiles are NOT the problem).

Usage: python tools/profile_hmm_small.py --model hmm --b 512 \
           --inner 20 220 [--t 499]
       (--t busts the axon stale-compile cache via a fresh shape)
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
from beer_tpu.vbi import vb_step, elbo_and_stats

D = 39


def make_hmm(b, t, s=30):
    from beer_tpu.models.graph import ergodic
    from beer_tpu.models.hmm import HMM

    rng = np.random.default_rng(3)
    data = rng.normal(size=(b, t, D)).astype(np.float32)
    lengths = rng.integers(t // 2, t + 1, size=b)
    mask = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.ones(D), size=s, cov_type="diagonal",
        noise_std=0.5, key=jax.random.PRNGKey(3),
    )
    hmm = HMM.create(ergodic(s), nset, learn_transitions=True)
    return hmm, jnp.asarray(data), jnp.asarray(mask)


def make_recognizer(b, t, phones=10, spp=3):
    from beer_tpu.models.graph import transcription_graphs
    from beer_tpu.models.hmm import HMM

    rng = np.random.default_rng(4)
    data = rng.normal(size=(b, t, D)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    seqs = [list(rng.integers(phones, size=6)) for _ in range(b)]
    graphs = transcription_graphs(seqs, phones, spp)
    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.ones(D), size=phones * spp,
        cov_type="diagonal", noise_std=0.5, key=jax.random.PRNGKey(4),
    )
    hmm = HMM.create(graphs, nset)
    return hmm, jnp.asarray(data), jnp.asarray(mask)


def chain(body, inner):
    @jax.jit
    def run(model, x, mask):
        def step(c, _):
            xp = x * (1.0 + c * 1e-30)
            return body(model, xp, mask), None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=inner)
        return c

    return run


def chain_model(body, inner):
    @jax.jit
    def run(model, x, mask):
        def step(carry, _):
            model, c = carry
            xp = x * (1.0 + c * 1e-30)
            elbo, model = body(model, xp, mask)
            return (model, elbo * 1e-30), None

        (model, c), _ = jax.lax.scan(
            step, (model, jnp.float32(0.0)), None, length=inner
        )
        return c

    return run


def timeit(make, model, x, mask, n1, n2, outer):
    f1, f2 = make(n1), make(n2)
    float(f1(model, x, mask))
    float(f2(model, x, mask))

    def run(f):
        t0 = time.time()
        for _ in range(outer):
            float(f(model, x, mask))
        return (time.time() - t0) / outer

    t1, t2 = run(f1), run(f2)
    return (t2 - t1) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="hmm",
                    choices=["hmm", "recognizer"])
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--t", type=int, default=500)
    ap.add_argument("--inner", type=int, nargs=2, default=[20, 120])
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--components", default="llh,infer,estep,full")
    args = ap.parse_args()
    n1, n2 = args.inner

    if args.model == "hmm":
        model, x, mask = make_hmm(args.b, args.t)
    else:
        model, x, mask = make_recognizer(args.b, args.t)
    frames = float(mask.sum())

    def body_llh(model, xp, mask):
        stats = model.sufficient_statistics(xp)
        llh = model.modelset.expected_log_likelihood(stats)
        return llh.sum() * 1e-30

    def body_infer(model, xp, mask):
        stats = model.sufficient_statistics(xp)
        log_z, cache = model.infer(stats, mask=mask)
        extra = 0.0
        if cache.get("ckpts") is not None:
            extra = cache["ckpts"][-1].sum()
        return (log_z.sum() + extra) * 1e-30

    def body_estep(model, xp, mask):
        elbo, acc = elbo_and_stats(model, xp, mask=mask)
        tot = sum(jnp.sum(l) for l in jax.tree.leaves(acc))
        return (elbo + tot) * 1e-30

    bodies = {
        "llh": lambda n: chain(body_llh, n),
        "infer": lambda n: chain(body_infer, n),
        "estep": lambda n: chain(body_estep, n),
        "full": lambda n: chain_model(
            lambda m, xp, mk: vb_step(m, xp, mask=mk), n
        ),
    }
    out = {"model": args.model, "b": args.b, "t": args.t}
    for name in args.components.split(","):
        dt = timeit(bodies[name], model, x, mask, n1, n2, args.outer)
        out[name] = round(dt * 1e3, 4)  # ms
        print(f"{name}: {dt*1e3:.4f} ms/iter "
              f"({frames/dt/1e6:.1f}M frames/s)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
