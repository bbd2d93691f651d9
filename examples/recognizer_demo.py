"""Supervised HMM-GMM phone recognizer on synthetic data (config 3).

Run: python examples/recognizer_demo.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu.models import graph as graph_mod
from beer_tpu.models.hmm import HMM
from beer_tpu.models.mixture import MixtureSet
from beer_tpu.vbi import vb_step

N_PHONES, STATES, NCOMP, D = 4, 2, 2, 3


def main():
    rng = np.random.default_rng(7)
    base = rng.normal(size=(N_PHONES * STATES, D)) * 3.0
    transcriptions, datas = [], []
    for _ in range(20):
        phones = list(rng.integers(N_PHONES, size=int(rng.integers(2, 7))))
        frames = []
        for ph in phones:
            for st in range(STATES):
                dwell = int(rng.integers(3, 7))
                frames.append(
                    base[ph * STATES + st] + 0.3 * rng.normal(size=(dwell, D))
                )
        transcriptions.append(phones)
        datas.append(np.concatenate(frames))
    t_max = max(map(len, datas))
    data = np.zeros((len(datas), t_max, D), np.float32)
    mask = np.zeros((len(datas), t_max), np.float32)
    for i, x in enumerate(datas):
        data[i, : len(x)] = x
        mask[i, : len(x)] = 1

    flat = data.reshape(-1, D)[mask.reshape(-1) > 0]
    nset = beer_tpu.NormalSet.create(
        jnp.asarray(flat.mean(0)), jnp.asarray(np.cov(flat.T).astype(np.float32)),
        size=N_PHONES * STATES * NCOMP, cov_type="full", noise_std=2.0,
        key=jax.random.PRNGKey(2),
    )
    emissions = MixtureSet.create(nset, nmix=N_PHONES * STATES)

    graphs = graph_mod.transcription_graphs(transcriptions, N_PHONES, STATES)
    hmm = HMM.create(graphs, emissions)
    x, m = jnp.asarray(data), jnp.asarray(mask)
    step = jax.jit(vb_step)
    for epoch in range(25):
        elbo, hmm = step(hmm, x, mask=m)
        if epoch % 5 == 0:
            print(f"epoch {epoch:3d}  elbo/frame = {float(elbo) / mask.sum():.4f}")

    recognizer = HMM.create(
        graph_mod.phone_loop_graph(N_PHONES, STATES).compile(), hmm.modelset
    )
    paths, _ = jax.jit(recognizer.decode)(x, m)
    hyp = np.asarray(paths[0])[: int(mask[0].sum())] // STATES
    collapsed = [int(hyp[0])] + [int(p) for i, p in enumerate(hyp[1:], 1) if p != hyp[i - 1]]
    print("\nutt 0   truth:", transcriptions[0])
    print("utt 0 decoded:", collapsed)


if __name__ == "__main__":
    main()
