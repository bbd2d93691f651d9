"""On-chip gate: STORE_ALPHA (stored forward trajectory, recompute-free
smoothing kernel) vs the round-3 checkpoint+recompute route.

Measures the full vb_step epoch (slope-timed chained scans, same method
as bench.py) at a FRESH shape (T below differs from every prior bench /
profiler run so the axon sidechannel compile cache cannot serve a stale
binary — see docs/PERFORMANCE.md's measurement-hygiene notes), and
checks the two routes' ELBO trajectories agree bit-for-bit (they must:
the stored values ARE the recompute's values).

Run:  python -u tools/exp_store_alpha.py > /tmp/store_alpha.log 2>&1
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

B, T, D = 512, 483, 39
N_UNITS, SPU = 50, 3
S = N_UNITS * SPU
INNER, OUTER = 20, 4


def main():
    import jax
    import jax.numpy as jnp

    import beer_tpu
    from beer_tpu.models.phoneloop import PhoneLoop
    from beer_tpu.ops import pallas_scan
    from beer_tpu.vbi import vb_step

    rng = np.random.default_rng(0)
    data = rng.normal(size=(B, T, D)).astype(np.float32)
    lengths = rng.integers(T // 2, T + 1, size=B)
    lengths[0] = T
    mask = (np.arange(T)[None] < lengths[:, None]).astype(np.float32)
    x, m = jnp.asarray(data), jnp.asarray(mask)
    frames = float(mask.sum())

    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.ones(D), size=S, cov_type="diagonal",
        noise_std=0.5, key=jax.random.PRNGKey(1),
    )
    loop = PhoneLoop.create(N_UNITS, SPU, nset)

    def make_epochs(n):
        # distinct closure per (mode, n): separate jit cache entries
        @jax.jit
        def train_epochs(model, x, mask):
            def body(model, _):
                elbo, model = vb_step(model, x, mask=mask)
                return model, elbo
            model, elbos = jax.lax.scan(body, model, None, length=n)
            return model, elbos[-1]
        return train_epochs

    def measure(mode):
        pallas_scan.STORE_ALPHA = mode
        n_small = max(1, INNER // 4)

        def run(fn):
            m2, elbo = fn(loop, x, m)
            e0 = float(elbo)
            t0 = time.time()
            for _ in range(OUTER):
                m2, elbo = fn(loop, x, m)
                float(elbo)
            return (time.time() - t0) / OUTER, e0

        t_big, e_big = run(make_epochs(INNER))
        t_small, e_small = run(make_epochs(n_small))
        dt = (t_big - t_small) / (INNER - n_small)
        print(f"mode={mode}: {dt*1e3:.3f} ms/epoch, "
              f"{frames/dt/1e6:.1f}M frames/s  "
              f"(elbo@{INNER}={e_big:.6f}, @{n_small}={e_small:.6f})",
              flush=True)
        return dt, e_big, e_small

    dt0, eb0, es0 = measure("0")
    dt1, eb1, es1 = measure("1")
    print(f"speedup: {dt0/dt1:.3f}x", flush=True)
    print(f"elbo bit-match: big={eb0 == eb1} small={es0 == es1}",
          flush=True)


if __name__ == "__main__":
    main()
