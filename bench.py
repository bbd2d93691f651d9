"""Benchmark: VB E-step throughput (the BASELINE primary metric).

Workload: the phone-loop HMM E-step of BASELINE config 4 — sufficient
statistics → expected log-likelihood → forward-backward → statistics
accumulation — on a realistic AUD shape: 39-dim features (MFCC+Δ+Δ²),
50 units × 3 states = 150 diagonal-covariance Gaussian pdfs, batch of
padded utterances.

Numerator: beer_tpu jitted E-step on the default JAX device (the TPU
chip under the driver).  Denominator: the reference's algorithm in CPU
PyTorch — vectorized ELLH matmul but the per-utterance sequential
``for t in range(T)`` forward-backward loop the reference runs
(SURVEY.md §3.2), measured on a subset and scaled per-frame.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

B, T, D = 512, 500, 39
N_UNITS, STATES_PER_UNIT = 50, 3
S = N_UNITS * STATES_PER_UNIT
SEED = 0


def make_data():
    rng = np.random.default_rng(SEED)
    data = rng.normal(size=(B, T, D)).astype(np.float32)
    lengths = rng.integers(T // 2, T + 1, size=B)
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    return data, mask


def bench_beer_tpu(data, mask, outer=4, inner=20):
    import jax
    import jax.numpy as jnp

    import beer_tpu
    from beer_tpu.models.phoneloop import PhoneLoop
    from beer_tpu.vbi import vb_step

    nset = beer_tpu.NormalSet.create(
        jnp.zeros(D), jnp.ones(D), size=S, cov_type="diagonal",
        noise_std=0.5, key=jax.random.PRNGKey(1),
    )
    loop = PhoneLoop.create(N_UNITS, STATES_PER_UNIT, nset)
    x, m = jnp.asarray(data), jnp.asarray(mask)

    # The realistic workload (BASELINE: "epoch ELBO wall-clock"): `inner`
    # full VB-EM epochs chained in one jitted scan, so host/tunnel
    # round-trip latency is amortized over real training work.  Timing
    # fetches the final ELBO to host each call — block_until_ready alone
    # does not round-trip the axon tunnel and yields absurd numbers.
    @jax.jit
    def train_epochs(model, x, mask):
        def body(model, _):
            elbo, model = vb_step(model, x, mask=mask)
            return model, elbo
        model, elbos = jax.lax.scan(body, model, None, length=inner)
        return model, elbos[-1]

    loop, elbo = train_epochs(loop, x, m)  # compile + warmup
    float(elbo)
    t0 = time.time()
    for _ in range(outer):
        loop, elbo = train_epochs(loop, x, m)
        float(elbo)
    dt = time.time() - t0
    frames = float(mask.sum()) * outer * inner
    return frames / dt, float(elbo)


def bench_torch_reference(data, mask, n_utts=8):
    """The reference algorithm in CPU torch: per-utterance sequential loop."""
    import torch

    torch.set_num_threads(max(torch.get_num_threads(), 4))
    rng = np.random.default_rng(1)
    # diag-cov expected stats layout [lam, lam*mu, lam*mu^2, log lam] per dim
    e_lam = np.abs(rng.normal(1.0, 0.1, size=(S, D)))
    e_mu = rng.normal(size=(S, D))
    e_stats = np.concatenate(
        [e_lam, e_lam * e_mu, e_lam * e_mu**2, np.log(e_lam)], axis=1
    ).astype(np.float32)
    e_stats_t = torch.tensor(e_stats)
    e_log_w = torch.zeros(S)

    # phone-loop transition structure (same as beer_tpu graph)
    lt = torch.full((S, S), -1e30)
    for u in range(N_UNITS):
        for i in range(STATES_PER_UNIT):
            st = u * STATES_PER_UNIT + i
            lt[st, st] = np.log(0.5)
            if i + 1 < STATES_PER_UNIT:
                lt[st, st + 1] = np.log(0.5)
    starts = torch.arange(N_UNITS) * STATES_PER_UNIT
    ends = starts + STATES_PER_UNIT - 1
    lt[ends[:, None], starts[None, :]] = np.log(0.25 / N_UNITS)
    li = torch.full((S,), -1e30)
    li[starts] = -np.log(N_UNITS)
    lf = torch.full((S,), -1e30)
    lf[ends] = np.log(0.25)

    total_frames = 0
    t0 = time.time()
    for b in range(n_utts):
        ln = int(mask[b].sum())
        x = torch.tensor(data[b, :ln])
        # sufficient statistics + ELLH (vectorized, like the reference)
        stats = torch.cat(
            [-0.5 * x**2, x, -0.5 * torch.ones_like(x), 0.5 * torch.ones_like(x)],
            dim=1,
        )
        llh = stats @ e_stats_t.T - 0.5 * D * np.log(2 * np.pi)
        # sequential forward-backward (the reference hot loop)
        log_alpha = torch.empty(ln, S)
        log_beta = torch.empty(ln, S)
        log_alpha[0] = li + llh[0]
        for t in range(1, ln):
            log_alpha[t] = llh[t] + torch.logsumexp(
                log_alpha[t - 1][:, None] + lt, dim=0
            )
        log_beta[-1] = lf
        for t in range(ln - 2, -1, -1):
            log_beta[t] = torch.logsumexp(
                lt + (llh[t + 1] + log_beta[t + 1])[None, :], dim=1
            )
        log_z = torch.logsumexp(log_alpha[-1] + lf, dim=0)
        post = torch.exp(log_alpha + log_beta - log_z)
        acc = post.T @ stats  # accumulate emission stats
        total_frames += ln
    dt = time.time() - t0
    return total_frames / dt


def main():
    data, mask = make_data()
    value, elbo = bench_beer_tpu(data, mask)
    baseline = bench_torch_reference(data, mask)
    result = {
        "metric": "phone_loop_vb_estep_throughput",
        "value": round(value, 1),
        "unit": "frames/s",
        "vs_baseline": round(value / baseline, 2),
    }
    print(json.dumps(result))
    print(
        f"# beer_tpu: {value:,.0f} frames/s | torch-cpu reference: "
        f"{baseline:,.0f} frames/s | elbo check: {elbo:.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
