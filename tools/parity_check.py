"""North-star correctness check (BASELINE.md): TPU f32 vs CPU-torch f64.

Runs the same Bayesian-GMM VB-EM trajectory in beer_tpu (f32, on the
default device — the TPU chip) and in the independent CPU-torch f64
re-implementation of the reference algorithm (tests/torch_ref.py), and
asserts max |dELBO|/frame <= 1e-4 over 20 iterations.

Round-1 measured result on the v5e chip: worst 9.0e-5 / frame.

Run: PYTHONPATH=. python tools/parity_check.py
"""
import os, sys
import numpy as np, jax, jax.numpy as jnp, torch
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import beer_tpu
from beer_tpu import dists
from beer_tpu.models.parameters import BayesianParameter
from beer_tpu.models.normal import NormalSet
from beer_tpu.vbi import vb_step
from torch_ref import TorchVBGMM

rng = np.random.default_rng(0)
means = np.array([[-4., 0.], [4., 0.], [0., 5.]])
data = np.concatenate([rng.multivariate_normal(m, np.eye(2)*0.6, size=200) for m in means])
n, d, ncomp = len(data), 2, 4
mean = data.mean(0); cov = np.cov(data.T)
prior_strength = 1.0; dof0 = d + prior_strength
w0 = np.linalg.inv(cov) / dof0
noise = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (ncomp, d)))
post_means = mean + 1.0 * noise

fam = dists.NormalWishart(dim=d)
f32 = np.float32
prior_nat = fam.to_nat(jnp.asarray(mean, f32), prior_strength, jnp.asarray(w0, f32), dof0)
post_nat = jax.vmap(lambda m: fam.to_nat(m, prior_strength, jnp.asarray(w0, f32), dof0))(jnp.asarray(post_means, f32))
nset = NormalSet(means_precisions=BayesianParameter(
    prior=jnp.broadcast_to(prior_nat, (ncomp,) + prior_nat.shape),
    posterior=post_nat, family=fam), cov_type="full", ncomp=ncomp, dim=d)
gmm = beer_tpu.Mixture.create(nset)
ref = TorchVBGMM(torch.tensor(mean), prior_strength, torch.tensor(w0), dof0,
                 torch.ones(ncomp, dtype=torch.float64), torch.tensor(post_means))
x = jnp.asarray(data, f32)
step = jax.jit(vb_step)
worst = 0.0
for it in range(20):
    elbo_jax, gmm = step(gmm, x)
    elbo_ref = ref.em_step(torch.tensor(data))
    diff = abs(float(elbo_jax) - float(elbo_ref)) / n
    worst = max(worst, diff)
    if it % 4 == 0:
        print("iter %2d  jax(tpu,f32) %.6f  torch(cpu,f64) %.6f  |diff|/frame %.2e" % (
            it, float(elbo_jax)/n, float(elbo_ref)/n, diff))
print("device:", jax.devices()[0])
print("worst |dELBO|/frame over 20 VB-EM iterations: %.2e (target <= 1e-4)" % worst)
assert worst <= 1e-4
