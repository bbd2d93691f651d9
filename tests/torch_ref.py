"""Independent CPU PyTorch re-implementation of the reference VB-EM.

This plays the role of the upstream ``beer-asr/beer`` toolkit for parity
tests and benchmark denominators (BASELINE.md: the reference publishes no
numbers, so the CPU-torch VB-EM loop must be measured locally).  It
implements, with explicit textbook formulas and torch ops only, the exact
algorithm the reference runs (SURVEY.md §3.1/§3.2): Bayesian GMM with
NormalWishart priors trained by conjugate VB-EM, and the sequential
log-domain HMM forward-backward.

Deliberately written from the math (standard-parameter form, per-component
Python loops like the reference's object-per-parameter design), NOT from
beer_tpu's flat natural-vector design, so agreement between the two is a
meaningful cross-check.
"""

import math

import torch


class TorchVBGMM:
    """Full-covariance Bayesian GMM, VB-EM with NormalWishart priors."""

    def __init__(self, prior_mean, prior_scale, prior_scale_matrix, prior_dof,
                 prior_alpha, post_means, dtype=torch.float64):
        d = prior_mean.shape[-1]
        self.d = d
        self.k = post_means.shape[0]
        self.dtype = dtype
        # Prior (shared by every component).
        self.m0 = prior_mean.to(dtype)
        self.k0 = float(prior_scale)
        self.W0 = prior_scale_matrix.to(dtype)
        self.nu0 = float(prior_dof)
        self.alpha0 = prior_alpha.to(dtype)
        # Posterior (per component).
        self.m = post_means.to(dtype).clone()
        self.kappa = torch.full((self.k,), self.k0, dtype=dtype)
        self.W = self.W0.expand(self.k, d, d).clone()
        self.nu = torch.full((self.k,), self.nu0, dtype=dtype)
        self.alpha = self.alpha0.clone()

    # -- expectations ---------------------------------------------------
    def _e_log_det(self):
        idx = torch.arange(self.d, dtype=self.dtype)
        dig = torch.digamma(0.5 * (self.nu[:, None] - idx[None, :])).sum(-1)
        return dig + self.d * math.log(2.0) + torch.logdet(self.W)

    def _e_log_w(self):
        return torch.digamma(self.alpha) - torch.digamma(self.alpha.sum())

    # -- E-step ----------------------------------------------------------
    def ellh(self, x):
        """(T, K) expected log-likelihood per component."""
        t = x.shape[0]
        out = torch.empty(t, self.k, dtype=self.dtype)
        e_logdet = self._e_log_det()
        for j in range(self.k):
            lam = self.nu[j] * self.W[j]
            diff = x - self.m[j]
            quad = (diff @ lam * diff).sum(-1) + self.d / self.kappa[j]
            out[:, j] = 0.5 * (e_logdet[j] - quad - self.d * math.log(2 * math.pi))
        return out

    def estep(self, x):
        joint = self.ellh(x) + self._e_log_w()
        llh = torch.logsumexp(joint, dim=-1)
        resps = torch.exp(joint - llh[:, None])
        return llh, resps

    # -- M-step (closed form, lrate=1) ------------------------------------
    def mstep(self, x, resps):
        nk = resps.sum(0)
        xbar = (resps.T @ x) / nk[:, None].clamp_min(1e-12)
        self.alpha = self.alpha0 + nk
        new_kappa = self.k0 + nk
        new_nu = self.nu0 + nk
        new_m = (self.k0 * self.m0 + nk[:, None] * xbar) / new_kappa[:, None]
        w0_inv = torch.linalg.inv(self.W0)
        for j in range(self.k):
            diff = x - xbar[j]
            sj = (resps[:, j][:, None] * diff).T @ diff
            db = (xbar[j] - self.m0)[:, None]
            w_inv = w0_inv + sj + (self.k0 * nk[j] / new_kappa[j]) * (db @ db.T)
            self.W[j] = torch.linalg.inv(w_inv)
        self.kappa, self.nu, self.m = new_kappa, new_nu, new_m

    # -- KL terms ---------------------------------------------------------
    def _kl_dirichlet(self):
        a, a0 = self.alpha, self.alpha0
        return (
            torch.lgamma(a.sum()) - torch.lgamma(a).sum()
            - torch.lgamma(a0.sum()) + torch.lgamma(a0).sum()
            + ((a - a0) * (torch.digamma(a) - torch.digamma(a.sum()))).sum()
        )

    def _log_norm_nw(self, kappa, W, nu):
        idx = torch.arange(self.d, dtype=self.dtype)
        return (
            0.5 * nu * torch.logdet(W)
            + 0.5 * nu * self.d * math.log(2.0)
            + torch.special.multigammaln(0.5 * nu, self.d)
            - 0.5 * self.d * torch.log(kappa)
            + 0.5 * self.d * math.log(2 * math.pi)
        )

    def _kl_nw(self):
        """Σ_j KL(q(μ_j,Λ_j) ‖ p) via the Bregman identity on A(η)."""
        total = torch.zeros((), dtype=self.dtype)
        for j in range(self.k):
            e_lam = self.nu[j] * self.W[j]
            e_lam_mu = e_lam @ self.m[j]
            e_quad = self.m[j] @ e_lam_mu + self.d / self.kappa[j]
            e_logdet = self._e_log_det()[j]
            # natural params of posterior/prior in the [Λ, Λμ, μΛμ, logdet] basis
            def nat(m, kap, W, nu):
                w_inv = torch.linalg.inv(W)
                return (
                    -0.5 * (w_inv + kap * torch.outer(m, m)),
                    kap * m,
                    -0.5 * kap,
                    0.5 * (nu - self.d),
                )
            nq = nat(self.m[j], self.kappa[j], self.W[j], self.nu[j])
            np_ = nat(self.m0, torch.tensor(self.k0, dtype=self.dtype), self.W0,
                      torch.tensor(self.nu0, dtype=self.dtype))
            inner = (
                ((nq[0] - np_[0]) * e_lam).sum()
                + (nq[1] - np_[1]) @ (self.nu[j] * self.W[j] @ self.m[j])
                + (nq[2] - np_[2]) * e_quad
                + (nq[3] - np_[3]) * e_logdet
            )
            total = total + inner \
                - self._log_norm_nw(self.kappa[j], self.W[j], self.nu[j]) \
                + self._log_norm_nw(torch.tensor(self.k0, dtype=self.dtype),
                                    self.W0, torch.tensor(self.nu0, dtype=self.dtype))
        return total

    def elbo(self, x):
        llh, _ = self.estep(x)
        return llh.sum() - self._kl_dirichlet() - self._kl_nw()

    def em_step(self, x):
        """One full VB-EM iteration; returns the pre-update ELBO."""
        llh, resps = self.estep(x)
        elbo = llh.sum() - self._kl_dirichlet() - self._kl_nw()
        self.mstep(x, resps)
        return elbo


def torch_forward_backward(llh, log_trans, log_init, log_final):
    """Sequential log-domain forward-backward (the reference's hot loop).

    llh: (T, S) frame log-likelihoods. Returns (log_alpha, log_beta, logZ).
    """
    t_len, s = llh.shape
    log_alpha = torch.empty_like(llh)
    log_beta = torch.empty_like(llh)
    log_alpha[0] = log_init + llh[0]
    for t in range(1, t_len):
        log_alpha[t] = llh[t] + torch.logsumexp(
            log_alpha[t - 1][:, None] + log_trans, dim=0
        )
    log_beta[-1] = log_final
    for t in range(t_len - 2, -1, -1):
        log_beta[t] = torch.logsumexp(
            log_trans + (llh[t + 1] + log_beta[t + 1])[None, :], dim=1
        )
    log_z = torch.logsumexp(log_alpha[-1] + log_final, dim=0)
    return log_alpha, log_beta, log_z
