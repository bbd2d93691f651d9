"""Oracle tests for the exponential-family core.

Mirrors the reference's test strategy (SURVEY.md §4): every family is
checked against float64 numpy/scipy re-implementations — log-normalizers,
expected sufficient statistics (∇A), KL divergences — plus the conjugacy
layout itself: Bayes updates via natural-parameter addition must reproduce
the textbook closed-form posteriors.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import special as sps

from beer_tpu import dists
from beer_tpu.dists import normallik


def _np(x):
    return np.asarray(x, dtype=np.float64)


# ----------------------------------------------------------------------
# Dirichlet
# ----------------------------------------------------------------------
class TestDirichlet:
    def test_log_norm_and_expected_stats(self, rng):
        alpha = _np(rng.uniform(0.3, 4.0, size=(5, 7)))
        fam = dists.Dirichlet(dim=7)
        nat = fam.to_nat(jnp.asarray(alpha))
        # log B(alpha)
        oracle = sps.gammaln(alpha).sum(-1) - sps.gammaln(alpha.sum(-1))
        np.testing.assert_allclose(_np(fam.log_norm(nat)), oracle, rtol=1e-10)
        # E[log pi]
        est = _np(fam.expected_sufficient_statistics(nat))
        oracle_es = sps.digamma(alpha) - sps.digamma(alpha.sum(-1, keepdims=True))
        np.testing.assert_allclose(est, oracle_es, rtol=1e-9, atol=1e-12)

    def test_kl(self, rng):
        a_q = _np(rng.uniform(0.5, 4.0, size=6))
        a_p = _np(rng.uniform(0.5, 4.0, size=6))
        fam = dists.Dirichlet(dim=6)
        kl = _np(fam.kl_div(fam.to_nat(jnp.asarray(a_q)), fam.to_nat(jnp.asarray(a_p))))
        # closed-form Dirichlet KL
        oracle = (
            sps.gammaln(a_q.sum())
            - sps.gammaln(a_q).sum()
            - sps.gammaln(a_p.sum())
            + sps.gammaln(a_p).sum()
            + ((a_q - a_p) * (sps.digamma(a_q) - sps.digamma(a_q.sum()))).sum()
        )
        np.testing.assert_allclose(kl, oracle, rtol=1e-9)
        np.testing.assert_allclose(
            _np(fam.kl_div(fam.to_nat(jnp.asarray(a_q)), fam.to_nat(jnp.asarray(a_q)))),
            0.0,
            atol=1e-10,
        )


# ----------------------------------------------------------------------
# Gamma
# ----------------------------------------------------------------------
class TestGamma:
    def test_expected_stats(self, rng):
        a = _np(rng.uniform(0.5, 5.0, size=4))
        b = _np(rng.uniform(0.5, 5.0, size=4))
        fam = dists.Gamma()
        nat = fam.to_nat(jnp.asarray(a), jnp.asarray(b))
        est = _np(fam.expected_sufficient_statistics(nat))
        np.testing.assert_allclose(est[..., 0], a / b, rtol=1e-9)
        np.testing.assert_allclose(est[..., 1], sps.digamma(a) - np.log(b), rtol=1e-8)

    def test_roundtrip(self, rng):
        a, b = 2.5, 1.7
        fam = dists.Gamma()
        a2, b2 = fam.to_std(fam.to_nat(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose([float(a2), float(b2)], [a, b], rtol=1e-12)


# ----------------------------------------------------------------------
# NormalGamma (diag)
# ----------------------------------------------------------------------
class TestNormalGamma:
    def test_expected_stats(self, rng):
        d = 5
        m = _np(rng.normal(size=d))
        kappa = _np(rng.uniform(0.5, 3.0, size=d))
        a = _np(rng.uniform(1.0, 5.0, size=d))
        b = _np(rng.uniform(0.5, 3.0, size=d))
        fam = dists.NormalGamma(dim=d)
        nat = fam.to_nat(*map(jnp.asarray, (m, kappa, a, b)))
        est = _np(fam.expected_sufficient_statistics(nat))
        # T = [lam, lam*mu, lam*mu^2, log lam]
        np.testing.assert_allclose(est[:d], a / b, rtol=1e-8)
        np.testing.assert_allclose(est[d : 2 * d], m * a / b, rtol=1e-8)
        np.testing.assert_allclose(
            est[2 * d : 3 * d], m**2 * a / b + 1.0 / kappa, rtol=1e-8
        )
        np.testing.assert_allclose(
            est[3 * d :], sps.digamma(a) - np.log(b), rtol=1e-7, atol=1e-10
        )

    def test_bayes_update_matches_textbook(self, rng):
        """eta_post = eta_prior + sum_t s(x_t) must equal the closed form."""
        d, n = 3, 50
        x = _np(rng.normal(size=(n, d)))
        m0, k0, a0, b0 = _np(rng.normal(size=d)), 2.0, 3.0, 1.5
        fam = dists.NormalGamma(dim=d)
        nat0 = fam.to_nat(
            jnp.asarray(m0), jnp.full(d, k0), jnp.full(d, a0), jnp.full(d, b0)
        )
        stats = normallik.suff_stats_diag(jnp.asarray(x)).sum(0)
        m, k, a, b = map(_np, fam.to_std(nat0 + stats))
        xbar = x.mean(0)
        np.testing.assert_allclose(k, k0 + n, rtol=1e-12)
        np.testing.assert_allclose(m, (k0 * m0 + n * xbar) / (k0 + n), rtol=1e-9)
        np.testing.assert_allclose(a, a0 + n / 2.0, rtol=1e-12)
        oracle_b = (
            b0
            + 0.5 * ((x - xbar) ** 2).sum(0)
            + 0.5 * k0 * n * (xbar - m0) ** 2 / (k0 + n)
        )
        np.testing.assert_allclose(b, oracle_b, rtol=1e-8)


# ----------------------------------------------------------------------
# IsotropicNormalGamma
# ----------------------------------------------------------------------
class TestIsotropicNormalGamma:
    def test_expected_stats(self, rng):
        d = 4
        m = _np(rng.normal(size=d))
        kappa, a, b = 1.3, 2.2, 0.9
        fam = dists.IsotropicNormalGamma(dim=d)
        nat = fam.to_nat(jnp.asarray(m), kappa, a, b)
        est = _np(fam.expected_sufficient_statistics(nat))
        np.testing.assert_allclose(est[0], a / b, rtol=1e-8)
        np.testing.assert_allclose(est[1 : 1 + d], m * a / b, rtol=1e-8)
        np.testing.assert_allclose(
            est[1 + d], (m**2).sum() * a / b + d / kappa, rtol=1e-8
        )
        np.testing.assert_allclose(est[2 + d], sps.digamma(a) - np.log(b), rtol=1e-8)

    def test_roundtrip(self, rng):
        d = 4
        m = _np(rng.normal(size=d))
        fam = dists.IsotropicNormalGamma(dim=d)
        m2, k2, a2, b2 = fam.to_std(fam.to_nat(jnp.asarray(m), 1.3, 2.2, 0.9))
        np.testing.assert_allclose(_np(m2), m, rtol=1e-12)
        np.testing.assert_allclose(
            [float(k2), float(a2), float(b2)], [1.3, 2.2, 0.9], rtol=1e-12
        )


# ----------------------------------------------------------------------
# Wishart / NormalWishart
# ----------------------------------------------------------------------
def _random_pd(rng, d):
    q = _np(rng.normal(size=(d, d)))
    return q @ q.T + d * np.eye(d)


class TestWishart:
    def test_expected_stats(self, rng):
        d = 3
        w = _random_pd(rng, d)
        nu = d + 2.5
        fam = dists.Wishart(dim=d)
        nat = fam.to_nat(jnp.asarray(w), nu)
        est = _np(fam.expected_sufficient_statistics(nat))
        np.testing.assert_allclose(
            est[: d * d].reshape(d, d), nu * w, rtol=1e-7
        )
        oracle_logdet = (
            sps.digamma(0.5 * (nu - np.arange(d))).sum()
            + d * np.log(2.0)
            + np.linalg.slogdet(w)[1]
        )
        np.testing.assert_allclose(est[-1], oracle_logdet, rtol=1e-7)


class TestNormalWishart:
    def test_expected_stats(self, rng):
        d = 3
        m = _np(rng.normal(size=d))
        kappa, nu = 1.7, d + 3.0
        w = _random_pd(rng, d)
        fam = dists.NormalWishart(dim=d)
        nat = fam.to_nat(jnp.asarray(m), kappa, jnp.asarray(w), nu)
        est = _np(fam.expected_sufficient_statistics(nat))
        np.testing.assert_allclose(est[: d * d].reshape(d, d), nu * w, rtol=1e-6)
        np.testing.assert_allclose(est[d * d : d * d + d], nu * w @ m, rtol=1e-6)
        np.testing.assert_allclose(est[-2], m @ (nu * w) @ m + d / kappa, rtol=1e-6)
        oracle_logdet = (
            sps.digamma(0.5 * (nu - np.arange(d))).sum()
            + d * np.log(2.0)
            + np.linalg.slogdet(w)[1]
        )
        np.testing.assert_allclose(est[-1], oracle_logdet, rtol=1e-6)

    def test_roundtrip(self, rng):
        d = 4
        m = _np(rng.normal(size=d))
        w = _random_pd(rng, d)
        fam = dists.NormalWishart(dim=d)
        m2, k2, w2, nu2 = fam.to_std(fam.to_nat(jnp.asarray(m), 2.1, jnp.asarray(w), d + 2.0))
        np.testing.assert_allclose(_np(m2), m, rtol=1e-9)
        np.testing.assert_allclose(float(k2), 2.1, rtol=1e-12)
        np.testing.assert_allclose(_np(w2), w, rtol=1e-8)
        np.testing.assert_allclose(float(nu2), d + 2.0, rtol=1e-12)

    def test_bayes_update_matches_textbook(self, rng):
        d, n = 3, 40
        x = _np(rng.normal(size=(n, d)))
        m0 = _np(rng.normal(size=d))
        k0, nu0 = 1.5, d + 2.0
        w0 = _random_pd(rng, d)
        fam = dists.NormalWishart(dim=d)
        nat0 = fam.to_nat(jnp.asarray(m0), k0, jnp.asarray(w0), nu0)
        stats = normallik.suff_stats_full(jnp.asarray(x)).sum(0)
        m, k, w, nu = map(_np, fam.to_std(nat0 + stats))
        xbar = x.mean(0)
        s = ((x - xbar).T @ (x - xbar))
        np.testing.assert_allclose(k, k0 + n, rtol=1e-12)
        np.testing.assert_allclose(nu, nu0 + n, rtol=1e-10)
        np.testing.assert_allclose(m, (k0 * m0 + n * xbar) / (k0 + n), rtol=1e-9)
        w_inv_post = (
            np.linalg.inv(w0)
            + s
            + (k0 * n / (k0 + n)) * np.outer(xbar - m0, xbar - m0)
        )
        np.testing.assert_allclose(np.linalg.inv(w), w_inv_post, rtol=1e-6)

    def test_ellh_matches_logpdf_for_sharp_posterior(self, rng):
        """With huge kappa/nu the ELLH approaches the plug-in log N(x|m, (nuW)^-1)."""
        d = 2
        m = _np(rng.normal(size=d))
        cov = _random_pd(rng, d) / 10.0
        nu = 1e7
        w = np.linalg.inv(cov) / nu
        fam = dists.NormalWishart(dim=d)
        nat = fam.to_nat(jnp.asarray(m), 1e7, jnp.asarray(w), nu)
        x = _np(rng.normal(size=(9, d)))
        stats = normallik.suff_stats_full(jnp.asarray(x))
        ellh = _np(stats @ fam.expected_sufficient_statistics(nat)) - 0.5 * d * np.log(
            2 * np.pi
        )
        from scipy.stats import multivariate_normal

        oracle = multivariate_normal(mean=m, cov=cov).logpdf(x)
        np.testing.assert_allclose(ellh, oracle, atol=1e-3)


# ----------------------------------------------------------------------
# Joint families
# ----------------------------------------------------------------------
class TestJoint:
    @pytest.mark.parametrize("ncomp", [1, 4])
    def test_joint_nw_expected_stats(self, rng, ncomp):
        d = 3
        means = _np(rng.normal(size=(ncomp, d)))
        kappas = _np(rng.uniform(1.0, 3.0, size=ncomp))
        nu = d + 3.0
        w = _random_pd(rng, d)
        fam = dists.JointNormalWishart(dim=d, ncomp=ncomp)
        nat = fam.to_nat(jnp.asarray(means), jnp.asarray(kappas), jnp.asarray(w), nu)
        est = _np(fam.expected_sufficient_statistics(nat))
        np.testing.assert_allclose(est[: d * d].reshape(d, d), nu * w, rtol=1e-6)
        lam_mu = est[d * d : d * d + ncomp * d].reshape(ncomp, d)
        np.testing.assert_allclose(lam_mu, means @ (nu * w).T, rtol=1e-6)
        quad = est[d * d + ncomp * d : d * d + ncomp * d + ncomp]
        oracle_quad = np.einsum("ki,ij,kj->k", means, nu * w, means) + d / kappas
        np.testing.assert_allclose(quad, oracle_quad, rtol=1e-6)

    def test_joint_nw_matches_separate_update(self, rng):
        """Accumulating resp-weighted shared stats = textbook tied-cov update."""
        d, k, n = 2, 3, 30
        x = _np(rng.normal(size=(n, d)))
        resps = _np(rng.dirichlet(np.ones(k), size=n))
        means0 = _np(rng.normal(size=(k, d)))
        kappas0 = np.full(k, 1.3)
        nu0 = d + 2.0
        w0 = _random_pd(rng, d)
        fam = dists.JointNormalWishart(dim=d, ncomp=k)
        nat0 = fam.to_nat(jnp.asarray(means0), jnp.asarray(kappas0), jnp.asarray(w0), nu0)
        s = normallik.suff_stats_shared_full(jnp.asarray(x), k)  # (n, k, P)
        acc = jnp.einsum("nk,nkp->p", jnp.asarray(resps), s)
        means, kappas, w, nu = map(_np, fam.to_std(nat0 + acc))
        nk = resps.sum(0)
        np.testing.assert_allclose(kappas, kappas0 + nk, rtol=1e-10)
        np.testing.assert_allclose(nu, nu0 + n, rtol=1e-9)
        for j in range(k):
            oracle_m = (kappas0[j] * means0[j] + resps[:, j] @ x) / (kappas0[j] + nk[j])
            np.testing.assert_allclose(means[j], oracle_m, rtol=1e-8)

    def test_joint_ng_expected_stats(self, rng):
        d, k = 3, 2
        means = _np(rng.normal(size=(k, d)))
        kappas = _np(rng.uniform(1.0, 2.0, size=(k, d)))
        a = _np(rng.uniform(2.0, 4.0, size=d))
        b = _np(rng.uniform(1.0, 2.0, size=d))
        fam = dists.JointNormalGamma(dim=d, ncomp=k)
        nat = fam.to_nat(*map(jnp.asarray, (means, kappas, a, b)))
        est = _np(fam.expected_sufficient_statistics(nat))
        np.testing.assert_allclose(est[:d], a / b, rtol=1e-7)
        np.testing.assert_allclose(
            est[d : d + k * d].reshape(k, d), means * (a / b), rtol=1e-7
        )
        np.testing.assert_allclose(
            est[d + k * d : d + 2 * k * d].reshape(k, d),
            means**2 * (a / b) + 1.0 / kappas,
            rtol=1e-7,
        )

    def test_joint_iso_roundtrip(self, rng):
        d, k = 3, 2
        means = _np(rng.normal(size=(k, d)))
        kappas = _np(rng.uniform(1.0, 2.0, size=k))
        fam = dists.JointIsotropicNormalGamma(dim=d, ncomp=k)
        nat = fam.to_nat(jnp.asarray(means), jnp.asarray(kappas), 2.0, 1.5)
        m2, k2, a2, b2 = fam.to_std(nat)
        np.testing.assert_allclose(_np(m2), means, rtol=1e-9)
        np.testing.assert_allclose(_np(k2), kappas, rtol=1e-9)
        np.testing.assert_allclose([float(a2), float(b2)], [2.0, 1.5], rtol=1e-9)


# ----------------------------------------------------------------------
# Generic properties
# ----------------------------------------------------------------------
@pytest.mark.parametrize(
    "fam,maker",
    [
        (dists.Dirichlet(dim=5), lambda rng, fam: fam.to_nat(jnp.asarray(_np(rng.uniform(0.5, 3.0, size=5))))),
        (dists.Gamma(), lambda rng, fam: fam.to_nat(jnp.asarray(2.0), jnp.asarray(1.0))),
        (
            dists.NormalGamma(dim=3),
            lambda rng, fam: fam.to_nat(
                jnp.asarray(_np(rng.normal(size=3))),
                jnp.ones(3),
                2 * jnp.ones(3),
                jnp.ones(3),
            ),
        ),
        (
            dists.NormalWishart(dim=3),
            lambda rng, fam: fam.to_nat(
                jnp.asarray(_np(rng.normal(size=3))),
                1.5,
                jnp.asarray(_random_pd(rng, 3)),
                6.0,
            ),
        ),
    ],
)
def test_kl_nonnegative_and_zero_on_self(rng, fam, maker):
    nat_q = maker(rng, fam)
    nat_p = maker(rng, fam)
    np.testing.assert_allclose(_np(fam.kl_div(nat_q, nat_q)), 0.0, atol=1e-8)
    assert float(fam.kl_div(nat_q, nat_p)) >= -1e-8
