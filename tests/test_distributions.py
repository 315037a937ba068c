"""Unit tests of the numerics core against SciPy (SURVEY.md section 4:
'unit tests of every density/gradient vs SciPy')."""

import numpy as np
import pytest
import scipy.stats as st
from scipy.special import logit as sp_logit, expit

import jax
import jax.numpy as jnp

from hygeia_tpu.ops import distributions as d

RNG = np.random.default_rng(0)


def test_logit_inv_logit_roundtrip():
    x = RNG.uniform(0.01, 0.99, size=50)
    np.testing.assert_allclose(np.asarray(d.logit(x)), sp_logit(x), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(d.inv_logit(sp_logit(x))), x, rtol=1e-10
    )


def test_mu_sigma_to_alpha_beta_defaults():
    # Default regime parameters from nextflow.config:5-6.
    mu = np.array([0.95, 0.05, 0.8, 0.2, 0.50, 0.50])
    sigma = np.array([0.05, 0.05, 0.1, 0.1, 0.1, 0.2886751])
    a, b = d.mu_sigma_to_alpha_beta(mu, sigma)
    a, b = np.asarray(a), np.asarray(b)
    # Mean and variance of Beta(a, b) must round-trip.
    np.testing.assert_allclose(a / (a + b), mu, rtol=1e-12)
    var = a * b / ((a + b) ** 2 * (a + b + 1))
    np.testing.assert_allclose(np.sqrt(var), sigma, rtol=1e-6)


def test_beta_binomial_log_pmf_vs_scipy():
    for _ in range(20):
        n = RNG.integers(0, 60)
        x = RNG.integers(0, n + 1) if n > 0 else 0
        a = RNG.uniform(0.1, 50)
        b = RNG.uniform(0.1, 50)
        ours = float(d.beta_binomial_log_pmf(float(x), float(n), a, b))
        ref = st.betabinom.logpmf(x, n, a, b)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_beta_binomial_out_of_range():
    assert np.isneginf(float(d.beta_binomial_log_pmf(5.0, 3.0, 1.0, 1.0)))
    assert np.isneginf(float(d.beta_binomial_log_pmf(-1.0, 3.0, 1.0, 1.0)))
    # Zero reads: point mass at zero.
    np.testing.assert_allclose(
        float(d.beta_binomial_log_pmf(0.0, 0.0, 2.0, 3.0)), 0.0, atol=1e-8
    )


def test_beta_binomial_grads_vs_finite_differences():
    x, n, a, b = 7.0, 20.0, 3.0, 5.0
    ga, gb = d.beta_binomial_log_pmf_grads(x, n, a, b)
    eps = 1e-6
    fga = (
        st.betabinom.logpmf(7, 20, a + eps, b) - st.betabinom.logpmf(7, 20, a - eps, b)
    ) / (2 * eps)
    fgb = (
        st.betabinom.logpmf(7, 20, a, b + eps) - st.betabinom.logpmf(7, 20, a, b - eps)
    ) / (2 * eps)
    np.testing.assert_allclose(float(ga), fga, rtol=1e-5)
    np.testing.assert_allclose(float(gb), fgb, rtol=1e-5)


def test_neg_binomial_log_pmf_vs_scipy():
    # Reference parametrisation (misc.h:673-693): size = number of failures
    # kappa, prob = success probability omega; support counts successes.
    # scipy.stats.nbinom(n, p) counts failures before the n-th success with
    # success prob p -> matches ours with n=size, p=1-prob.
    for _ in range(20):
        x = RNG.integers(0, 40)
        size = RNG.uniform(0.5, 10)
        prob = RNG.uniform(0.05, 0.95)
        ours = float(d.neg_binomial_log_pmf(float(x), size, prob))
        ref = st.nbinom.logpmf(x, size, 1 - prob)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_neg_binomial_prob_zero_cases():
    assert float(d.neg_binomial_log_pmf(0.0, 2.0, 0.0)) == 0.0
    assert np.isneginf(float(d.neg_binomial_log_pmf(3.0, 2.0, 0.0)))


def test_neg_binomial_grads_vs_finite_differences():
    x, size, prob = 6.0, 2.0, 0.9
    eps = 1e-6
    gs = float(d.neg_binomial_grad_size(x, size, prob))
    gp = float(d.neg_binomial_grad_prob(x, size, prob))
    f = lambda s, p: st.nbinom.logpmf(6, s, 1 - p)
    np.testing.assert_allclose(gs, (f(size + eps, prob) - f(size - eps, prob)) / (2 * eps), rtol=1e-4)
    np.testing.assert_allclose(gp, (f(size, prob + eps) - f(size, prob - eps)) / (2 * eps), rtol=1e-4)


def test_row_softmax_offdiag():
    R = 6
    theta = RNG.normal(size=R * (R - 1))
    P = np.asarray(d.row_softmax_offdiag(jnp.asarray(theta), R))
    assert P.shape == (R, R)
    np.testing.assert_allclose(np.diag(P), 0.0, atol=1e-15)
    np.testing.assert_allclose(P.sum(axis=1), 1.0, rtol=1e-6)
    # Row r must match softmax of the r-th block (singleGroup.h:197-212).
    blk = theta.reshape(R, R - 1)
    for r in range(R):
        e = np.exp(blk[r] - blk[r].max())
        probs = e / e.sum()
        np.testing.assert_allclose(np.delete(P[r], r), probs, rtol=1e-6)


def test_emission_table_matches_per_particle_eval():
    from hygeia_tpu.ops.emissions import emission_log_prob_table

    T, S, R = 11, 3, 6
    mu = np.array([0.95, 0.05, 0.8, 0.2, 0.50, 0.50])
    sigma = np.array([0.05, 0.05, 0.1, 0.1, 0.1, 0.2886751])
    a, b = d.mu_sigma_to_alpha_beta(mu, sigma)
    n = RNG.poisson(20, size=(T, S)).astype(np.float64)
    y = np.minimum(RNG.poisson(8, size=(T, S)), n).astype(np.float64)
    table = np.asarray(emission_log_prob_table(y, n, a, b, dtype=jnp.float64))
    assert table.shape == (T, R)
    for t in range(T):
        for r in range(R):
            ref = sum(
                st.betabinom.logpmf(y[t, s], n[t, s], float(a[r]), float(b[r]))
                for s in range(S)
            )
            np.testing.assert_allclose(table[t, r], ref, rtol=1e-4, atol=1e-5)
