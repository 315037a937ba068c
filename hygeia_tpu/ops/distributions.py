"""Elementary log-densities used by both inference engines.

All functions are pure, fully vectorised jnp functions (VPU-friendly; no
data-dependent control flow) and safe under ``jit``/``vmap``/``grad``.

Parity targets (see docstrings): the reference's C++ numerics library
(`/root/reference/src/single_group/src/cpp/misc/misc.h`) and the TFP-based
two-group model (`/root/reference/src/two_group/hygeia/case_control_regime_model.py`).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln, digamma

_NEG_INF = -jnp.inf


def logit(x):
    """log(x / (1-x)). Mirrors model_functions.R:7-9."""
    return jnp.log(x) - jnp.log1p(-x)


def inv_logit(x):
    """Logistic function 1/(1+exp(-x)). Mirrors model_functions.R:11-13."""
    # jax.nn.sigmoid is numerically stable for both tails.
    return 1.0 / (1.0 + jnp.exp(-x))


def grad_logit_at_inv_logit(p):
    """d(inv_logit)/dtheta evaluated at p = inv_logit(theta), i.e. p*(1-p).

    Mirrors `gradLogitEvaluatedAtInverseLogit` usage in singleGroup.h:322.
    """
    return p * (1.0 - p)


def mu_sigma_to_alpha_beta(mu, sigma):
    """Convert a (mean, sd) parameterisation of a Beta law to shape params.

    nu = mu(1-mu)/sigma^2 - 1; alpha = mu*nu; beta = (1-mu)*nu.
    Mirrors case_control_regime_model.py:19-23 and model_functions.R:44-47.
    """
    nu = mu * (1.0 - mu) / (sigma**2) - 1.0
    return mu * nu, (1.0 - mu) * nu


def beta_binomial_log_pmf(x, n, alpha, beta):
    """Log-pmf of BetaBinomial(n; alpha, beta) at x (methylated read count).

    Matches misc.h:630-640 (`evaluateLogBetaBinomialDensity`) including the
    -inf return for x > n. Inputs may be floats (counts are stored as f32
    matrices on device); all shapes broadcast.
    """
    lp = (
        gammaln(n + 1.0)
        - gammaln(x + 1.0)
        - gammaln(n - x + 1.0)
        + gammaln(x + alpha)
        + gammaln(n - x + beta)
        - gammaln(n + alpha + beta)
        + gammaln(alpha + beta)
        - gammaln(alpha)
        - gammaln(beta)
    )
    valid = (x >= 0) & (x <= n)
    return jnp.where(valid, lp, _NEG_INF)


def beta_binomial_log_pmf_grads(x, n, alpha, beta):
    """(d/dalpha, d/dbeta) of the BetaBinomial log-pmf.

    Matches misc.h:643-666. Returns zeros where x > n.
    """
    valid = (x >= 0) & (x <= n)
    common = digamma(alpha + beta) - digamma(n + alpha + beta)
    ga = digamma(x + alpha) - digamma(alpha) + common
    gb = digamma(n - x + beta) - digamma(beta) + common
    zero = jnp.zeros_like(ga)
    return jnp.where(valid, ga, zero), jnp.where(valid, gb, zero)


def neg_binomial_log_pmf(x, size, prob):
    """Log-pmf of NegativeBinomial with real-valued `size` (number of
    failures kappa) and success probability `prob` (omega) at count x >= 0.

    Matches misc.h:673-693 (`evaluateLogNegativeBinomialDensity`) including
    the prob == 0 special cases, and TFP's NegativeBinomial log_prob as used
    by the two-group model (case_control_regime_model.py:117-122 — note the
    reference feeds logits through a double inverse-logit so the effective
    success probability there is also `omega`).
    """
    lp = (
        gammaln(x + size)
        - gammaln(size)
        - gammaln(x + 1.0)
        + size * jnp.log1p(-prob)
        + x * jnp.log(prob)
    )
    # prob == 0: pmf is a point mass at x == 0.
    lp = jnp.where(prob == 0.0, jnp.where(x == 0.0, 0.0, _NEG_INF), lp)
    return jnp.where(x >= 0, lp, _NEG_INF)


def neg_binomial_grad_size(x, size, prob):
    """d/dsize of the NB log-pmf. Matches misc.h:699-707."""
    return digamma(x + size) - digamma(size) + jnp.log1p(-prob)


def neg_binomial_grad_prob(x, size, prob):
    """d/dprob of the NB log-pmf. Matches misc.h:710-718."""
    return x / prob - size / (1.0 - prob)


def row_softmax_offdiag(theta_p, n_regimes):
    """Build the regime transition matrix P from the packed off-diagonal
    softmax parameters (row-major, R*(R-1) entries).

    Row r of P is softmax over its R-1 off-diagonal entries (diagonal 0).
    Matches singleGroup.h:197-212 (`setUnknownParameters`) and
    model_functions.R:81-95.
    """
    R = n_regimes
    theta_p = theta_p.reshape(R, R - 1)
    # Stable row softmax.
    m = jnp.max(theta_p, axis=1, keepdims=True)
    e = jnp.exp(theta_p - m)
    rows = e / jnp.sum(e, axis=1, keepdims=True)
    # Insert zero diagonal: row r gets a 0 inserted at position r.
    P = jnp.zeros((R, R), dtype=theta_p.dtype)
    cols = jnp.arange(R - 1)
    for r in range(R):  # R is a small static constant (6); unrolled.
        target_cols = jnp.where(cols < r, cols, cols + 1)
        P = P.at[r, target_cols].set(rows[r])
    return P


def log_row_softmax_offdiag(theta_p, n_regimes):
    """log(P) with -inf on the diagonal (for weight computations)."""
    P = row_softmax_offdiag(theta_p, n_regimes)
    return jnp.where(P > 0.0, jnp.log(P), _NEG_INF)
