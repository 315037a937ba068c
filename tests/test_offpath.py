"""Parity tests for the three off-main-path reference components
(VERDICT round 2 "missing" 1-3): the safeguarded Newton root finder
(newton.h:23-86), the conditional resamplers (resample.h:65-281) and the
discrete-normal distribution family (misc.h:187-533)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from hygeia_tpu.ops import discrete_normal as dn
from hygeia_tpu.ops import resampling as rs
from hygeia_tpu.ops.newton import safeguarded_newton


# ---------------------------------------------------------------------------
# Newton (newton.h:23-86)
# ---------------------------------------------------------------------------


def _newton_reference(f, f1, lb, ub, tol_x, tol_f, n_iterations):
    """Direct NumPy port of findRoot::saveguardedNewton (the oracle)."""
    a, b = lb, ub
    fa, fb = f(lb), f(ub)
    i = 0
    x = a
    if fa * fb > 0:
        return x, False
    fx = f(x)
    while (i == 0) or (abs(a - b) > tol_x and abs(fx) > tol_f and i < n_iterations):
        # np.float64 division: f1(x) == 0 yields +-inf like the C++ double
        # arithmetic, not Python's ZeroDivisionError.
        with np.errstate(divide="ignore", invalid="ignore"):
            x1 = x - np.float64(fx) / np.float64(f1(x))
        if ((fa * f(x1) < 0) or (fb * f(x1) < 0)) and (a < x1 < b):
            x = x1
        else:
            x = (a + b) / 2
        fx = f(x)
        i += 1
        if fa * fx <= 0:
            b, fb = x, fx
        else:
            a, fa = x, fx
    return x, True


@pytest.mark.parametrize(
    "f,f1,lb,ub,root",
    [
        (lambda x: x * x - 2.0, lambda x: 2.0 * x, 0.0, 2.0, np.sqrt(2.0)),
        (lambda x: jnp.cos(x) - x, lambda x: -jnp.sin(x) - 1.0, 0.0, 1.5, 0.7390851332151607),
        # f'(x) tiny near lb: Newton steps overshoot, bisection safeguard
        # must engage.
        (lambda x: x**3 - 2.0 * x + 2.0, lambda x: 3.0 * x * x - 2.0, -3.0, 0.0, -1.7692923542386314),
    ],
)
def test_newton_matches_reference_port(f, f1, lb, ub, root):
    x, ok = safeguarded_newton(f, f1, lb, ub, tol_x=1e-12, tol_f=1e-12, n_iterations=100)
    x_ref, ok_ref = _newton_reference(
        lambda v: float(f(v)), lambda v: float(f1(v)), lb, ub, 1e-12, 1e-12, 100
    )
    assert bool(ok) is True and ok_ref is True
    # Same safeguard decisions -> the iterate sequences coincide.
    np.testing.assert_allclose(float(x), x_ref, rtol=0, atol=1e-12)
    np.testing.assert_allclose(float(x), root, rtol=1e-10)


def test_newton_non_bracketing():
    x, ok = safeguarded_newton(lambda v: v * v - 2.0, lambda v: 2.0 * v, 2.0, 3.0)
    assert not bool(ok)
    assert float(x) == 2.0  # reference returns x = a = lb untouched


def test_newton_jittable():
    fn = jax.jit(
        lambda lo, hi: safeguarded_newton(
            lambda v: v * v - 2.0, lambda v: 2.0 * v, lo, hi
        )[0]
    )
    np.testing.assert_allclose(float(fn(0.0, 2.0)), np.sqrt(2.0), rtol=1e-10)


# ---------------------------------------------------------------------------
# Conditional resamplers (resample.h:65-281)
# ---------------------------------------------------------------------------


def _conditional_systematic_reference(u, u_strat, w, n, a):
    """Direct NumPy port of resample.h:154-281 (conditionalSystematicBase),
    with sampleInt's inverse-CDF draw (misc.h:155-159) fed by u_strat."""
    q = np.cumsum(n * w)
    bins = np.ceil(q).astype(int) - 1
    bins[bins == n] = n - 1
    bins = np.clip(bins, 0, n - 1)
    if a == 0 or bins[a] == bins[a - 1]:
        b = bins[a]
    else:
        w_aux = np.zeros(n)
        if bins[a] > bins[a - 1] + 1:
            w_aux[bins[a - 1] + 1 : bins[a]] = 1.0
        w_aux[bins[a]] = q[a] - bins[a]
        w_aux[bins[a - 1]] = bins[a - 1] - q[a - 1] + 1.0
        w_aux = w_aux / w_aux.sum()
        b = int(np.argmax(np.cumsum(w_aux) >= u_strat))
    lb, ub = 0.0, 1.0
    if a > 0 and b == bins[a - 1]:
        lb = q[a - 1] - bins[a - 1]
    if b == bins[a]:
        ub = q[a] - bins[a]
    u = lb + (ub - lb) * u
    t = np.arange(n) + u
    parents = np.zeros(n, dtype=int)
    i = j = 0
    while j <= b:
        if t[j] <= q[i]:
            parents[j] = i
            j += 1
        else:
            i += 1
    if parents[b] != a:
        parents[b] = a
    i, j = a, b + 1
    while j < n:
        if i == n:
            return np.arange(n), a
        if t[j] <= q[i]:
            parents[j] = i
            j += 1
        else:
            i += 1
    return parents, b


@pytest.mark.slow
def test_conditional_systematic_matches_reference_port():
    rng = np.random.default_rng(7)
    for trial in range(200):
        n = int(rng.integers(2, 40))
        w = rng.dirichlet(np.full(n, 0.4))
        a = int(rng.integers(0, n))
        if w[a] < 1e-12:
            continue
        u = float(rng.uniform())
        u_strat = float(rng.uniform())
        got = rs.conditional_systematic_resampling(
            None, jnp.log(jnp.asarray(w)), n, a, uniforms=(u, u_strat)
        )
        exp_parents, exp_b = _conditional_systematic_reference(u, u_strat, w, n, a)
        assert int(got.b) == exp_b, (trial, w, a)
        np.testing.assert_array_equal(np.asarray(got.parent_indices), exp_parents)
        assert int(got.parent_indices[int(got.b)]) == a


def test_conditional_systematic_unbiased():
    # Marginally over the conditioning mechanism, offspring counts keep the
    # systematic-resampling support property: floor(Mw_i) <= n_i.
    w = np.array([0.5, 0.1, 0.25, 0.15])
    n = 4
    key = jax.random.PRNGKey(0)
    counts = np.zeros(4)
    trials = 400
    for k in jax.random.split(key, trials):
        got = rs.conditional_systematic_resampling(k, jnp.log(jnp.asarray(w)), n, 0)
        assert int(got.parent_indices[int(got.b)]) == 0
        counts += np.bincount(np.asarray(got.parent_indices), minlength=4)
    freq = counts / (trials * n)
    # conditioning on parent 0 biases towards 0; others stay near w
    assert freq[0] >= w[0]
    np.testing.assert_allclose(freq[2], w[2], atol=0.08)


def test_conditional_multinomial():
    w = np.array([0.4, 0.3, 0.2, 0.1])
    got = rs.conditional_multinomial_resampling(
        jax.random.PRNGKey(3), jnp.log(jnp.asarray(w)), 6, 2
    )
    assert int(got.b) == 0  # reference pins b = 0 (resample.h:76)
    assert int(got.parent_indices[0]) == 2
    assert got.parent_indices.shape == (6,)
    assert np.all(np.asarray(got.parent_indices) < 4)


# ---------------------------------------------------------------------------
# Discrete-normal family (misc.h:187-533)
# ---------------------------------------------------------------------------

MEAN, SD = 2.3, 1.7
XS = np.arange(-8, 14)


def test_discrete_normal_density_vs_scipy():
    lp = dn.log_density(jnp.asarray(XS), MEAN, SD)
    expected = np.log(
        scipy.stats.norm.cdf(XS + 1, MEAN, SD) - scipy.stats.norm.cdf(XS, MEAN, SD)
    )
    np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-9)
    # whole-line support sums to 1
    full = dn.log_density(jnp.arange(-60, 70), MEAN, SD)
    np.testing.assert_allclose(np.exp(full).sum(), 1.0, rtol=1e-12)


def test_discrete_normal_tail_fallback():
    # Upper tail where Phi(x) == 1.0 in f64 (x >= ~8.3) so the direct CDF
    # difference underflows to log(0): the reference falls back to the
    # survival-function difference (misc.h:187-195) and stays finite.
    # (Beyond x ~ 37 even the survival function underflows and both the
    # reference and this port return -inf, so probe x = 20.)
    lp = dn.log_density(20, 0.0, 1.0)
    assert np.isfinite(float(lp))
    expected = np.log(
        scipy.stats.norm.sf(20, 0.0, 1.0) - scipy.stats.norm.sf(21, 0.0, 1.0)
    )
    np.testing.assert_allclose(float(lp), expected, rtol=1e-9)


# Each family: log-density(x, mean, sd), its gradient map, and the support
# window. Truncation bounds are baked into the (x, mean, sd) signatures so
# the finite-difference probe can perturb mean/sd directly.
_FAMILIES = {
    "plain": (
        lambda x, m, s: dn.log_density(x, m, s),
        {"mean": dn.grad_mean_log_density, "sd": dn.grad_sd_log_density},
        XS,
    ),
    "left": (
        lambda x, m, s: dn.log_density_left_truncated(x, 1, m, s),
        {
            "mean": lambda x, m, s: dn.grad_mean_log_density_left_truncated(x, 1, m, s),
            "sd": lambda x, m, s: dn.grad_sd_log_density_left_truncated(x, 1, m, s),
            "var": lambda x, m, s: dn.grad_var_log_density_left_truncated(x, 1, m, s),
        },
        np.arange(1, 30),
    ),
    "right": (
        lambda x, m, s: dn.log_density_right_truncated(x, 6, m, s),
        {
            "mean": lambda x, m, s: dn.grad_mean_log_density_right_truncated(x, 6, m, s),
            "sd": lambda x, m, s: dn.grad_sd_log_density_right_truncated(x, 6, m, s),
        },
        np.arange(-25, 7),
    ),
    "double": (
        lambda x, m, s: dn.log_density_truncated(x, 0, 8, m, s),
        {
            "mean": lambda x, m, s: dn.grad_mean_log_density_truncated(x, 0, 8, m, s),
            "sd": lambda x, m, s: dn.grad_sd_log_density_truncated(x, 0, 8, m, s),
            "var": lambda x, m, s: dn.grad_var_log_density_truncated(x, 0, 8, m, s),
        },
        np.arange(0, 9),
    ),
}


@pytest.mark.parametrize("family", list(_FAMILIES), ids=list(_FAMILIES))
def test_discrete_normal_grads_and_normalisation(family):
    logd, grads, support = _FAMILIES[family]
    xs = jnp.asarray(support)
    # 1. Each truncated law normalises over its support (the untruncated
    # whole-line case is checked in test_discrete_normal_density_vs_scipy).
    if family != "plain":
        np.testing.assert_allclose(
            np.exp(np.asarray(logd(xs, MEAN, SD))).sum(), 1.0, rtol=1e-9
        )
    # 2. Analytic gradients match central finite differences of the
    # log-density in the continuous parameters (f64 under the test config),
    # up to the reference's gradient quirk (ported verbatim, see the
    # discrete_normal module docstring): every reference formula equals
    # (1/sd) * (true gradient), and the untruncated family additionally
    # flips the sign.
    # Restrict to the healthy-density window: in the deep upper tail
    # (log p < ~-14, i.e. z > ~5) the f64 CDF difference near 1.0 cancels
    # catastrophically, making BOTH the finite-difference probe and the
    # reference's own double-precision formula numerically meaningless.
    healthy = np.asarray(logd(xs, MEAN, SD)) > -14.0
    assert healthy.sum() >= 8
    eps = 1e-6
    quirk = (-1.0 if family == "plain" else 1.0) / SD
    for name, g in grads.items():
        got = np.asarray(g(xs, MEAN, SD))
        if name == "mean":
            hi, lo = logd(xs, MEAN + eps, SD), logd(xs, MEAN - eps, SD)
        elif name == "sd":
            hi, lo = logd(xs, MEAN, SD + eps), logd(xs, MEAN, SD - eps)
        else:  # var: d/dv log p at v = sd^2 via sd = sqrt(v +- eps)
            v = SD * SD
            hi, lo = logd(xs, MEAN, np.sqrt(v + eps)), logd(xs, MEAN, np.sqrt(v - eps))
        fd = (np.asarray(hi) - np.asarray(lo)) / (2 * eps)
        np.testing.assert_allclose(
            got[healthy],
            (quirk * fd)[healthy],
            rtol=5e-4,
            atol=1e-7,
            err_msg=f"{family}/{name}",
        )


def test_discrete_normal_out_of_support_guards():
    assert float(dn.log_density_left_truncated(0, 1, MEAN, SD)) == -np.inf
    assert float(dn.log_density_right_truncated(7, 6, MEAN, SD)) == -np.inf
    assert float(dn.log_density_truncated(9, 0, 8, MEAN, SD)) == -np.inf
    assert float(dn.grad_mean_log_density_left_truncated(0, 1, MEAN, SD)) == 0.0
    assert float(dn.grad_sd_log_density_right_truncated(7, 6, MEAN, SD)) == 0.0
    assert float(dn.grad_var_log_density_truncated(-1, 0, 8, MEAN, SD)) == 0.0
