"""Resampling tests: the vectorised optimal finite-state scheme must agree
with a direct NumPy port of the reference's fixed-point iteration
(resampling_functions.py:7-52)."""

import numpy as np
import jax
import jax.numpy as jnp

from hygeia_tpu.ops.resampling import (
    systematic_resampling,
    optimal_finite_state_resampling,
    keep_top_m,
)

RNG = np.random.default_rng(42)


def _reference_find_K_logc(log_weights, M):
    """NumPy port of the c-threshold while-loop in
    resampling_functions.py:8-31 (returns K and log_c)."""
    lw = log_weights - np.logaddexp.reduce(log_weights)
    sorted_lw = np.sort(lw)[::-1]
    n = len(sorted_lw)
    reverse_cum_sum = np.cumsum(np.exp(sorted_lw)[::-1])[::-1]
    # Loop body mirrors fn() in resampling_functions.py:12-15; the reference
    # returns (k_new, k_old, log_c) into loop vars (k_old, k_new, log_c).
    k_old, k_new, log_c = 0, -1, -1.0
    while (k_old != k_new) and (k_old < n) and (k_old < M):
        log_c_new = np.log(M - k_old) - np.log(reverse_cum_sum[k_old])
        k_computed = k_old + int(np.sum((log_c_new + sorted_lw[k_old:]) > 0))
        k_old, k_new, log_c = k_computed, k_old, log_c_new
    K = k_new  # reference reads K = k_new after the loop (:27)
    if K >= n:
        K, log_c = n, -np.inf
    return K, log_c


def _our_K_logc(log_weights, M):
    res = optimal_finite_state_resampling(
        jax.random.PRNGKey(0), jnp.asarray(log_weights), M
    )
    # Recover K as the number of deterministically-kept parents: they are the
    # top-K sorted indices in order.
    lw = np.asarray(log_weights)
    lw_norm = lw - np.logaddexp.reduce(lw)
    order = np.argsort(-lw_norm, kind="stable")
    parents = np.asarray(res.parent_indices)
    K = 0
    while K < M and K < len(order) and parents[K] == order[K]:
        K += 1
    return res, K, float(res.log_c)


def test_optimal_matches_reference_iteration():
    # Fixed (n, m) combos so the jit cache is reused across trials.
    for n, m in [(120, 20), (300, 50), (64, 5)]:
        for trial in range(12):
            lw = RNG.normal(scale=RNG.uniform(0.1, 6.0), size=n)
            # Randomly kill some weights.
            dead = RNG.random(n) < RNG.uniform(0, 0.5)
            lw = np.where(dead, -np.inf, lw)
            if np.sum(~dead) <= m:
                continue
            K_ref, logc_ref = _reference_find_K_logc(lw, m)
            res, K_ours, logc_ours = _our_K_logc(lw, m)
            if not np.isfinite(logc_ref):
                assert bool(res.use_unbiased), f"trial {trial}"
                continue
            assert not bool(res.use_unbiased)
            np.testing.assert_allclose(
                logc_ours,
                logc_ref,
                rtol=1e-5,
                err_msg=f"n={n} m={m} trial {trial}: K {K_ours} vs {K_ref}",
            )


def test_optimal_weight_invariants():
    """Post-resampling weights: sum min(1, c*W) = M over the support and the
    total unnormalised mass is preserved in expectation."""
    n, m = 200, 40
    lw = RNG.normal(scale=2.0, size=n)
    res = optimal_finite_state_resampling(jax.random.PRNGKey(1), jnp.asarray(lw), m)
    assert res.parent_indices.shape == (m,)
    lw_norm = lw - np.logaddexp.reduce(lw)
    c = np.exp(float(res.log_c))
    np.testing.assert_allclose(
        np.sum(np.minimum(1.0, c * np.exp(lw_norm))), m, rtol=1e-4
    )
    # Kept particles retain their exact previous weight.
    order = np.argsort(-lw_norm, kind="stable")
    K = int(np.sum(c * np.exp(lw_norm) > 1.0))
    parents = np.asarray(res.parent_indices)
    np.testing.assert_array_equal(parents[:K], order[:K])
    np.testing.assert_allclose(np.asarray(res.new_log_weights)[:K], lw[order[:K]])
    # Resampled particles all get logZ - log_c.
    logz = np.logaddexp.reduce(lw)
    np.testing.assert_allclose(
        np.asarray(res.new_log_weights)[K:], logz - float(res.log_c), rtol=1e-5
    )


def test_optimal_is_unbiased_in_expectation():
    """E[sum of offspring weights per ancestor] == ancestor weight."""
    n, m = 30, 10
    lw = RNG.normal(size=n)
    w = np.exp(lw)
    trials = 40000
    keys = jax.random.split(jax.random.PRNGKey(7), trials)
    f = jax.jit(
        jax.vmap(lambda k: optimal_finite_state_resampling(k, jnp.asarray(lw), m))
    )
    res = f(keys)
    p = np.asarray(res.parent_indices).ravel()
    nw = np.exp(np.asarray(res.new_log_weights)).ravel()
    wsum = np.zeros(n)
    np.add.at(wsum, p, nw)
    np.testing.assert_allclose(wsum / trials, w, rtol=0.05)


def test_systematic_resampling_counts():
    lw = np.log(np.array([0.5, 0.3, 0.2]))
    m = 1000
    idx = np.asarray(
        systematic_resampling(jax.random.PRNGKey(3), jnp.asarray(lw), m)
    )
    freq = np.bincount(idx, minlength=3) / m
    np.testing.assert_allclose(freq, [0.5, 0.3, 0.2], atol=0.01)


def test_keep_top_m():
    lw = np.array([-1.0, 3.0, -np.inf, 2.0, 0.0])
    res = keep_top_m(jnp.asarray(lw), 3)
    np.testing.assert_array_equal(np.asarray(res.parent_indices), [1, 3, 4])
    np.testing.assert_allclose(np.asarray(res.new_log_weights), [3.0, 2.0, 0.0])


def test_cumsum_fast_matches_cumsum():
    """The blocked-matmul prefix sum must match np.cumsum exactly in f64 and
    to f32 roundoff in f32, for sizes around/below/above the block size."""
    import numpy as np
    import jax.numpy as jnp

    from hygeia_tpu.ops.resampling import _cumsum_fast

    rng = np.random.default_rng(0)
    for n in (7, 128, 129, 300, 2400):
        x64 = rng.random(n)
        np.testing.assert_allclose(
            np.asarray(_cumsum_fast(jnp.asarray(x64, jnp.float64))),
            np.cumsum(x64),
            rtol=1e-14,
        )
        x32 = x64.astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(_cumsum_fast(jnp.asarray(x32))),
            np.cumsum(x64),
            rtol=2e-5,
        )
