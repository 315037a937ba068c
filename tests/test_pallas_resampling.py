"""Pallas fused optimal resampler vs the XLA implementation.

Runs the kernel in interpret mode (CPU test environment; the TPU measurement
lives in tools/bisect_pallas.py). The two paths share the key-split
discipline and the systematic uniform, so on continuous random weights the
selections must agree exactly; knife-edge rounding cases are covered by
invariant checks instead.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hygeia_tpu.ops.pallas_resampling import optimal_finite_state_resampling_pallas
from hygeia_tpu.ops.resampling import optimal_finite_state_resampling


def _norm(lw):
    return lw - jax.scipy.special.logsumexp(lw)


def test_pallas_resampler_matches_xla_on_random_weights():
    N, M = 2400, 50
    rng = np.random.default_rng(0)
    for trial in range(8):
        lw = rng.gumbel(size=N).astype(np.float32) * (1.0 + trial)
        dead = rng.uniform(size=N) < 0.2
        lw = np.where(dead, -np.inf, lw)
        lwn = np.asarray(_norm(jnp.asarray(lw, jnp.float32)))
        key = jax.random.PRNGKey(trial)

        ref = optimal_finite_state_resampling(
            key, jnp.asarray(lwn), M, normalized=True
        )
        got = optimal_finite_state_resampling_pallas(
            key, jnp.asarray(lwn), M, interpret=True
        )

        assert bool(got.use_unbiased) == bool(ref.use_unbiased), trial
        np.testing.assert_allclose(
            float(got.log_c), float(ref.log_c), rtol=1e-5, atol=1e-6,
            err_msg=f"trial {trial}",
        )
        np.testing.assert_array_equal(
            np.asarray(got.top_m_indices), np.asarray(ref.top_m_indices),
            err_msg=f"trial {trial}",
        )
        np.testing.assert_array_equal(
            np.asarray(got.parent_indices), np.asarray(ref.parent_indices),
            err_msg=f"trial {trial}",
        )
        np.testing.assert_allclose(
            np.asarray(got.new_log_weights),
            np.asarray(ref.new_log_weights),
            rtol=1e-5,
            atol=1e-6,
            err_msg=f"trial {trial}",
        )


def test_pallas_resampler_fallback_and_invariants():
    M = 50
    key = jax.random.PRNGKey(3)

    # Fewer than M finite weights -> multinomial fallback (use_unbiased).
    lw = np.full(2400, -np.inf, np.float32)
    lw[:10] = 0.0
    lwn = np.asarray(_norm(jnp.asarray(lw)))
    got = optimal_finite_state_resampling_pallas(
        key, jnp.asarray(lwn), M, interpret=True
    )
    ref = optimal_finite_state_resampling(key, jnp.asarray(lwn), M, normalized=True)
    assert bool(got.use_unbiased) and bool(ref.use_unbiased)
    assert np.all(np.asarray(got.parent_indices) < 10)  # only live slots
    assert float(got.log_c) == 0.0

    # All-equal weights (exact ties): selections may legitimately differ at
    # boundary arithmetic, so check the Fearnhead invariant instead:
    # sum_i min(1, c * W_i) == M.
    lw = np.zeros(2400, np.float32)
    lwn = np.asarray(_norm(jnp.asarray(lw)))
    got = optimal_finite_state_resampling_pallas(
        key, jnp.asarray(lwn), M, interpret=True
    )
    if not bool(got.use_unbiased):
        c = np.exp(float(got.log_c))
        w = np.exp(lwn)
        np.testing.assert_allclose(np.minimum(1.0, c * w).sum(), M, rtol=1e-3)
    assert np.all(np.asarray(got.parent_indices) >= 0)
    assert np.all(np.asarray(got.parent_indices) < 2400)
