"""Sharded inference on the virtual 8-device CPU mesh: block/seed sharding
must reproduce the single-device result statistically."""

import numpy as np
import jax
import jax.numpy as jnp

from hygeia_tpu.parallel import make_mesh, sharded_two_group_inference
from hygeia_tpu.two_group.simulate import simulate
from tests.test_two_group_model import default_params


def test_sharded_matches_simulated_truth():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    R = 4
    params = default_params(R=R, min_duration=2, d_max=128)
    # default_params uses float64 tables; fine on CPU.
    T, S = 240, 2
    n_tot = np.full((T, S), 40.0)
    sim = simulate(jax.random.PRNGKey(0), params, n_tot, n_tot)

    mesh = make_mesh(n_genome=4, n_seed=2)
    traj, log_z = sharded_two_group_inference(
        mesh,
        params,
        np.asarray(sim.obs_control),
        n_tot,
        np.asarray(sim.obs_case),
        n_tot,
        segment_size=60,
        buffer_size=20,
        num_resampled_ancestors=20,
        num_samples_backward=30,
        seeds=[0, 1],
        weight_dtype=jnp.float64,
    )
    assert traj.shape == (240, 60, 5)
    assert log_z.shape == (4, 2)
    assert np.isfinite(log_z).all()

    true_states = np.asarray(sim.states)
    mode = np.zeros(T, np.int32)
    for t in range(T):
        mode[t] = np.bincount(traj[t, :, 2], minlength=R).argmax()
    acc = np.mean(mode == true_states[:, 2])
    assert acc > 0.85, f"sharded control-regime recovery {acc}"


def test_exchange_boundary_matches_exact_inference():
    """boundary="exchange" with full-window warmup has distributionally
    exact boundary messages on a 2-block split: block 0's warmup cold-starts
    at the true genome start, so block 1 warm-starts from the exact filter
    state, and the conditioned backward round makes block 0's trajectories
    exact smoothing draws. Marginals must match the enumerated
    forward-backward oracle to PF accuracy (like the single-block test in
    test_two_group_filter)."""
    from tests.test_two_group_filter import _exact_forward_backward
    from hygeia_tpu.ops.emissions import emission_log_prob_table
    from hygeia_tpu.two_group.backward import smoothing_functionals

    T, R = 10, 3
    params = default_params(R=R, min_duration=2, d_max=32)
    rng = np.random.default_rng(11)
    n_c = rng.poisson(25, size=(T, 1)).astype(np.float64)
    n_k = rng.poisson(25, size=(T, 1)).astype(np.float64)
    y_c = np.minimum(rng.poisson(10, size=(T, 1)), n_c)
    y_k = np.minimum(rng.poisson(10, size=(T, 1)), n_k)
    E_c = emission_log_prob_table(y_c, n_c, params.alpha, params.beta, dtype=jnp.float64)
    E_k = emission_log_prob_table(y_k, n_k, params.alpha, params.beta, dtype=jnp.float64)

    phantom_r = 1
    log_z_exact, split_exact, ctrl_exact, case_exact = _exact_forward_backward(
        params, E_c, E_k, phantom_r, T
    )

    mesh = make_mesh(n_genome=2, n_seed=4)
    seeds = [0, 1, 2, 3]
    traj, log_z = sharded_two_group_inference(
        mesh,
        params,
        y_c,
        n_c,
        y_k,
        n_k,
        segment_size=5,
        buffer_size=3,  # warmup 2*3=6 -> clamped to the 5-site window
        num_resampled_ancestors=60,
        num_samples_backward=500,
        seeds=seeds,
        weight_dtype=jnp.float64,
        boundary="exchange",
        phantom_regime=phantom_r,
    )
    assert traj.shape == (10, 4 * 500, 5)
    assert log_z.shape == (2, 4)
    # Sum of per-window logZ approximates the full-genome logZ per seed.
    np.testing.assert_allclose(log_z.sum(axis=0), log_z_exact, atol=0.1)

    split_pf, regime_pf = smoothing_functionals(traj.astype(np.int32), R)
    np.testing.assert_allclose(np.asarray(split_pf), split_exact, atol=0.05)
    np.testing.assert_allclose(np.asarray(regime_pf)[:, :R], ctrl_exact, atol=0.05)
    np.testing.assert_allclose(np.asarray(regime_pf)[:, R:], case_exact, atol=0.05)


def test_block_windows_padding():
    from hygeia_tpu.parallel.sharded import make_block_windows

    arr = np.arange(20, dtype=np.float64).reshape(10, 2)
    w = make_block_windows(arr, segment_size=4, buffer_size=2, n_blocks=3)
    assert w.shape == (3, 8, 2)
    # Block 0: two zero-pad rows then sites 0..5.
    np.testing.assert_array_equal(w[0, :2], 0.0)
    np.testing.assert_array_equal(w[0, 2:], arr[:6])
    # Block 1 covers sites 2..9 (4-4+... window [4-2, 8+2) = sites 2..9).
    np.testing.assert_array_equal(w[1], arr[2:10])
    # Block 2: sites 6..9 then zero padding.
    np.testing.assert_array_equal(w[2, :4], arr[6:10])
    np.testing.assert_array_equal(w[2, 4:], 0.0)
