"""Single-group engine tests: exact inference comparison (no-resampling
regime), adaptive-lag smoothing accuracy, theta packing, and online
parameter-estimation recovery."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from hygeia_tpu.ops.emissions import emission_log_prob_table
from hygeia_tpu.single_group.model import (
    make_model,
    build_tables,
    parameters_to_theta,
    theta_to_parameters,
)
from hygeia_tpu.single_group.engine import EngineConfig, run_online_combined_inference
from hygeia_tpu.single_group.simulate import simulate


def _make_setup(R=3, T=12, u=2, seed=0, n_samples=2, coverage=25):
    rng = np.random.default_rng(seed)
    mu = np.linspace(0.15, 0.85, R)
    sigma = np.full(R, 0.08)
    kappa = np.full(R, 2.0)
    model = make_model(mu, sigma, u, kappa, d_max=64, dtype=jnp.float64)
    P = rng.dirichlet(np.ones(R - 1), size=R)
    Pfull = np.zeros((R, R))
    for r in range(R):
        Pfull[r, [c for c in range(R) if c != r]] = P[r]
    omega = rng.uniform(0.6, 0.95, R)
    theta = parameters_to_theta(Pfull, omega)
    n = rng.poisson(coverage, size=(T, n_samples)).astype(np.float64)
    y = np.minimum(rng.poisson(coverage * 0.4, size=(T, n_samples)), n)
    E = emission_log_prob_table(y, n, model.alpha, model.beta, dtype=jnp.float64)
    return model, theta, E


def _exact_forward_backward(model, theta, E):
    """Exact smoothing on the enumerated (d, r) space, d in 1..T."""
    T, R = E.shape
    tables = build_tables(model, jnp.asarray(theta))
    rho = np.asarray(tables.rho)
    logP = np.asarray(tables.log_P)
    states = [(d, r) for d in range(1, T + 1) for r in range(R)]
    nS = len(states)
    A = np.full((nS, nS), -np.inf)
    for i, (d, r) in enumerate(states):
        rr = rho[r, d - 1]
        for jj, (d2, r2) in enumerate(states):
            if d2 == 1 and r2 != r and d >= model.u:
                A[i, jj] = np.log(rr) + logP[r, r2]
            elif d2 == d + 1 and r2 == r:
                A[i, jj] = np.log1p(-rr) if rr < 1 else -np.inf
    obs = np.asarray(E)[:, [r for (_, r) in states]]
    init = np.array([-np.log(R) if d == 1 else -np.inf for (d, r) in states])

    log_alpha = np.full((T, nS), -np.inf)
    log_alpha[0] = init + obs[0]
    for t in range(1, T):
        log_alpha[t] = (
            np.asarray(logsumexp(jnp.asarray(log_alpha[t - 1][:, None] + A), axis=0))
            + obs[t]
        )
    log_z = float(logsumexp(jnp.asarray(log_alpha[T - 1])))
    log_beta = np.zeros((T, nS))
    for t in range(T - 2, -1, -1):
        log_beta[t] = np.asarray(
            logsumexp(jnp.asarray(A + (obs[t + 1] + log_beta[t + 1])[None, :]), axis=1)
        )
    post = np.exp(log_alpha + log_beta - log_z)
    marg = np.zeros((T, R))
    for i, (_, r) in enumerate(states):
        marg[:, r] += post[:, i]
    return log_z, marg


def test_engine_exact_when_no_resampling():
    """With N_max >= R(T+1) the discrete filter covers the full support with
    no resampling: logZ and (epsilon -> 0) smoothing marginals are exact."""
    model, theta, E = _make_setup(R=3, T=12)
    log_z_exact, marg_exact = _exact_forward_backward(model, theta, E)
    cfg = EngineConfig(
        n_particles_max=3 * 14,  # R*(T+2): growth never hits the cap
        epsilon=1e-12,  # finalise only at the last step -> full smoothing
        smoothing_window=16,
        estimate_regimes=True,
        estimate_parameters=False,
    )
    res = run_online_combined_inference(
        jax.random.PRNGKey(0), model, theta, E, cfg, weight_dtype=jnp.float64
    )
    np.testing.assert_allclose(
        float(res.log_normalizing_constant), log_z_exact, rtol=1e-9
    )
    assert int(res.spill_count) == 0
    assert bool(np.all(np.asarray(res.regime_valid)))
    np.testing.assert_allclose(
        np.asarray(res.regime_probs), marg_exact, atol=1e-8
    )


def test_engine_adaptive_lag_close_to_exact():
    """Default epsilon: estimates finalise early but must stay close."""
    model, theta, E = _make_setup(R=3, T=30, seed=3)
    log_z_exact, marg_exact = _exact_forward_backward(model, theta, E)
    cfg = EngineConfig(
        n_particles_max=30,  # forces resampling after ~9 steps
        epsilon=0.01,
        smoothing_window=32,
    )
    res = run_online_combined_inference(
        jax.random.PRNGKey(1), model, theta, E, cfg, weight_dtype=jnp.float64
    )
    assert bool(np.all(np.asarray(res.regime_valid)))
    # Rows must sum to one (the all-R finalisation rule guarantees this).
    np.testing.assert_allclose(
        np.asarray(res.regime_probs).sum(axis=1), 1.0, atol=1e-6
    )
    np.testing.assert_allclose(
        float(res.log_normalizing_constant), log_z_exact, atol=1.0
    )
    err = np.abs(np.asarray(res.regime_probs) - marg_exact).max()
    assert err < 0.25, f"max marginal error {err}"


def test_theta_roundtrip():
    R = 4
    rng = np.random.default_rng(9)
    P = rng.dirichlet(np.ones(R - 1), size=R)
    Pfull = np.zeros((R, R))
    for r in range(R):
        Pfull[r, [c for c in range(R) if c != r]] = P[r]
    omega = rng.uniform(0.5, 0.99, R)
    theta = parameters_to_theta(Pfull, omega)
    back = theta_to_parameters(theta, R)
    np.testing.assert_allclose(back["p"], Pfull, rtol=1e-10)
    np.testing.assert_allclose(back["omega"], omega, rtol=1e-10)


def test_parameter_estimation_moves_toward_truth():
    """Simulate with known theta, start from a perturbed init, run the online
    estimator: omega estimates must improve (validated at modest T)."""
    R, T = 3, 4000
    rng = np.random.default_rng(4)
    mu = np.array([0.1, 0.5, 0.9])
    sigma = np.full(R, 0.08)
    kappa = np.full(R, 2.0)
    model = make_model(mu, sigma, 2, kappa, d_max=512, dtype=jnp.float64)
    P_true = np.array([[0.0, 0.7, 0.3], [0.5, 0.0, 0.5], [0.2, 0.8, 0.0]])
    omega_true = np.array([0.9, 0.8, 0.85])
    theta_true = parameters_to_theta(P_true, omega_true)
    n_tot = np.full((T, 2), 30.0)
    sim = simulate(jax.random.PRNGKey(5), model, theta_true, n_tot)
    E = emission_log_prob_table(
        sim.n_methylated, n_tot, model.alpha, model.beta, dtype=jnp.float64
    )
    theta_init = theta_true + rng.normal(scale=1.5, size=len(theta_true))
    cfg = EngineConfig(
        n_particles_max=60,
        estimate_regimes=False,
        estimate_parameters=True,
        steps_per_update=50,
        learning_rate_factor=0.3,
        learning_rate_exponent=0.1,
    )
    res = run_online_combined_inference(
        jax.random.PRNGKey(6), model, theta_init, E, cfg, weight_dtype=jnp.float64
    )
    trace = np.asarray(res.theta_trace)
    assert np.isfinite(trace).all()
    om_idx = slice(R * (R - 1), R * R)
    err_init = np.abs(theta_init[om_idx] - theta_true[om_idx]).mean()
    err_final = np.abs(trace[-1][om_idx] - theta_true[om_idx]).mean()
    assert err_final < err_init, (err_init, err_final)


def test_score_matches_fisher_identity():
    """With theta frozen and no resampling, the final filtered mean of the
    score statistics phi must equal d log Z / d theta (Fisher identity) —
    the sharpest check of the Poyiadjis phi recursion + analytic gradients."""
    model, theta, E = _make_setup(R=3, T=40, seed=8)
    base_cfg = dict(
        n_particles_max=3 * 42,
        estimate_regimes=False,
        steps_per_update=10**9,  # never actually update theta
        learning_rate_factor=0.0,
    )
    res = run_online_combined_inference(
        jax.random.PRNGKey(0),
        model,
        theta,
        E,
        EngineConfig(estimate_parameters=True, **base_cfg),
        weight_dtype=jnp.float64,
    )
    score = np.asarray(res.final_score)

    def log_z(th):
        r = run_online_combined_inference(
            jax.random.PRNGKey(0),
            model,
            th,
            E,
            EngineConfig(estimate_parameters=False, **base_cfg),
            weight_dtype=jnp.float64,
        )
        return float(r.log_normalizing_constant)

    eps = 1e-5
    for i in range(len(theta)):
        tp, tm = theta.copy(), theta.copy()
        tp[i] += eps
        tm[i] -= eps
        fd = (log_z(tp) - log_z(tm)) / (2 * eps)
        np.testing.assert_allclose(score[i], fd, rtol=2e-4, atol=1e-6, err_msg=f"component {i}")


def test_chunked_engine_matches_and_resumes(tmp_path, monkeypatch):
    """Chunked driver == one-shot scan; killed-run resume from the on-disk
    checkpoint reproduces the same result (intra-run checkpoint/resume,
    SURVEY.md s5)."""
    from hygeia_tpu.single_group.engine import (
        run_online_combined_inference_chunked,
    )

    model, theta, E = _make_setup(R=3, T=30, seed=3)
    cfg = EngineConfig(
        n_particles_max=30,
        epsilon=0.01,
        smoothing_window=32,
        estimate_parameters=True,
        steps_per_update=5,
    )
    key = jax.random.PRNGKey(1)
    full = run_online_combined_inference(key, model, theta, E, cfg, weight_dtype=jnp.float64)
    chunked = run_online_combined_inference_chunked(
        key, model, theta, E, cfg, chunk_size=7, weight_dtype=jnp.float64
    )
    np.testing.assert_allclose(
        np.asarray(chunked.regime_probs), np.asarray(full.regime_probs), atol=1e-12
    )
    np.testing.assert_allclose(
        float(chunked.log_normalizing_constant),
        float(full.log_normalizing_constant),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(chunked.theta_trace), np.asarray(full.theta_trace), atol=1e-12
    )

    # Simulate a crash: block checkpoint deletion so the last intermediate
    # checkpoint survives the first run, then resume from it.
    ck = tmp_path / "engine_ck.npz"
    import os as _os

    real_remove = _os.remove
    monkeypatch.setattr(_os, "remove", lambda p: None)
    run_online_combined_inference_chunked(
        key, model, theta, E, cfg, chunk_size=7,
        checkpoint_path=str(ck), weight_dtype=jnp.float64,
    )
    monkeypatch.setattr(_os, "remove", real_remove)
    assert ck.exists(), "intermediate checkpoint should survive the fake crash"
    resumed = run_online_combined_inference_chunked(
        key, model, theta, E, cfg, chunk_size=7,
        checkpoint_path=str(ck), resume=True, weight_dtype=jnp.float64,
    )
    assert not ck.exists(), "checkpoint removed after successful completion"
    np.testing.assert_allclose(
        np.asarray(resumed.regime_probs), np.asarray(full.regime_probs), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(resumed.final_theta), np.asarray(full.final_theta), atol=1e-12
    )
    np.testing.assert_allclose(
        float(resumed.log_normalizing_constant),
        float(full.log_normalizing_constant),
        rtol=1e-12,
    )


def test_t_limit_masking_matches_unbatched_run():
    """Ragged batching support: a padded run with t_limit=T_u must be
    BIT-IDENTICAL on the live prefix to an unbatched run of length T_u
    (same key stream — the carry, including the RNG key, freezes past the
    limit), with zero logZ contribution from the padding."""
    import jax
    import jax.numpy as jnp

    from hygeia_tpu.ops.emissions import emission_log_prob_table
    from hygeia_tpu.single_group.engine import (
        EngineConfig,
        run_online_combined_inference,
    )
    from hygeia_tpu.single_group.model import make_model, parameters_to_theta

    R, T_u, T_pad = 4, 70, 110
    rng = np.random.default_rng(8)
    mu = np.linspace(0.1, 0.9, R)
    sigma = np.full(R, 0.1)
    model = make_model(mu, sigma, 2, np.full(R, 2.0), d_max=256)
    P0 = np.full((R, R), 1.0 / (R - 1))
    np.fill_diagonal(P0, 0.0)
    theta0 = jnp.asarray(parameters_to_theta(P0, np.full(R, 0.9)), jnp.float64)
    n = rng.poisson(25, size=(T_pad, 2)).astype(np.float64)
    y = np.minimum(rng.poisson(9, size=(T_pad, 2)), n)
    E = emission_log_prob_table(y, n, model.alpha, model.beta, dtype=jnp.float64)
    cfg = EngineConfig(
        n_particles_max=40, estimate_parameters=True, estimate_regimes=True,
        steps_per_update=20,
    )
    key = jax.random.PRNGKey(5)
    ref = run_online_combined_inference(
        key, model, theta0, E[:T_u], cfg, weight_dtype=jnp.float64
    )
    got = run_online_combined_inference(
        key, model, theta0, E, cfg, weight_dtype=jnp.float64, t_limit=T_u
    )
    np.testing.assert_array_equal(
        np.asarray(got.regime_probs)[:T_u], np.asarray(ref.regime_probs)
    )
    assert bool(np.all(np.asarray(got.regime_valid)[:T_u]))
    np.testing.assert_array_equal(
        np.asarray(got.theta_trace)[: T_u - 1],
        np.asarray(ref.theta_trace)[: T_u - 1],
    )
    # Padding contributes EXACT zeros, but summing them changes the f64
    # reduction tree by one ulp.
    np.testing.assert_allclose(
        np.asarray(got.log_normalizing_constant),
        np.asarray(ref.log_normalizing_constant),
        rtol=1e-12,
    )
    # Padding steps froze theta: the trace is constant past the limit.
    tr = np.asarray(got.theta_trace)
    assert np.all(tr[T_u - 1 :] == tr[T_u - 1])
