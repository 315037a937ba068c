"""End-to-end correctness of the two-group filter + backward simulation,
checked against EXACT forward-backward inference on the fully-enumerated
state space (durations cannot exceed t+1, so enumeration is finite)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from hygeia_tpu.ops.emissions import emission_log_prob_table
from hygeia_tpu.two_group.model import (
    State,
    transition_log_prob,
    phantom_state,
)
from hygeia_tpu.two_group.filter import run_filter
from hygeia_tpu.two_group.backward import backward_simulation, smoothing_functionals
from hygeia_tpu.two_group.simulate import simulate
from tests.test_two_group_model import default_params


def _enumerate_state_space(R, T):
    """All reachable (m, d_c, r_c, d_k, r_k) with durations in 1..T."""
    states = []
    for dc in range(1, T + 1):
        for rc in range(R):
            for dk in range(1, T + 1):
                for rk in range(R):
                    states.append((0, dc, rc, dk, rk))
            # merged: case == control exactly
            states.append((1, dc, rc, dc, rc))
    return np.array(states, np.int32)


def _exact_forward_backward(params, E_c, E_k, phantom_r, T):
    """Exact log-normalising constant and smoothing marginals."""
    R = params.n_regimes
    S = _enumerate_state_space(R, T)
    nS = len(S)
    sj = State(*(jnp.asarray(S[:, i]) for i in range(5)))

    # Stationary transition matrix A[i, j] = log f(S_j | S_i).
    prev = State(*(jnp.asarray(S[:, i])[:, None] for i in range(5)))
    nxt = State(*(jnp.asarray(S[:, i])[None, :] for i in range(5)))
    A = np.asarray(transition_log_prob(params, prev, nxt))  # (nS, nS)

    obs = np.asarray(E_c)[:, S[:, 2]] + np.asarray(E_k)[:, S[:, 4]]  # (T, nS)

    ph = phantom_state(phantom_r, (nS,))
    init_lp = np.asarray(transition_log_prob(params, ph, sj, step0=True))

    # Forward pass.
    log_alpha = np.full((T, nS), -np.inf)
    log_alpha[0] = init_lp + obs[0]
    for t in range(1, T):
        log_alpha[t] = (
            np.asarray(logsumexp(jnp.asarray(log_alpha[t - 1][:, None] + A), axis=0))
            + obs[t]
        )
    log_z = float(logsumexp(jnp.asarray(log_alpha[T - 1])))

    # Backward pass.
    log_beta = np.zeros((T, nS))
    for t in range(T - 2, -1, -1):
        log_beta[t] = np.asarray(
            logsumexp(jnp.asarray(A + (obs[t + 1] + log_beta[t + 1])[None, :]), axis=1)
        )
    log_post = log_alpha + log_beta - log_z
    post = np.exp(log_post)
    # Marginals: split prob + per-regime control/case.
    split = post[:, S[:, 0] == 0].sum(axis=1)
    ctrl = np.stack([post[:, S[:, 2] == r].sum(axis=1) for r in range(R)], -1)
    case = np.stack([post[:, S[:, 4] == r].sum(axis=1) for r in range(R)], -1)
    return log_z, split, ctrl, case


def test_filter_and_backward_match_exact_inference():
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

    M = 60  # enough particles that resampling error is tiny at T=10
    res = run_filter(
        jax.random.PRNGKey(0),
        params,
        E_c,
        E_k,
        M,
        weight_dtype=jnp.float64,
        phantom_regime=phantom_r,
    )
    log_z_pf = float(res.log_normalizing_constant)
    np.testing.assert_allclose(log_z_pf, log_z_exact, rtol=0, atol=0.05)

    traj = backward_simulation(
        jax.random.PRNGKey(1), params, res.log_weights, res.particles, 4000
    )
    split_pf, regime_pf = smoothing_functionals(np.asarray(traj), R)
    split_pf = np.asarray(split_pf)
    regime_pf = np.asarray(regime_pf)
    np.testing.assert_allclose(split_pf, split_exact, atol=0.05)
    np.testing.assert_allclose(regime_pf[:, :R], ctrl_exact, atol=0.05)
    np.testing.assert_allclose(regime_pf[:, R:], case_exact, atol=0.05)


def test_filter_weights_shapes_and_padding():
    T, R, M = 6, 3, 10
    params = default_params(R=R, min_duration=2, d_max=16)
    rng = np.random.default_rng(2)
    n = rng.poisson(20, size=(T, 2)).astype(np.float64)
    y = np.minimum(rng.poisson(8, size=(T, 2)), n)
    E = emission_log_prob_table(y, n, params.alpha, params.beta, dtype=jnp.float64)
    res = run_filter(
        jax.random.PRNGKey(3), params, E, E, M, weight_dtype=jnp.float64
    )
    I = 2 * R + R * R
    assert res.log_weights.shape == (T, M * I)
    for f in res.particles:
        assert f.shape == (T, M * I)
    lw0 = np.asarray(res.log_weights[0])
    # First step: R*R proposals, rest -inf padding; support = R-1 particles.
    assert np.all(np.isneginf(lw0[R * R:]))
    assert np.isfinite(lw0[: R * R]).sum() == R - 1
    # Padded particles are -1 (expand_collapsed_results semantics).
    for f in res.particles:
        assert np.all(np.asarray(f[0][R * R:]) == -1)
    assert np.isfinite(float(res.log_normalizing_constant))


def test_simulation_recovery():
    """Simulate from the model and check the filter recovers the control
    regimes (the de-facto integration test of the reference, SURVEY.md s4)."""
    T, R = 60, 3
    params = default_params(R=R, min_duration=2, d_max=128)
    key = jax.random.PRNGKey(7)
    n_c = 60.0 * np.ones((T, 2))
    n_k = 60.0 * np.ones((T, 2))
    sim = simulate(key, params, n_c, n_k)
    E_c = emission_log_prob_table(
        sim.obs_control, n_c, params.alpha, params.beta, dtype=jnp.float64
    )
    E_k = emission_log_prob_table(
        sim.obs_case, n_k, params.alpha, params.beta, dtype=jnp.float64
    )
    res = run_filter(
        jax.random.PRNGKey(8), params, E_c, E_k, 50, weight_dtype=jnp.float64
    )
    traj = backward_simulation(
        jax.random.PRNGKey(9), params, res.log_weights, res.particles, 400
    )
    traj = np.asarray(traj)
    true_states = np.asarray(sim.states)
    # Posterior-mode control regime should recover the truth at most sites
    # (high-coverage data, well-separated regimes).
    post_mode = np.zeros(T, np.int32)
    for t in range(T):
        post_mode[t] = np.bincount(traj[t, :, 2], minlength=R).argmax()
    accuracy = np.mean(post_mode == true_states[:, 2])
    assert accuracy > 0.8, f"control regime recovery accuracy {accuracy}"


def test_filter_unroll_invariance():
    """Results are bit-identical for any unroll factor (per-site fold_in
    keys; padded trailing sites are masked out of the carry)."""
    T, R, M = 11, 3, 8  # T-1 = 10: not a multiple of 4 or 8 -> tests padding
    params = default_params(R=R, min_duration=2, d_max=32)
    rng = np.random.default_rng(4)
    n = rng.poisson(20, size=(T, 2)).astype(np.float64)
    y = np.minimum(rng.poisson(8, size=(T, 2)), n)
    E = emission_log_prob_table(y, n, params.alpha, params.beta, dtype=jnp.float64)
    results = [
        run_filter(
            jax.random.PRNGKey(5), params, E, E, M,
            weight_dtype=jnp.float64, unroll=k,
        )
        for k in (1, 4, 8, 16)
    ]
    base = results[0]
    for res in results[1:]:
        np.testing.assert_array_equal(
            np.asarray(res.log_weights), np.asarray(base.log_weights)
        )
        for f, fb in zip(res.particles, base.particles):
            np.testing.assert_array_equal(np.asarray(f), np.asarray(fb))
        # logZ sums the per-site shifts with a (n_chunks, K)-shaped reduction
        # tree, so only the summation ORDER differs across unroll factors.
        np.testing.assert_allclose(
            float(res.log_normalizing_constant),
            float(base.log_normalizing_constant),
            rtol=1e-12,
        )
        assert int(res.degenerate_steps) == int(base.degenerate_steps)


def test_backward_logits_matches_transition():
    """The backward-specialised logits kernel (backward._backward_logits)
    must equal lw + transition_log_prob(cur[None,:], nxt[:,None]) with the
    -inf/-finite masking, on random valid AND padding (-1) states."""
    from hygeia_tpu.two_group.backward import _backward_logits

    params = default_params(d_max=64)
    R = params.n_regimes
    rng = np.random.default_rng(0)
    N, B = 150, 17

    def rand_states(n, pad_frac=0.2):
        m = rng.integers(0, 2, n)
        d_c = rng.integers(1, 40, n)
        r_c = rng.integers(0, R, n)
        d_k = np.where(m == 1, d_c, rng.integers(1, 40, n))
        r_k = np.where(m == 1, r_c, rng.integers(0, R, n))
        dead = rng.random(n) < pad_frac
        f = lambda x: jnp.asarray(np.where(dead, -1, x), jnp.int32)
        return State(f(m), f(d_c), f(r_c), f(d_k), f(r_k)), dead

    cur, cur_dead = rand_states(N)
    nxt, _ = rand_states(B, pad_frac=0.0)
    lw = jnp.asarray(
        np.where(cur_dead, -np.inf, rng.normal(size=N)), jnp.float32
    )

    cur_b = State(*(f[None, :] for f in cur))
    nxt_b = State(*(f[:, None] for f in nxt))
    trans = transition_log_prob(params, cur_b, nxt_b)
    want = np.asarray(
        jnp.where(
            jnp.isfinite(trans) & (lw[None, :] > -jnp.inf),
            lw[None, :] + trans,
            -jnp.inf,
        )
    )
    got = np.asarray(_backward_logits(params, cur, nxt, lw))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_paired_logits_matches_transition():
    """The paired-layout specialised density (model.paired_transition_log_
    prob) must equal transition_log_prob(anc[None,:], children) exactly on
    random ancestors and their deterministic expansions (incl. padding)."""
    from hygeia_tpu.two_group.model import paired_transition_log_prob
    from hygeia_tpu.two_group.proposal import expand_states

    params = default_params(d_max=64)
    R = params.n_regimes
    rng = np.random.default_rng(1)
    M = 23

    m = rng.integers(0, 2, M)
    d_c = rng.integers(1, 40, M)
    r_c = rng.integers(0, R, M)
    d_k = np.where(m == 1, d_c, rng.integers(1, 40, M))
    r_k = np.where(m == 1, r_c, rng.integers(0, R, M))
    dead = rng.random(M) < 0.2
    f = lambda x: jnp.asarray(np.where(dead, -1, x), jnp.int32)
    anc = State(f(m), f(d_c), f(r_c), f(d_k), f(r_k))
    children = expand_states(anc, R)  # (I, M)

    prev_b = State(*(fld[None, :] for fld in anc))
    want = np.asarray(transition_log_prob(params, prev_b, children))
    got = np.asarray(paired_transition_log_prob(params, anc, children))
    live = ~np.broadcast_to(dead[None, :], want.shape)
    np.testing.assert_allclose(
        np.where(live, got, 0.0), np.where(live, want, 0.0), rtol=1e-6, atol=1e-6
    )


def test_structured_rho_matches_gather_on_history():
    """history_layout=True (backward._structured_rho) replaces the (N,)
    hazard gathers with the (I, M)-structural lookup — must be EXACTLY equal
    to the generic path on every row of a real filter history (masked
    logits identical, dead slots included), and on the padded initial row."""
    from hygeia_tpu.two_group.backward import _backward_logits

    R = 4
    params = default_params(R=R, min_duration=2, d_max=128)
    rng = np.random.default_rng(3)
    T, M, B = 40, 5, 7
    n = rng.poisson(25, size=(T, 2)).astype(np.float64)
    y = np.minimum(rng.poisson(10, size=(T, 2)), n).astype(np.float64)
    E_c = emission_log_prob_table(y, n, params.alpha, params.beta)
    E_k = emission_log_prob_table(np.minimum(y + 2, n), n, params.alpha, params.beta)
    res = run_filter(
        jax.random.PRNGKey(0), params, E_c, E_k, M, weight_dtype=jnp.float64
    )

    def rand_next(nb):
        m = rng.integers(0, 2, nb)
        d_c = rng.integers(1, 60, nb)
        r_c = rng.integers(0, R, nb)
        d_k = np.where(m == 1, d_c, rng.integers(1, 60, nb))
        r_k = np.where(m == 1, r_c, rng.integers(0, R, nb))
        f = lambda x: jnp.asarray(x, jnp.int32)
        return State(f(m), f(d_c), f(r_c), f(d_k), f(r_k))

    nxt = rand_next(B)
    for t in range(T):
        cur = State(*(jnp.asarray(f[t]) for f in res.particles))
        lw = res.log_weights[t].astype(jnp.float32)
        want = np.asarray(_backward_logits(params, cur, nxt, lw))
        got = np.asarray(
            _backward_logits(params, cur, nxt, lw, history_layout=True)
        )
        np.testing.assert_array_equal(got, want, err_msg=f"row {t}")
