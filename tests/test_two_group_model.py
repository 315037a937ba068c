"""Two-group model tests: density normalisation, proposal expansion vs a
direct port of the reference's _xi mapping, and spot checks of the branch
semantics."""

import itertools

import numpy as np
import jax.numpy as jnp

from hygeia_tpu.two_group.model import (
    State,
    make_params,
    transition_log_prob,
    phantom_state,
)
from hygeia_tpu.two_group.proposal import expand_states, initial_states, num_children


def default_params(R=4, min_duration=3, d_max=64):
    rng = np.random.default_rng(5)
    mu = np.linspace(0.1, 0.9, R)
    sigma = np.full(R, 0.08)
    theta_p = rng.normal(size=(R, R))
    logp = np.where(np.eye(R, dtype=bool), -np.inf, theta_p)
    # Normalise rows like the theta-file reader does.
    with np.errstate(invalid="ignore"):
        logp = logp - np.log(np.nansum(np.exp(np.where(np.isfinite(logp), logp, -np.inf)), axis=1, keepdims=True))
    return make_params(
        mu=mu,
        sigma=sigma,
        p_softmax_control=logp,
        omega_logit_control=rng.normal(size=R),
        omega_case=0.8,
        kappa_control=np.full(R, 2.0),
        kappa_case=np.full(R, 2.0),
        merge_log_prob=np.log(0.1),
        split_prob=0.01,
        minimum_duration=min_duration,
        d_max=d_max,
        dtype=jnp.float64,
    )


def enumerate_next_states(prev, R, T_cap=80):
    """All states with nonzero reachable probability from prev: control is
    (1, r) or (d_c'+1, r_c'); case duration in {1, d_k'+1} or copies control."""
    out = set()
    ctrl_opts = [(1, r) for r in range(R)] + [(prev[1] + 1, prev[2])]
    for m in (0, 1):
        for (dc, rc) in ctrl_opts:
            case_opts = [(1, r) for r in range(R)] + [(prev[3] + 1, prev[4])]
            if m == 1:
                case_opts = case_opts + [(dc, rc)]
            for (dk, rk) in case_opts:
                out.add((m, dc, rc, dk, rk))
    return sorted(out)


def total_probability(params, prev_tuple):
    R = params.n_regimes
    cands = enumerate_next_states(prev_tuple, R)
    arr = np.array(cands, dtype=np.int32)
    prev = State(*(jnp.full((len(cands),), v, jnp.int32) for v in prev_tuple))
    nxt = State(*(jnp.asarray(arr[:, i]) for i in range(5)))
    lp = np.asarray(transition_log_prob(params, prev, nxt))
    lp = lp[np.isfinite(lp)]
    return np.exp(lp).sum()


def test_transition_density_normalises():
    params = default_params()
    # (m', d_c', r_c', d_k', r_k') in a spread of configurations, including
    # below/above the minimum-duration gate and merged/split states.
    cases = [
        (0, 5, 1, 7, 2),  # split, gate open
        (0, 2, 0, 1, 3),  # split, gate closed (durations < min_duration)
        (1, 6, 2, 6, 2),  # merged (case == control), gate open
        (1, 1, 3, 1, 3),  # merged, gate closed
        (0, 4, 2, 9, 2),  # split but same regimes (collision-prone)
        (0, 30, 0, 31, 1),  # long sojourns
    ]
    for prev in cases:
        total = total_probability(params, prev)
        np.testing.assert_allclose(total, 1.0, rtol=1e-9, err_msg=f"prev={prev}")


def test_initial_distribution_support():
    """At step 0, only merged proposals with control regime != phantom regime
    have finite probability, each with mass P_control[phantom, r]."""
    params = default_params()
    R = params.n_regimes
    props = initial_states(R)
    for phantom_r in range(R):
        prev = phantom_state(phantom_r, (R * R,))
        lp = np.asarray(transition_log_prob(params, prev, props, step0=True))
        props_np = np.stack([np.asarray(f) for f in props], axis=-1)
        for i, (m, dc, rc, dk, rk) in enumerate(props_np):
            if m == 1 and rc == rk and rc != phantom_r:
                expected = float(params.log_p_control[phantom_r, rc])
                np.testing.assert_allclose(lp[i], expected, rtol=1e-9)
            else:
                assert np.isneginf(lp[i]), (phantom_r, i, props_np[i], lp[i])
        finite = np.isfinite(lp)
        np.testing.assert_allclose(np.exp(lp[finite]).sum(), 1.0, rtol=1e-9)


def _xi_reference(state, R):
    """Direct NumPy port of CaseControlProposal._xi
    (case_control_proposal_mappings.py:11-103)."""
    m, dc, rc, dk, rk = state
    out = [None] * (2 * R)
    out[0] = (m, dc + 1, rc, dk + 1, rk)
    idx = 1
    while idx <= rk:
        out[idx] = (0, 1, idx - 1, dk + 1, rk)
        idx += 1
    while idx < R:
        out[idx] = (0, 1, idx, dk + 1, rk)
        idx += 1
    while idx < R + rc:
        out[idx] = (0, dc + 1, rc, 1, idx - R)
        idx += 1
    while idx < 2 * R - 1:
        out[idx] = (0, dc + 1, rc, 1, idx - R + 1)
        idx += 1
    md = dc + 1 if m == 0 else 0
    out[2 * R - 1] = (1, md, rc, md, rc)
    return out


def _non_resampled_reference(R):
    """Port of proposal_fn_non_resampled (:106-134)."""
    out = []
    for i in range(R):
        for j in range(R):
            out.append((1 if i == j else 0, 1, i, 1, j))
    return out


def test_expand_states_matches_reference_xi():
    R = 4
    rng = np.random.default_rng(3)
    parents = []
    for _ in range(7):
        m = int(rng.integers(0, 2))
        rc = int(rng.integers(0, R))
        rk = rc if m == 1 else int(rng.integers(0, R))
        dc = int(rng.integers(1, 20))
        dk = dc if m == 1 else int(rng.integers(1, 20))
        parents.append((m, dc, rc, dk, rk))
    arr = np.array(parents, np.int32)
    st = State(*(jnp.asarray(arr[:, i]) for i in range(5)))
    children = expand_states(st, R)
    got = np.stack([np.asarray(f) for f in children], axis=-1)  # (I, M, 5)
    I = num_children(R)
    assert got.shape == (I, len(parents), 5)
    indep = _non_resampled_reference(R)
    for mi, p in enumerate(parents):
        expected = _xi_reference(p, R) + indep
        for ii in range(I):
            assert tuple(got[ii, mi]) == expected[ii], (
                f"parent {p} child {ii}: got {tuple(got[ii, mi])} want {expected[ii]}"
            )


def test_initial_states_matches_reference():
    R = 5
    props = initial_states(R)
    got = np.stack([np.asarray(f) for f in props], axis=-1)
    expected = np.array(_non_resampled_reference(R), np.int32)
    np.testing.assert_array_equal(got, expected)


def test_expand_score_and_observe_matches_composition():
    """The fused slot-structured kernel (model.expand_score_and_observe) is
    BIT-IDENTICAL to expand_states + paired_transition_log_prob + the one-hot
    emission selects — including duration-0 ancestors (merge children of
    merged parents), r_c == r_k collisions, and below-gate states."""
    import numpy as np
    from hygeia_tpu.two_group.model import (
        State,
        expand_score_and_observe,
        paired_transition_log_prob,
    )
    from hygeia_tpu.two_group.proposal import expand_states
    from tests.test_two_group_filter import default_params

    for R, md, trial in [(3, 2, 0), (6, 3, 1), (6, 1, 2), (4, 2, 3)]:
        params = default_params(R=R, min_duration=md, d_max=64)
        rng = np.random.default_rng(trial)
        M = 37
        m = rng.integers(0, 2, M)
        r_c = rng.integers(0, R, M)
        # merged ancestors share regime/duration like real filter states
        r_k = np.where(m == 1, r_c, rng.integers(0, R, M))
        d_c = rng.integers(0, 8, M)  # incl. duration 0 (merge-of-merged)
        d_k = np.where(m == 1, d_c, rng.integers(0, 8, M))
        # also a few free-form (non-invariant) states to stress every branch
        free = rng.random(M) < 0.3
        r_k = np.where(free, rng.integers(0, R, M), r_k)
        d_k = np.where(free, rng.integers(0, 8, M), d_k)
        anc = State(
            m=jnp.asarray(m, jnp.int32),
            d_c=jnp.asarray(d_c, jnp.int32),
            r_c=jnp.asarray(r_c, jnp.int32),
            d_k=jnp.asarray(d_k, jnp.int32),
            r_k=jnp.asarray(r_k, jnp.int32),
        )
        row_c = jnp.asarray(rng.normal(size=R))
        row_k = jnp.asarray(rng.normal(size=R))

        children, trans_lp, obs_lp = expand_score_and_observe(
            params, anc, row_c, row_k
        )
        ref_children = expand_states(anc, R)
        ref_trans = paired_transition_log_prob(params, anc, ref_children)
        regs = jnp.arange(R)
        ref_obs = jnp.sum(
            jnp.where(ref_children.r_c[..., None] == regs, row_c, 0.0), axis=-1
        ) + jnp.sum(
            jnp.where(ref_children.r_k[..., None] == regs, row_k, 0.0), axis=-1
        )
        for f, g in zip(children, ref_children):
            np.testing.assert_array_equal(np.asarray(f), np.asarray(g))
        np.testing.assert_array_equal(
            np.asarray(trans_lp), np.asarray(ref_trans), err_msg=f"R={R} md={md}"
        )
        np.testing.assert_array_equal(np.asarray(obs_lp), np.asarray(ref_obs))
