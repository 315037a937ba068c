"""Generative simulation of the two-group model (for validation + the
`simulate_two_groups` CLI verb).

Mirrors CaseControlRegimeModel.simulate (case_control_regime_model.py:247-321)
as a ``lax.scan`` rollout. The branch structure follows the transition
*density* (case_control_distributions.py:246-291); the reference's sampler
has a corner-case inconsistency (its duration rule at :353 applies the
collision branch without the previous-merged check its log_prob requires) —
we sample from the density the filter actually targets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hygeia_tpu.ops.hazard import gather_rho
from hygeia_tpu.two_group.model import State, TwoGroupParams, phantom_state

_NEG_INF = -jnp.inf


class SimulationResult(NamedTuple):
    states: jnp.ndarray  # (T, 5) int32
    obs_control: jnp.ndarray  # (T, S_c) methylated read counts
    obs_case: jnp.ndarray  # (T, S_k)


def _sample_transition(key, params: TwoGroupParams, prev: State, *, step0):
    R = params.n_regimes
    k_m, k_c, k_cr, k_k, k_kr, k_kr2 = jax.random.split(key, 6)

    # Merged indicator.
    gate = jnp.minimum(prev.d_k, prev.d_c) >= params.min_duration
    if step0:
        m = jnp.ones((), jnp.int32)
    else:
        row = params.log_p_merged[prev.m]
        m_chain = jax.random.categorical(k_m, row).astype(jnp.int32)
        m = jnp.where(gate, m_chain, prev.m)

    # Control state.
    rho_c = jnp.where(
        step0, 1.0, gather_rho(params.rho_control, prev.d_c, prev.r_c)
    )
    jump_c = jax.random.uniform(k_c) < rho_c
    new_regime_c = jax.random.categorical(
        k_cr, params.log_p_control[prev.r_c]
    ).astype(jnp.int32)
    d_c = jnp.where(jump_c, 1, prev.d_c + 1).astype(jnp.int32)
    r_c = jnp.where(jump_c, new_regime_c, prev.r_c).astype(jnp.int32)

    # Case state (branches a-d of the density).
    rho_k = jnp.where(step0, 1.0, gather_rho(params.rho_case, prev.d_k, prev.r_k))
    regimes = jnp.arange(R)
    logits_not_c = jnp.where(regimes != r_c, 0.0, _NEG_INF)
    logits_not_c_not_prev = jnp.where(
        (regimes != r_c) & (regimes != prev.r_k), 0.0, _NEG_INF
    )
    samp_not_c = jax.random.categorical(k_kr, logits_not_c).astype(jnp.int32)
    samp_not_both = jax.random.categorical(k_kr2, logits_not_c_not_prev).astype(
        jnp.int32
    )
    jump_k = jax.random.uniform(k_k) < rho_k

    in_a = m == 1
    in_b = (prev.m == 1) & (d_c != 1)
    in_c = (r_c == prev.r_k) & (prev.m == 0)
    d_k = jnp.where(
        in_a,
        d_c,
        jnp.where(
            in_b | in_c, 1, jnp.where(jump_k, 1, prev.d_k + 1)
        ),
    ).astype(jnp.int32)
    r_k = jnp.where(
        in_a,
        r_c,
        jnp.where(
            in_b,
            samp_not_c,
            jnp.where(
                in_c, samp_not_both, jnp.where(jump_k, samp_not_both, prev.r_k)
            ),
        ),
    ).astype(jnp.int32)

    return State(m=m, d_c=d_c, r_c=r_c, d_k=d_k, r_k=r_k)


def _sample_beta_binomial(key, n, alpha, beta):
    k1, k2 = jax.random.split(key)
    p = jax.random.beta(k1, alpha, beta, shape=n.shape)
    return jax.random.binomial(k2, n, p).astype(jnp.int32)


def simulate(
    key,
    params: TwoGroupParams,
    n_total_control,  # (T, S_c)
    n_total_case,  # (T, S_k)
) -> SimulationResult:
    """Roll the joint chain forward and emit BetaBinomial read counts."""
    T = n_total_control.shape[0]
    key, k_phantom, k0 = jax.random.split(key, 3)
    phantom_r = jax.random.randint(k_phantom, (), 0, params.n_regimes)
    prev = State(*(f.reshape(()) for f in phantom_state(phantom_r, (1,))))
    first = _sample_transition(k0, params, prev, step0=True)

    def step(carry, k):
        prev = carry
        nxt = _sample_transition(k, params, State.unstack(prev), step0=False)
        return nxt.stack(), nxt.stack()

    keys = jax.random.split(key, T - 1)
    _, rest = jax.lax.scan(step, first.stack(), keys)
    states = jnp.concatenate([first.stack()[None], rest], axis=0)  # (T, 5)

    key_obs = jax.random.fold_in(key, 1)
    kc, kk = jax.random.split(key_obs)
    obs_c = _sample_beta_binomial(
        kc,
        jnp.asarray(n_total_control, jnp.float32),
        params.alpha[states[:, 2]][:, None],
        params.beta[states[:, 2]][:, None],
    )
    obs_k = _sample_beta_binomial(
        kk,
        jnp.asarray(n_total_case, jnp.float32),
        params.alpha[states[:, 4]][:, None],
        params.beta[states[:, 4]][:, None],
    )
    return SimulationResult(states=states, obs_control=obs_c, obs_case=obs_k)
