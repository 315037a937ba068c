"""Deterministic proposal expansion for the two-group filter.

The reference builds, per resampled ancestor, I = 2R + R**2 candidate next
states: 1 no-change, R-1 control change-points, R-1 case change-points,
1 merge, and R**2 state-independent double-change-points
(case_control_proposal_mappings.py). It does so with a per-particle
tf.while_loop over ancestors (proposal_fn_standard_filter :186-195) — the
single hottest inefficiency in the reference (SURVEY.md section 7 step 3).

Here the whole expansion is one vectorised computation over a static child
index: given ancestors of shape (M,), produce a State of shape (I, M).
Child slot layout (must match the reference's ordering so flattened particle
indices n = i*M + m line up with its weight algebra):

    0            no change point
    1 .. R-1     control CP to regime j, j enumerating {0..R-1} \\ {r_k}
    R .. 2R-2    case CP to regime j, j enumerating {0..R-1} \\ {r_c}
    2R-1         merge
    2R+ i*R + j  state-independent: control regime i, case regime j,
                 merged = (i == j), both durations 1
"""

from __future__ import annotations

import jax.numpy as jnp

from hygeia_tpu.two_group.model import State


def num_children(n_regimes: int) -> int:
    return 2 * n_regimes + n_regimes * n_regimes


def expand_states(parents: State, n_regimes: int) -> State:
    """All I candidate next states for each of M parents: (M,) -> (I, M).

    Mirrors CaseControlProposal._xi (case_control_proposal_mappings.py:11-103)
    and proposal_fn_non_resampled (:106-134), vectorised over both axes.
    """
    R = n_regimes
    I = num_children(R)
    M = parents.m.shape[0]
    s = jnp.arange(I, dtype=jnp.int32)[:, None]  # (I, 1) child slot

    m_p = parents.m[None, :]
    d_c, r_c = parents.d_c[None, :], parents.r_c[None, :]
    d_k, r_k = parents.d_k[None, :], parents.r_k[None, :]

    # Region masks over the child slot.
    is_cont = s == 0
    is_ctrl_cp = (s >= 1) & (s <= R - 1)
    is_case_cp = (s >= R) & (s <= 2 * R - 2)
    is_merge = s == 2 * R - 1
    is_indep = s >= 2 * R

    # Control-CP target regime: slot s in 1..R-1 maps to (s-1 if s-1 < r_k
    # else s), enumerating {0..R-1} \ {r_k} (proposal_mappings :36-58).
    ctrl_cp_regime = jnp.where(s - 1 < r_k, s - 1, s)
    # Case-CP target regime: slot s in R..2R-2, j = s - R, maps to (j if
    # j < r_c else j+1), enumerating {0..R-1} \ {r_c} (:62-86).
    j_case = s - R
    case_cp_regime = jnp.where(j_case < r_c, j_case, j_case + 1)
    # Merge durations: d_c + 1 if currently split, else 0 (:90-100).
    merge_dur = jnp.where(m_p == 0, d_c + 1, 0)
    # State-independent block: k = s - 2R; control regime k//R, case k%R.
    k = jnp.maximum(s - 2 * R, 0)
    indep_rc = k // R
    indep_rk = k % R

    zero = jnp.zeros((I, M), jnp.int32)
    pick = lambda *pairs: _select(pairs, zero)

    m = pick(
        (is_cont, m_p),
        (is_ctrl_cp, 0),
        (is_case_cp, 0),
        (is_merge, 1),
        (is_indep, (indep_rc == indep_rk).astype(jnp.int32)),
    )
    new_d_c = pick(
        (is_cont, d_c + 1),
        (is_ctrl_cp, 1),
        (is_case_cp, d_c + 1),
        (is_merge, merge_dur),
        (is_indep, 1),
    )
    new_r_c = pick(
        (is_cont, r_c),
        (is_ctrl_cp, ctrl_cp_regime),
        (is_case_cp, r_c),
        (is_merge, r_c),
        (is_indep, indep_rc),
    )
    new_d_k = pick(
        (is_cont, d_k + 1),
        (is_ctrl_cp, d_k + 1),
        (is_case_cp, 1),
        (is_merge, merge_dur),
        (is_indep, 1),
    )
    new_r_k = pick(
        (is_cont, r_k),
        (is_ctrl_cp, r_k),
        (is_case_cp, case_cp_regime),
        (is_merge, r_c),
        (is_indep, indep_rk),
    )
    return State(m=m, d_c=new_d_c, r_c=new_r_c, d_k=new_d_k, r_k=new_r_k)


def initial_states(n_regimes: int) -> State:
    """The R**2 initial proposals (initial_proposal_fn_standard_filter,
    case_control_proposal_mappings.py:210-216): the state-independent block
    with M = 1 — control regime i, case regime j, merged = (i == j)."""
    R = n_regimes
    i = jnp.repeat(jnp.arange(R, dtype=jnp.int32), R)
    j = jnp.tile(jnp.arange(R, dtype=jnp.int32), R)
    ones = jnp.ones_like(i)
    return State(m=(i == j).astype(jnp.int32), d_c=ones, r_c=i, d_k=ones, r_k=j)


def _select(pairs, default):
    out = default
    for cond, val in reversed(pairs):
        out = jnp.where(cond, val, out)
    return out
