"""Marginal-filter variant: two-group filtering with adaptive-lag online
marginal smoothing — constant memory in T.

The production path (filter.py + backward.py) stores the full (T, N) history
for backward simulation. This variant instead propagates per-pending-time
smoothing statistics psi through the backward kernels

    B_t(n, j) propto w_{t-1}^j * f(x_t^n | x_{t-1}^j)

finalising a time's estimates once the filtered variance of all its test
functions drops below epsilon — the reference's marginal-filter pair
(particle_filter_deterministic_proposal.py + smoothing_functions.py:63-202,
compute_log_backward_kernel :27-44), with the bounded ring buffer of the
single-group engine replacing the unbounded pending list.

Test functions (run_inference_two_groups.py:233-240): F = 1 + 2R columns —
split indicator, R control-regime indicators, R case-regime indicators.

The psi recursion is one (S*F, N) x (N, N) matmul per site — unlike the rest
of the pipeline this path is MXU-bound, and it is the memory-safe choice for
very long unsegmented scans.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from hygeia_tpu.two_group.model import State, TwoGroupParams
from hygeia_tpu.two_group.backward import _backward_logits
from hygeia_tpu.two_group.filter import _first_step, _one_step
from hygeia_tpu.two_group.proposal import num_children

_NEG_INF = -jnp.inf


class MarginalResult(NamedTuple):
    functionals: jnp.ndarray  # (T, 1 + 2R): split prob, control regs, case regs
    valid: jnp.ndarray  # (T,) bool
    log_normalizing_constant: jnp.ndarray
    spill_count: jnp.ndarray


def _test_functions(state: State, n_regimes):
    """(F, N) indicator matrix for the smoothing functionals."""
    split = (state.m == 0).astype(jnp.float32)[None, :]
    regs = jnp.arange(n_regimes)[:, None]
    ctrl = (state.r_c[None, :] == regs).astype(jnp.float32)
    case = (state.r_k[None, :] == regs).astype(jnp.float32)
    return jnp.concatenate([split, ctrl, case], axis=0)


def run_marginal_filter(
    key,
    params: TwoGroupParams,
    emission_control,
    emission_case,
    num_resampled_ancestors: int,
    *,
    epsilon=0.01,
    smoothing_window=64,
    weight_dtype=jnp.float32,
):
    R = params.n_regimes
    M = num_resampled_ancestors
    N = M * num_children(R)
    T = emission_control.shape[0]
    F = 1 + 2 * R
    S_cap = smoothing_window
    dtype = weight_dtype

    key, k0 = jax.random.split(key)
    lw0, st0 = _first_step(k0, params, emission_control, emission_case, N, dtype)
    shift0 = logsumexp(lw0)
    lw0 = lw0 - shift0
    w_self0 = jnp.where(jnp.isfinite(lw0), jnp.exp(lw0), 0.0)

    psi0 = jnp.zeros((S_cap, F, N), jnp.float32)
    psi0 = psi0.at[0].set(_test_functions(st0, R))
    psi_time0 = jnp.full((S_cap,), T, jnp.int32).at[0].set(0)
    psi_valid0 = jnp.zeros((S_cap,), bool).at[0].set(True)
    out0 = jnp.zeros((T + 1, F), jnp.float32)
    out_valid0 = jnp.zeros((T + 1,), bool)

    def step(carry, inputs):
        lw, prev_state, psi, psi_time, psi_valid, out, out_valid, spill = carry
        t, k = inputs
        new_lw, new_state = _one_step(
            k, params, emission_control, emission_case, t, lw,
            prev_state, M, True, False,
        )
        shift = logsumexp(new_lw)
        new_lw = new_lw - shift
        w_self = jnp.where(jnp.isfinite(new_lw), jnp.exp(new_lw), 0.0)

        # Backward kernels over the full particle sets (N_new x N_prev) via
        # the backward-specialised kernel (prev/next-only factors off the
        # joint grid — see backward._backward_logits; at N x N this tree is
        # the marginal filter's dominant per-step cost).
        logB = _backward_logits(
            params, prev_state, new_state, lw, history_layout=True
        )
        logBZ = logsumexp(logB, axis=1, keepdims=True)
        B = jnp.where(jnp.isfinite(logBZ), jnp.exp(logB - logBZ), 0.0).astype(
            jnp.float32
        )

        # psi recursion: (S, F, N_prev) x (N_new, N_prev)^T -> (S, F, N_new).
        psi_new = jnp.einsum("sfj,nj->sfn", psi, B)
        psi_new = jnp.where(psi_valid[:, None, None], psi_new, 0.0)

        # Ring-buffer insert for time t (force-finalise oldest on overflow).
        means_pre = jnp.einsum("sfn,n->sf", psi_new, w_self)
        has_free = jnp.any(~psi_valid)
        ins = jnp.where(
            has_free,
            jnp.argmax(~psi_valid),
            jnp.argmin(jnp.where(psi_valid, psi_time, T + 1)),
        )
        spill = spill + jnp.where(has_free, 0, 1)
        out = jnp.where(
            has_free, out, out.at[psi_time[ins]].set(means_pre[ins])
        )
        out_valid = jnp.where(
            has_free, out_valid, out_valid.at[psi_time[ins]].set(True)
        )
        psi_new = psi_new.at[ins].set(_test_functions(new_state, R))
        psi_time = psi_time.at[ins].set(t)
        psi_valid = psi_valid.at[ins].set(True)

        # Finalisation: all F filtered variances below epsilon (or last step).
        means = jnp.einsum("sfn,n->sf", psi_new, w_self)
        var = jnp.einsum("sfn,n->sf", (psi_new - means[:, :, None]) ** 2, w_self)
        fin = psi_valid & (jnp.all(var < epsilon, axis=1) | (t == T - 1))
        out = out.at[psi_time].set(jnp.where(fin[:, None], means, out[psi_time]))
        out_valid = out_valid.at[psi_time].set(
            jnp.where(fin, True, out_valid[psi_time])
        )
        psi_valid = psi_valid & ~fin

        carry = (
            new_lw, new_state, psi_new, psi_time, psi_valid,
            out, out_valid, spill,
        )
        return carry, shift

    keys = jax.random.split(key, T - 1)
    carry0 = (
        lw0, st0, psi0, psi_time0, psi_valid0, out0, out_valid0,
        jnp.zeros((), jnp.int32),
    )
    # ts must be int32: psi_time is an int32 buffer and `.at[ins].set(t)`
    # with a default-int64 t (x64 test config) is an unsafe downcast.
    carry_f, shifts = jax.lax.scan(
        step, carry0, (jnp.arange(1, T, dtype=jnp.int32), keys)
    )
    (_, _, _, _, _, out, out_valid, spill) = carry_f
    return MarginalResult(
        functionals=out[:T],
        valid=out_valid[:T],
        log_normalizing_constant=shift0 + jnp.sum(shifts),
        spill_count=spill,
    )
