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

import numpy as np
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


def _structured_psi_update(params: TwoGroupParams, prev: State, lw_prev, anc: State, psi):
    """psi @ B_norm^T without materialising the (N, N) backward kernel.

    The generic path evaluates the ~50-op transition branch tree on the full
    (N_new, N_prev) = 5.76M-entry grid every site — 112 of 198 us/step, the
    marginal filter's dominant cost (PERF.md marginal cost model). But the
    new particle set has (I, M) child structure (proposal.expand_states), so
    every child ROW of B factorises into per-prev-j scalars x small equality
    masks keyed on the child's ANCESTOR fields x (at most) one rank-R regime
    factor:

      cont (slot 0)       predecessors must match the ancestor's control pair
                          exactly (continuation support); merged children
                          need ONLY the control match (branch a constrains
                          the next state, not the predecessor), unmerged
                          children add the case match. One (M, N) column set.
      ctrl-CP (R-1)       control side marginalises over ALL prev (rho_c_j *
                          P[r_c_j, r']); case side pins (d_k, r_k) to the
                          ancestor. The in_c exclusion (r' == r_k_j) can
                          never bind under the case mask because the slot
                          regime enumerates {0..R-1}\\{r_k_anc}. Rank-R via
                          the r_c one-hot: (M*R, N) columns, the P factor
                          applied after the matmul.
      case-CP (R-1)       control continuation mask + a case factor that
                          depends on prev only through (m_j, rho_k_j, r_k_j):
                          merged prev -> forced-split 1/(R-1) (in_b, since
                          nxt.d_c >= 2); unmerged prev -> rho_k_j *
                          1[q != r_k_j]/(R-2) (the in_c collision cannot
                          fire: it needs r_k_j == r_c_j, impossible for live
                          unmerged states). 1[q != r_k_j] = full r_k-one-hot
                          sum minus the q column: (M + M*R, N) columns.
      merge (slot 2R-1)   control match + chain-to-merged: (M, N) columns
                          (zeroed for merged ancestors, whose merge children
                          are dead — proposal.py merge_dur=0).
      indep (R*R)         children are STATIC states shared by all ancestors:
                          build the (R*R, N) rows densely (86k entries of
                          cheap arithmetic) and replicate the result over M.

    One (S*F + 1, N) x (N, C~=786) matmul (the +1 ones-row produces the row
    denominators) replaces the 5.76M-entry tree + the (S*F, N) x (N, N)
    einsum. Rows whose denominator is 0 (dead children) return psi = 0,
    matching the generic path's non-finite-logsumexp guard. Equivalence with
    the einsum-over-_backward_logits path on live children is covered by
    tests/test_marginal_filter.py::test_structured_psi_update_matches_generic.

    Reference scope: same quantity as smoothing_functions.py:27-59's
    backward kernel applied to the psi recursion (:85); the structure is a
    TPU redesign with no reference counterpart.
    """
    from hygeia_tpu.two_group.backward import _structured_rho

    R = params.n_regimes
    N = prev.m.shape[0]
    M = anc.m.shape[0]
    S, F = psi.shape[0], psi.shape[1]
    f32 = psi.dtype
    hi = jax.lax.Precision.HIGHEST

    w = jnp.where(jnp.isfinite(lw_prev), jnp.exp(lw_prev), 0.0).astype(f32)
    rho_c, rho_k = _structured_rho(params, prev)
    rho_c, rho_k = rho_c.astype(f32), rho_k.astype(f32)
    one_m_rc = 1.0 - rho_c
    gate = jnp.minimum(prev.d_k, prev.d_c) >= params.min_duration
    pm = jnp.exp(params.log_p_merged).astype(f32)
    m0 = (prev.m == 0).astype(f32)
    m1 = (prev.m == 1).astype(f32)
    to0 = jnp.where(prev.m == 0, pm[0, 0], pm[1, 0])
    to1 = jnp.where(prev.m == 0, pm[0, 1], pm[1, 1])
    chain0 = jnp.where(gate, to0, m0)  # P(m -> 0 | prev), incl. the gate
    chain1 = jnp.where(gate, to1, m1)
    regs = jnp.arange(R)
    oh_rc = (prev.r_c[:, None] == regs).astype(f32)  # (N, R)
    oh_rk = (prev.r_k[:, None] == regs).astype(f32)
    P = jnp.where(
        jnp.isfinite(params.log_p_control), jnp.exp(params.log_p_control), 0.0
    ).astype(f32)
    Prow = jax.lax.dot(oh_rc, P, precision=hi)  # (N, R): P[r_c_j, :]

    maskC = (
        (prev.d_c[None, :] == anc.d_c[:, None])
        & (prev.r_c[None, :] == anc.r_c[:, None])
    ).astype(f32)  # (M, N)
    maskK = (
        (prev.d_k[None, :] == anc.d_k[:, None])
        & (prev.r_k[None, :] == anc.r_k[:, None])
    ).astype(f32)

    # --- column operands (C, N) ---------------------------------------------
    anc_merged = (anc.m == 1)[:, None]
    col_cont = (w * one_m_rc)[None, :] * maskC * jnp.where(
        anc_merged,
        chain1[None, :],
        (chain0 * (1.0 - rho_k) * m0)[None, :] * maskK,
    )
    col_merge = (w * chain1 * one_m_rc)[None, :] * maskC * (anc.m == 0)[:, None]
    cC = w * chain0 * rho_c * (1.0 - rho_k)
    colH1 = (cC[None, None, :] * maskK[:, None, :]) * oh_rc.T[None, :, :]  # (M,R,N)
    # R - 2 guards R == 2 (the branch's indicator is then identically 0 and
    # 0 * finite == 0, where 0 * inf would be NaN).
    Rm2 = float(max(R - 2, 1))
    a1 = w * chain0 * one_m_rc * m1 / float(R - 1)
    colT1 = a1[None, :] * maskC
    a2 = w * chain0 * one_m_rc * rho_k * m0 / Rm2
    colH2 = (a2[None, None, :] * maskC[:, None, :]) * oh_rk.T[None, :, :]  # (M,R,N)

    kk = np.arange(R * R)
    i_idx, q_idx = kk // R, kk % R
    Prow_i = Prow.T[i_idx]  # (R*R, N) static gather over a host index
    eq_rk_i = oh_rk.T[i_idx]  # (R*R, N): 1[r_k_j == i]
    neq_rk_q = 1.0 - oh_rk.T[q_idx]
    n_opts = jnp.where(eq_rk_i == 1.0, float(R - 1), Rm2)
    casefac = jnp.where(
        (m0[None, :] == 1.0) & (eq_rk_i == 1.0),
        1.0 / float(R - 1),
        rho_k[None, :] * neq_rk_q / n_opts,
    )
    col_ind = (
        (w * rho_c)[None, :]
        * Prow_i
        * jnp.where(
            (i_idx == q_idx)[:, None], chain1[None, :], chain0[None, :] * casefac
        )
    )  # (R*R, N)

    G = jnp.concatenate(
        [
            col_cont,  # M
            colH1.reshape(M * R, N),  # M*R
            colT1,  # M
            colH2.reshape(M * R, N),  # M*R
            col_merge,  # M
            col_ind,  # R*R
        ],
        axis=0,
    )
    SFp = S * F + 1
    psi_aug = jnp.concatenate(
        [psi.reshape(S * F, N), jnp.ones((1, N), f32)], axis=0
    )
    Y = jax.lax.dot(psi_aug, G.T)  # (SFp, C); default precision like the
    # generic path's einsum

    off = 0
    y_cont = Y[:, off : off + M]; off += M
    H1 = Y[:, off : off + M * R].reshape(SFp, M, R); off += M * R
    yT1 = Y[:, off : off + M]; off += M
    H2 = Y[:, off : off + M * R].reshape(SFp, M, R); off += M * R
    y_merge = Y[:, off : off + M]; off += M
    y_ind = Y[:, off : off + R * R]

    # ctrl-CP: apply the P[., r'(s, m)] factor post-matmul (one-hot, exact).
    sA = jnp.arange(R - 1, dtype=jnp.int32)[:, None]
    ctrl_regime = jnp.where(sA < anc.r_k[None, :], sA, sA + 1)  # (R-1, M)
    oh_ctrl = (ctrl_regime[..., None] == regs).astype(f32)  # (R-1, M, R)
    P_sel = jnp.einsum("smr,xr->smx", oh_ctrl, P)  # P[x, r'(s,m)]
    y_ctrl = jnp.einsum("zmx,smx->zsm", H1, P_sel)

    # case-CP: T1 (q-independent) + sum_y H2 - H2 at y = q(s, m).
    jB = jnp.arange(R - 1, dtype=jnp.int32)[:, None]
    case_regime = jnp.where(jB < anc.r_c[None, :], jB, jB + 1)  # (R-1, M)
    oh_case = (case_regime[..., None] == regs).astype(f32)
    H2_sel = jnp.einsum("zmy,smy->zsm", H2, oh_case)
    y_case = (yT1 + H2.sum(-1))[:, None, :] - H2_sel

    num = jnp.concatenate(
        [
            y_cont[:, None, :],
            y_ctrl,
            y_case,
            y_merge[:, None, :],
            jnp.broadcast_to(y_ind[:, :, None], (SFp, R * R, M)),
        ],
        axis=1,
    ).reshape(SFp, N)  # child flattening n = i*M + m
    denom = num[-1]
    psi_new = jnp.where(
        denom[None, :] > 0.0, num[:-1] / jnp.where(denom > 0.0, denom, 1.0), 0.0
    )
    return psi_new.reshape(S, F, N)


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
    structured=True,
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
        new_lw, new_state, parents = _one_step(
            k, params, emission_control, emission_case, t, lw,
            prev_state, M, True, False, with_parents=True,
        )
        shift = logsumexp(new_lw)
        new_lw = new_lw - shift
        # Cast to the psi/out dtype (f32): with f64 weights the means would
        # otherwise promote and the out-buffer scatter would downcast.
        w_self = jnp.where(jnp.isfinite(new_lw), jnp.exp(new_lw), 0.0).astype(
            jnp.float32
        )

        if structured:
            # Structured psi update: the (I, M) child layout collapses the
            # (N, N) backward-kernel grid to masked low-rank column
            # operands — see _structured_psi_update (the marginal filter's
            # former dominant per-step cost, PERF.md marginal cost model).
            anc = State(*(f[parents] for f in prev_state))
            psi_new = _structured_psi_update(params, prev_state, lw, anc, psi)
        else:
            # Generic path (kept for A/B measurement — tools/bisect_marginal):
            # backward kernels over the full (N_new x N_prev) grid via the
            # backward-specialised kernel (backward._backward_logits).
            logB = _backward_logits(
                params, prev_state, new_state, lw, history_layout=True
            )
            logBZ = logsumexp(logB, axis=1, keepdims=True)
            B = jnp.where(
                jnp.isfinite(logBZ), jnp.exp(logB - logBZ), 0.0
            ).astype(jnp.float32)
            # psi recursion: (S, F, N_prev) x (N_new, N_prev)^T.
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
