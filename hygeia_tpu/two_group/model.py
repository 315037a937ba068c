"""Case/control (merged/split) change-point regime model as pure functions.

TPU-first re-design of the reference's TFP distribution classes
(case_control_regime_model.py, case_control_distributions.py): the latent
state is a 5-tuple of int arrays

    State = (m, d_c, r_c, d_k, r_k)
      m   in {0,1}  : merged indicator (1 = case copies control)
      d_c, r_c      : control (sojourn, regime)
      d_k, r_k      : case (sojourn, regime)

and the transition density is one fully-vectorised branch tree (jnp.where)
over broadcastable arrays — no Distribution objects, no per-particle loops.
Hazards come from precomputed (R, D_max) tables (ops/hazard.rho_two_group).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from hygeia_tpu.ops.distributions import (
    inv_logit,
    mu_sigma_to_alpha_beta,
)
from hygeia_tpu.ops.hazard import rho_two_group, gather_rho

_NEG_INF = -jnp.inf


class State(NamedTuple):
    """Batch of latent states; all fields share a broadcastable int32 shape."""

    m: jnp.ndarray
    d_c: jnp.ndarray
    r_c: jnp.ndarray
    d_k: jnp.ndarray
    r_k: jnp.ndarray

    def stack(self):
        """Pack into (5, ...) int32 — storage layout for the filter history.

        The field axis LEADS: TPU arrays tile their last two dims to (8, 128)
        lanes, so a trailing length-5 axis would pad 25x in HBM (a (T, N, 5)
        history for one 100k-site segment would claim ~40 GB). With (5, N)
        blocks the last dim is the particle axis and packs densely.

        Field order [m, d_c, r_c, d_k, r_k]; external outputs (npz files)
        transpose back to the reference's (duration, regime) pair layout
        (aggregate_results.py:139-142)."""
        return jnp.stack(
            [self.m, self.d_c, self.r_c, self.d_k, self.r_k], axis=0
        ).astype(jnp.int32)

    @staticmethod
    def unstack(arr):
        return State(arr[0], arr[1], arr[2], arr[3], arr[4])


class TwoGroupParams(NamedTuple):
    """Model parameters (all device arrays; n_regimes/min_duration static)."""

    n_regimes: int
    min_duration: int
    mu: jnp.ndarray  # (R,)
    sigma: jnp.ndarray  # (R,)
    alpha: jnp.ndarray  # (R,)
    beta: jnp.ndarray  # (R,)
    log_p_control: jnp.ndarray  # (R, R) log transition probs, -inf diagonal
    log_p_merged: jnp.ndarray  # (2, 2) log merged-indicator transition probs
    rho_control: jnp.ndarray  # (R, D_max) hazard table for the control group
    rho_case: jnp.ndarray  # (R, D_max) hazard table for the case group


def make_params(
    *,
    mu,
    sigma,
    p_softmax_control,
    omega_logit_control,
    omega_case,
    kappa_control,
    kappa_case,
    merge_log_prob,
    split_prob,
    minimum_duration,
    d_max,
    dtype=jnp.float32,
):
    """Build TwoGroupParams exactly the way run_inference_two_groups.py does.

    Args mirror the reference CLI (run_inference_two_groups.py:19-73,110-167):
      p_softmax_control: (R, R) log-probabilities of the control regime
        transition matrix (rows normalised over off-diagonals, -inf diag), as
        produced from the single-group theta file
        (get_estimated_control_group_param, :76-89).
      omega_logit_control: (R,) theta components logit(omega) from the
        single-group fit. The reference applies inv_logit twice and the model
        applies one logit, so the *effective* NB success probability is
        inv_logit(omega_logit_control) (:144-150 with :117-119).
      omega_case: scalar; effective NB success probability for the case group
        (flag default 0.8; the double transform cancels identically).
      merge_log_prob / split_prob: the 2x2 merged-indicator chain
        (:164-167), rows [[1-pm, pm], [ps, 1-ps]].
    """
    mu = jnp.asarray(mu, dtype)
    sigma = jnp.asarray(sigma, dtype)
    R = int(mu.shape[0])
    alpha, beta = mu_sigma_to_alpha_beta(mu, sigma)

    logp = jnp.asarray(p_softmax_control, dtype)
    # Renormalise rows over off-diagonal entries with -inf diagonal, matching
    # _next_regime_control_probs (case_control_regime_model.py:90-94).
    logp = jnp.where(jnp.eye(R, dtype=bool), _NEG_INF, logp)
    logp = logp - jax_logsumexp(logp, axis=1, keepdims=True)

    pm = np.exp(merge_log_prob)
    ps = split_prob
    log_p_merged = jnp.asarray(
        np.log(np.array([[1.0 - pm, pm], [ps, 1.0 - ps]])), dtype
    )

    omega_control_eff = inv_logit(jnp.asarray(omega_logit_control, dtype))
    omega_case_eff = jnp.asarray(omega_case, dtype) * jnp.ones((R,), dtype)

    rho_c = rho_two_group(
        jnp.asarray(kappa_control, dtype), omega_control_eff, minimum_duration, d_max
    )
    rho_k = rho_two_group(
        jnp.asarray(kappa_case, dtype), omega_case_eff, minimum_duration, d_max
    )
    return TwoGroupParams(
        n_regimes=R,
        min_duration=int(minimum_duration),
        mu=mu,
        sigma=sigma,
        alpha=alpha,
        beta=beta,
        log_p_control=logp,
        log_p_merged=log_p_merged,
        rho_control=rho_c,
        rho_case=rho_k,
    )


def jax_logsumexp(x, axis=None, keepdims=False):
    import jax.scipy.special as jsp

    return jsp.logsumexp(x, axis=axis, keepdims=keepdims)


def _log_indicator(cond):
    return jnp.where(cond, 0.0, _NEG_INF)


# Sentinel standing in for -inf during the one-hot matmul lookup below; any
# result at or below _RESTORE_INF is mapped back to -inf (genuine transition
# log-probs are orders of magnitude above it).
_SAFE_NEG = -1e30
_RESTORE_INF = -1e29


def _lookup_log_p(log_p, r_prev, r_nxt, R):
    """log_p[r_prev, r_nxt] for broadcastable int batches, gather-free.

    A table gather keyed on a particle axis lowers to an XLA scalar loop
    (~37 ns/element; CLAUDE.md rule 7) — inside the backward scan this was a
    per-step cost. Instead: one-hot select-reduce with -inf encoded as -1e30
    so the products stay exact (one nonzero term per output), then restored.
    Out-of-range indices (the -1 padding particles) yield all-zero one-hots
    and a result of -inf; every consumer masks those slots by their -inf
    weights anyway.
    """
    regs = jnp.arange(R)
    safe = jnp.where(jnp.isfinite(log_p), log_p, _SAFE_NEG)
    oh_prev = (r_prev[..., None] == regs).astype(safe.dtype)
    oh_nxt = (r_nxt[..., None] == regs).astype(safe.dtype)
    # tmp[..., i] = safe[i, r_nxt[...]]. HIGHEST precision keeps the MXU from
    # rounding the f32 table through bf16 passes — the one-hot operand makes
    # the full-precision product exact (one nonzero term per output).
    tmp = jnp.einsum(
        "...j,ij->...i", oh_nxt, safe, precision=jax.lax.Precision.HIGHEST
    )
    val = jnp.sum(oh_prev * tmp, axis=-1)
    # All-zero one-hot rows (padding) produce 0 with no mass selected; send
    # them to -inf along with restored sentinel values.
    dead = jnp.sum(oh_prev, axis=-1) * jnp.sum(oh_nxt, axis=-1) == 0
    return jnp.where((val <= _RESTORE_INF) | dead, _NEG_INF, val)


def transition_log_prob(
    params: TwoGroupParams,
    prev: State,
    nxt: State,
    *,
    step0=False,
    rho_c=None,
    rho_k=None,
):
    """log f(nxt | prev), fully vectorised over broadcastable State batches.

    Mirrors, branch for branch:
      merged chain     — _next_merged_state_probs (case_control_regime_model.py:80-87)
      control          — ControlStateTransition._log_prob (case_control_distributions.py:138-151)
      case (4 branches)— CaseStateTransition._log_prob (case_control_distributions.py:246-291)

    step0=True applies the phantom-state overrides: merged probs [[0,1],[0,1]]
    and rho == 1 (case_control_regime_model.py:84,136,166).

    rho_c / rho_k: optional precomputed hazards at the PREV states (same
    broadcast shape as prev.d_c). The backward pass evaluates this density
    against the stored particle history every step; the hazards depend only
    on prev, so it hoists the table lookups out of its scan and passes them
    here (two (T, N) gathers total instead of two (N,) gathers per step).

    TPU note: this function performs NO table gathers keyed on a large batch
    axis — the merged rows are a 2-way select, the control transition row is
    a one-hot x one-hot matmul sandwich (exact: one nonzero term per output),
    and the hazards are either precomputed or gathered at small prev shapes
    by gather_rho. Large (next x prev)-shaped gathers were the dominant cost
    of the backward pass on TPU.
    """
    R = params.n_regimes
    dtypef = params.rho_case.dtype

    # --- merged indicator --------------------------------------------------
    gate = jnp.minimum(prev.d_k, prev.d_c) >= params.min_duration
    # prev.m is binary: select between the two rows instead of gathering.
    lpm = params.log_p_merged  # (2, 2)
    lp_chain = jnp.where(
        nxt.m == 0,
        jnp.where(prev.m == 0, lpm[0, 0], lpm[1, 0]),
        jnp.where(prev.m == 0, lpm[0, 1], lpm[1, 1]),
    )
    lp_identity = _log_indicator(nxt.m == prev.m)
    if step0:
        lp_m = _log_indicator(nxt.m == 1)
    else:
        lp_m = jnp.where(gate, lp_chain, lp_identity)

    # --- control state -----------------------------------------------------
    if step0:
        rho_c = jnp.ones_like(prev.d_c, params.rho_control.dtype)
    elif rho_c is None:
        rho_c = gather_rho(params.rho_control, prev.d_c, prev.r_c)
    lp_p_ctrl = _lookup_log_p(params.log_p_control, prev.r_c, nxt.r_c, R)
    lp_ctrl_cp = jnp.log(rho_c) + lp_p_ctrl
    lp_ctrl_cont = (
        jnp.log1p(-rho_c)
        + _log_indicator(prev.d_c == nxt.d_c - 1)
        + _log_indicator(prev.r_c == nxt.r_c)
    )
    lp_c = jnp.where(nxt.d_c == 1, lp_ctrl_cp, lp_ctrl_cont)

    # --- case state --------------------------------------------------------
    if step0:
        rho_k = jnp.ones_like(prev.d_k, params.rho_case.dtype)
    elif rho_k is None:
        rho_k = gather_rho(params.rho_case, prev.d_k, prev.r_k)

    # Branch a: currently merged -> case is an exact copy of control.
    lp_a = _log_indicator((nxt.r_k == nxt.r_c) & (nxt.d_k == nxt.d_c))

    # Uniform log-prob over regimes != nxt.r_c (R-1 options).
    lp_unif_not_c = _log_indicator(nxt.r_k != nxt.r_c) - jnp.log(float(R - 1))
    # Branch b: just unmerged (prev merged, control did not jump): forced case
    # jump, uniform over regimes != current control regime.
    lp_b = lp_unif_not_c + _log_indicator(nxt.d_k == 1)

    # Branches c/d regime factor: uniform over regimes excluding both the
    # current control regime and the previous case regime. n_opts is R-1 or
    # R-2 only — select between the two precomputed logs instead of a
    # (next x prev)-shaped transcendental.
    log_n_opts = jnp.where(
        nxt.r_c != prev.r_k,
        jnp.log(jnp.asarray(R - 2, dtypef)),
        jnp.log(jnp.asarray(R - 1, dtypef)),
    )
    lp_unif_not_c_not_prev = (
        _log_indicator((nxt.r_k != nxt.r_c) & (nxt.r_k != prev.r_k))
        - log_n_opts
    )
    # Branch c: collision — control jumped into the case's regime while split:
    # forced case jump.
    lp_c_branch = _log_indicator(nxt.d_k == 1) + lp_unif_not_c_not_prev
    # Branch d: free case evolution under the hazard.
    lp_d_cp = jnp.log(rho_k) + lp_unif_not_c_not_prev
    lp_d_cont = (
        jnp.log1p(-rho_k)
        + _log_indicator(prev.d_k + 1 == nxt.d_k)
        + _log_indicator(prev.r_k == nxt.r_k)
    )
    lp_d = jnp.where(nxt.d_k == 1, lp_d_cp, lp_d_cont)

    in_a = nxt.m == 1
    in_b = (prev.m == 1) & (nxt.d_c != 1)
    in_c = (nxt.r_c == prev.r_k) & (prev.m == 0)
    lp_k = jnp.where(in_a, lp_a, jnp.where(in_b, lp_b, jnp.where(in_c, lp_c_branch, lp_d)))

    return lp_m + lp_c + lp_k


def paired_transition_log_prob(params: "TwoGroupParams", anc: State, children: State):
    """log f(children[i, m] | anc[m]) as (I, M) — the filter's paired layout.

    Same restructuring as _backward_logits (prev-only factors computed once
    at (M,), ~half the joint-grid ops of the generic density), but for
    children PAIRED with their ancestor along the M axis instead of an outer
    (B, N) product. Equivalence with transition_log_prob is covered by
    tests/test_two_group_filter.py::test_paired_logits_matches_transition.

    PRECONDITION (live ancestors only): unlike transition_log_prob, the
    one-hot row lookups here drop _lookup_log_p's dead-index guard — a
    padding ancestor (regime -1) yields an all-zero one-hot and a row of
    0.0 instead of -inf. Every caller must mask dead ancestor slots via
    -inf weights (the filter does: dead parents propagate -inf through the
    weight update), so the kernel is NOT drop-in equivalent to
    transition_log_prob on padded states.
    """
    R = params.n_regimes
    f32 = params.rho_case.dtype
    NEG = _NEG_INF

    def ind(c):
        return jnp.where(c, 0.0, NEG)

    # ---- ancestor-only (M,) -------------------------------------------------
    rho_c = gather_rho(params.rho_control, anc.d_c, anc.r_c)
    rho_k = gather_rho(params.rho_case, anc.d_k, anc.r_k)
    log_rho_c, log1m_rho_c = jnp.log(rho_c), jnp.log1p(-rho_c)
    log_rho_k, log1m_rho_k = jnp.log(rho_k), jnp.log1p(-rho_k)
    gate = jnp.minimum(anc.d_k, anc.d_c) >= params.min_duration
    lpm = params.log_p_merged
    to0 = jnp.where(anc.m == 0, lpm[0, 0], lpm[1, 0])
    to1 = jnp.where(anc.m == 0, lpm[0, 1], lpm[1, 1])
    regs = jnp.arange(R)
    safe = jnp.where(jnp.isfinite(params.log_p_control), params.log_p_control, -1e30)
    oh_anc = (anc.r_c[:, None] == regs).astype(f32)  # (M, R)
    rows = jax.lax.dot(oh_anc, safe, precision=jax.lax.Precision.HIGHEST)  # (M, R)

    aM = lambda x: x[None, :]  # ancestor (M,) -> (1, M)

    # ---- joint (I, M) --------------------------------------------------------
    lp_m = jnp.where(
        aM(gate),
        jnp.where(children.m == 0, aM(to0), aM(to1)),
        ind(children.m == aM(anc.m)),
    )

    # Control row value log_p[anc.r_c[m], children.r_c[i, m]]: one-hot select
    # over the precomputed rows (exact; avoids an (I, M)-keyed gather).
    oh_ch = (children.r_c[..., None] == regs).astype(f32)  # (I, M, R)
    lp_p_raw = jnp.sum(rows[None, :, :] * oh_ch, axis=-1)
    lp_p_ctrl = jnp.where(lp_p_raw <= -1e29, NEG, lp_p_raw)
    lp_c = jnp.where(
        children.d_c == 1,
        aM(log_rho_c) + lp_p_ctrl,
        aM(log1m_rho_c)
        + ind(aM(anc.d_c) == children.d_c - 1)
        + ind(aM(anc.r_c) == children.r_c),
    )

    lp_a = ind((children.r_k == children.r_c) & (children.d_k == children.d_c))
    lp_unif_not_c = ind(children.r_k != children.r_c) - jnp.log(float(R - 1))
    lp_b = lp_unif_not_c + ind(children.d_k == 1)
    log_n_opts = jnp.where(
        children.r_c != aM(anc.r_k),
        jnp.log(jnp.asarray(R - 2, f32)),
        jnp.log(jnp.asarray(R - 1, f32)),
    )
    lp_unif2 = (
        ind(children.r_k != children.r_c)
        + ind(children.r_k != aM(anc.r_k))
        - log_n_opts
    )
    lp_cbr = ind(children.d_k == 1) + lp_unif2
    lp_d = jnp.where(
        children.d_k == 1,
        aM(log_rho_k) + lp_unif2,
        aM(log1m_rho_k)
        + ind(aM(anc.d_k + 1) == children.d_k)
        + ind(aM(anc.r_k) == children.r_k),
    )
    in_b = aM(anc.m == 1) & (children.d_c != 1)
    in_c = (children.r_c == aM(anc.r_k)) & aM(anc.m == 0)
    lp_k = jnp.where(
        children.m == 1,
        lp_a,
        jnp.where(in_b, lp_b, jnp.where(in_c, lp_cbr, lp_d)),
    )
    return lp_m + lp_c + lp_k



def phantom_state(phantom_regime, batch_shape=()):
    """The phantom previous state used for the initial distribution
    (intitial_state_dist, case_control_regime_model.py:234-244): merged, with
    zero sojourns, in a uniformly-random regime."""
    r = jnp.broadcast_to(jnp.asarray(phantom_regime, jnp.int32), batch_shape)
    z = jnp.zeros_like(r)
    return State(m=jnp.ones_like(r), d_c=z, r_c=r, d_k=z, r_k=r)


def observation_log_prob(emission_control, emission_case, t, state: State):
    """Gather the per-site emission table (ops/emissions) at the particle
    regimes; replaces observation_fn (case_control_regime_model.py:197-231)."""
    return emission_control[t, state.r_c] + emission_case[t, state.r_k]
