"""Measured CPU baseline: the reference's two-group filter re-created in
NumPy with the reference's exact cost structure.

The reference pipeline's hot path is a TF-2.3 graph-mode particle filter
(filter_and_smoother_algorithm.py:176-288) whose per-site step runs

  1. optimal finite-state resampling over N = M*(2R+R^2) particles
     (resampling_functions.py:7-52: sort, c-threshold fixed point, keep-top-K,
     systematic residual),
  2. a SEQUENTIAL per-ancestor while_loop over M ancestors, each invocation
     building its 2R deterministic successor states via `_xi`
     (case_control_proposal_mappings.py:186-195) plus the R^2
     state-independent block,
  3. vectorised transition/observation log-probs over all N children,
  4. the three-branch weight update,

followed by backward simulation (:368-446): a reverse loop over T sites, each
computing a (B, N_prev) backward-kernel matrix and sampling categoricals.

TF 2.3 / TFP 0.11 cannot be installed in this environment (pip is disabled;
BASELINE.md documents this), so this module measures a NumPy re-creation of
the same algorithm with the same loop structure, vectorised exactly where the
reference's graph is vectorised and sequential exactly where it is sequential
(the per-ancestor expansion, the per-site step, the backward sweep). NumPy
and TF-2.3 CPU graph execution have comparable per-op dispatch cost at these
tensor sizes (N=2400 f64 rows); bench.py nevertheless applies a conservative
advantage factor to the measured figure before using it as the baseline
denominator (see BASELINE.md).

Run:  python tools/reference_cpu_baseline.py [T] [M] [B]
Prints one JSON line with measured sites/sec.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
from scipy.special import betaln, gammaln

NEG = -np.inf


# ---------------------------------------------------------------------------
# Model densities (NumPy/f64; same math as run_inference_two_groups.py wiring)
# ---------------------------------------------------------------------------


def mu_sigma_to_alpha_beta(mu, sigma):
    nu = mu * (1.0 - mu) / sigma**2 - 1.0
    return mu * nu, (1.0 - mu) * nu


def betabin_logpmf(y, n, a, b):
    return (
        gammaln(n + 1.0)
        - gammaln(y + 1.0)
        - gammaln(n - y + 1.0)
        + betaln(y + a, n - y + b)
        - betaln(a, b)
    )


def nb_sojourn_rho(kappa, omega, u, d_max):
    """Hazard table rho[r, d] = h(d)/(1 - H(d-1)) with h = NB(d-u; kappa,
    omega), the TF model's formulation (case_control_regime_model.py:111-134)
    including the 0.1 fallback on non-finite values."""
    R = len(kappa)
    rho = np.zeros((R, d_max))
    for r in range(R):
        d = np.arange(d_max)
        k = np.maximum(d - u, 0)
        # TFP NegativeBinomial(total_count=kappa, probs=omega) convention
        # (case_control_regime_model.py:117-123): pmf(k) = C(k+kappa-1, k)
        # * omega^k * (1-omega)^kappa.
        logpmf = np.where(
            d - u >= 0,
            gammaln(k + kappa[r])
            - gammaln(kappa[r])
            - gammaln(k + 1.0)
            + kappa[r] * np.log1p(-omega[r])
            + k * np.log(omega[r]),
            NEG,
        )
        pmf = np.exp(logpmf)
        cdf = np.cumsum(pmf)
        denom = 1.0 - np.concatenate([[0.0], cdf[:-1]])
        with np.errstate(divide="ignore", invalid="ignore"):
            r_ = pmf / denom
        r_ = np.where(np.isfinite(r_), r_, 0.1)  # fixed_value_inf fallback
        rho[r] = np.clip(r_, 0.0, 1.0)
    return rho


class Params:
    def __init__(self, R, mu, sigma, log_p_control, log_p_merged, rho_c, rho_k, min_dur):
        self.R = R
        self.alpha, self.beta = mu_sigma_to_alpha_beta(mu, sigma)
        self.log_p_control = log_p_control
        self.log_p_merged = log_p_merged
        self.rho_c = rho_c
        self.rho_k = rho_k
        self.min_dur = min_dur


def transition_log_prob(p: Params, prev, nxt, step0=False):
    """log f(nxt | prev) over broadcastable state tuples (m, d_c, r_c, d_k,
    r_k); the branch tree of case_control_distributions.py:138-151, 246-291
    and the merged chain of case_control_regime_model.py:80-87."""
    R = p.R
    m_p, dc_p, rc_p, dk_p, rk_p = prev
    m_n, dc_n, rc_n, dk_n, rk_n = nxt

    def ind(c):
        return np.where(c, 0.0, NEG)

    gate = np.minimum(dk_p, dc_p) >= p.min_dur
    lpm = p.log_p_merged
    lp_chain = np.where(
        m_n == 0,
        np.where(m_p == 0, lpm[0, 0], lpm[1, 0]),
        np.where(m_p == 0, lpm[0, 1], lpm[1, 1]),
    )
    if step0:
        lp_m = ind(m_n == 1)
    else:
        lp_m = np.where(gate, lp_chain, ind(m_n == m_p))

    rho_c = (
        np.ones(np.broadcast(dc_p, rc_p).shape)
        if step0
        else p.rho_c[rc_p, np.minimum(dc_p, p.rho_c.shape[1] - 1)]
    )
    rho_k = (
        np.ones(np.broadcast(dk_p, rk_p).shape)
        if step0
        else p.rho_k[rk_p, np.minimum(dk_p, p.rho_k.shape[1] - 1)]
    )

    lp_p_ctrl = p.log_p_control[rc_p, rc_n]
    with np.errstate(divide="ignore"):
        lp_cp = np.log(rho_c) + lp_p_ctrl
        lp_cont = np.log1p(-rho_c) + ind(dc_p == dc_n - 1) + ind(rc_p == rc_n)
    lp_c = np.where(dc_n == 1, lp_cp, lp_cont)

    lp_a = ind((rk_n == rc_n) & (dk_n == dc_n))
    lp_unif_not_c = ind(rk_n != rc_n) - np.log(R - 1.0)
    lp_b = lp_unif_not_c + ind(dk_n == 1)
    log_n_opts = np.where(rc_n != rk_p, np.log(R - 2.0), np.log(R - 1.0))
    lp_unif2 = ind((rk_n != rc_n) & (rk_n != rk_p)) - log_n_opts
    lp_cbr = ind(dk_n == 1) + lp_unif2
    with np.errstate(divide="ignore"):
        lp_d = np.where(
            dk_n == 1,
            np.log(rho_k) + lp_unif2,
            np.log1p(-rho_k) + ind(dk_p + 1 == dk_n) + ind(rk_p == rk_n),
        )
    in_a = m_n == 1
    in_b = (m_p == 1) & (dc_n != 1)
    in_c = (rc_n == rk_p) & (m_p == 0)
    lp_k = np.where(in_a, lp_a, np.where(in_b, lp_b, np.where(in_c, lp_cbr, lp_d)))
    return lp_m + lp_c + lp_k


# ---------------------------------------------------------------------------
# The deterministic proposal (per-ancestor, as the reference executes it)
# ---------------------------------------------------------------------------


def xi_children(parent, R):
    """The 2R per-ancestor successors of _xi (case_control_proposal_mappings
    .py:11-103) for ONE parent tuple -> (2R, 5) int array. Called once per
    ancestor per site, mirroring the reference's sequential while_loop."""
    m, d_c, r_c, d_k, r_k = (int(v) for v in parent)
    # Dead (-1 padded) ancestors can be picked as top-M padding in the growth
    # phase; their children carry -inf weights, so the regime-exclusion rule
    # just needs a valid index to keep the slot count at 2R.
    skip_ctrl = r_k if 0 <= r_k < R else 0
    skip_case = r_c if 0 <= r_c < R else 0
    out = np.empty((2 * R, 5), np.int64)
    out[0] = (m, d_c + 1, r_c, d_k + 1, r_k)  # no change
    slot = 1
    for j in range(R):  # control change-points to j != r_k
        if j == skip_ctrl:
            continue
        out[slot] = (0, 1, j, d_k + 1, r_k)
        slot += 1
    for j in range(R):  # case change-points to j != r_c
        if j == skip_case:
            continue
        out[slot] = (0, d_c + 1, r_c, 1, j)
        slot += 1
    md = d_c + 1 if m == 0 else 0
    out[slot] = (1, md, r_c, md, r_c)  # merge
    return out


def indep_block(R):
    """The R^2 state-independent double-change-point states (:106-134)."""
    i = np.repeat(np.arange(R), R)
    j = np.tile(np.arange(R), R)
    ones = np.ones(R * R, np.int64)
    return np.stack([(i == j).astype(np.int64), ones, i, ones, j], axis=1)


# ---------------------------------------------------------------------------
# Optimal finite-state resampling (resampling_functions.py:7-52)
# ---------------------------------------------------------------------------


def optimal_resample(rng, log_w, M):
    """Returns (parent_indices (M,), log_c). log_w normalised."""
    w = np.exp(log_w - log_w.max())
    w /= w.sum()
    order = np.argsort(-w)
    ws = w[order]
    # Find c: the fixed point of sum(min(1, c*w)) = M (Fearnhead).
    kept = 0
    tail = 1.0
    c = None
    for k in range(M):
        c_try = (M - k) / tail if tail > 0 else np.inf
        if not np.isfinite(c_try) or c_try * ws[k] < 1.0:
            c = c_try
            kept = k
            break
        tail -= ws[k]
    if c is None or not np.isfinite(c):
        # degenerate: keep top-M deterministically (resample.h:366-408)
        return order[:M], np.inf
    n_res = M - kept
    resid = ws[kept:]
    resid = resid / resid.sum()
    u = rng.random() / n_res
    grid = u + np.arange(n_res) / n_res
    cum = np.cumsum(resid)
    idx = np.searchsorted(cum, grid * cum[-1], side="right")
    idx = np.clip(idx, 0, len(resid) - 1)
    parents = np.concatenate([order[:kept], order[kept + idx]])
    return parents, np.log(c)


# ---------------------------------------------------------------------------
# Filter + backward (the measured hot loops)
# ---------------------------------------------------------------------------


def run_reference_filter(rng, p: Params, e_c, e_k, M, B):
    """One segment: filter over T sites storing the (T, N) history, then
    backward simulation of B trajectories. Returns (logZ, trajectories)."""
    R = p.R
    I = 2 * R + R * R
    N = M * I
    T = e_c.shape[0]

    # First step: R^2 proposals vs the phantom state (:141-172).
    init = indep_block(R)
    phantom_r = rng.integers(R)
    prev0 = (
        np.ones(R * R, np.int64), np.zeros(R * R, np.int64),
        np.full(R * R, phantom_r), np.zeros(R * R, np.int64),
        np.full(R * R, phantom_r),
    )
    lw0 = transition_log_prob(p, prev0, tuple(init.T), step0=True)
    lw0 = lw0 + e_c[0, init[:, 2]] + e_k[0, init[:, 4]]
    lw = np.full(N, NEG)
    lw[: R * R] = lw0
    parts = np.full((N, 5), -1, np.int64)
    parts[: R * R] = init

    hist_lw = np.empty((T, N))
    hist_parts = np.empty((T, N, 5), np.int64)
    hist_lw[0] = lw
    hist_parts[0] = parts
    log_z = 0.0

    ib = indep_block(R)
    for t in range(1, T):
        finite = np.isfinite(lw)
        z = np.logaddexp.reduce(lw[finite])
        log_norm = lw - z
        if np.sum(finite) > M:
            parents, log_c = optimal_resample(rng, log_norm, M)
            resampled = True
        else:
            parents = np.argsort(-lw)[:M]
            log_c, resampled = 0.0, False

        # SEQUENTIAL per-ancestor expansion — the reference's inner hot loop.
        children = np.empty((M, 2 * R, 5), np.int64)
        for mi in range(M):
            children[mi] = xi_children(parts[parents[mi]], R)
        # state-independent block per ancestor
        full = np.concatenate(
            [children, np.broadcast_to(ib[None], (M, R * R, 5))], axis=1
        )  # (M, I, 5)
        anc = parts[parents]  # (M, 5)
        prev_b = tuple(anc[:, i][:, None] for i in range(5))
        nxt_b = tuple(full[:, :, i] for i in range(5))
        trans = transition_log_prob(p, prev_b, nxt_b)  # (M, I)
        obs = e_c[t, full[:, :, 2]] + e_k[t, full[:, :, 4]]
        log_gamma = np.where(np.isfinite(trans), trans + obs, NEG)

        prev_unnorm = lw[parents][:, None]
        prev_norm = log_norm[parents][:, None]
        if not resampled:
            new_lw = prev_unnorm + log_gamma
        elif not np.isfinite(log_c):
            new_lw = (-np.log(M) + z) + log_gamma
        else:
            with np.errstate(invalid="ignore"):
                new_lw = np.where(
                    np.isfinite(prev_unnorm),
                    prev_unnorm + log_gamma - np.minimum(0.0, log_c + prev_norm),
                    NEG,
                )
        lw = new_lw.T.reshape(-1)  # slot-major n = i*M + m, like the reference
        parts = full.transpose(1, 0, 2).reshape(N, 5)
        shift = np.logaddexp.reduce(lw[np.isfinite(lw)])
        lw = lw - shift
        log_z += shift
        hist_lw[t] = lw
        hist_parts[t] = parts

    # Backward simulation (:368-446): reverse loop, (B, N) kernel per step.
    w_last = np.exp(hist_lw[T - 1] - np.logaddexp.reduce(hist_lw[T - 1][np.isfinite(hist_lw[T - 1])]))
    w_last = np.where(np.isfinite(w_last), w_last, 0.0)
    w_last /= w_last.sum()
    cur_idx = rng.choice(N, size=B, p=w_last)
    traj = np.empty((T, B, 5), np.int64)
    traj[T - 1] = hist_parts[T - 1][cur_idx]
    for t in range(T - 2, -1, -1):
        prev_states = tuple(hist_parts[t][:, i][None, :] for i in range(5))
        nxt_states = tuple(traj[t + 1][:, i][:, None] for i in range(5))
        trans = transition_log_prob(p, prev_states, nxt_states)  # (B, N)
        logits = np.where(
            np.isfinite(trans) & np.isfinite(hist_lw[t])[None, :],
            hist_lw[t][None, :] + trans,
            NEG,
        )
        mx = logits.max(axis=1, keepdims=True)
        prob = np.exp(logits - mx)
        prob /= prob.sum(axis=1, keepdims=True)
        cdf = np.cumsum(prob, axis=1)
        u = rng.random((B, 1)) * cdf[:, -1:]
        sel = (cdf <= u).sum(axis=1).clip(0, N - 1)
        traj[t] = hist_parts[t][sel]
    return log_z, traj


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    R = 6
    rng = np.random.default_rng(0)

    mu = np.array([0.95, 0.05, 0.8, 0.2, 0.5, 0.5])
    sigma = np.array([0.05, 0.05, 0.1, 0.1, 0.1, 0.2886751])
    logits = rng.normal(size=(R, R))
    np.fill_diagonal(logits, NEG)
    pm = np.where(np.isfinite(logits), np.exp(logits), 0.0)
    pm /= pm.sum(1, keepdims=True)
    with np.errstate(divide="ignore"):
        log_p = np.log(pm)
    lpm = np.log(np.array([[0.9, 0.1], [0.01, 0.99]]))
    rho_c = nb_sojourn_rho(np.full(R, 2.0), np.full(R, 1 / (1 + np.exp(-2.0))), 3, T + 2)
    rho_k = nb_sojourn_rho(np.full(R, 2.0), np.full(R, 0.8), 3, T + 2)
    p = Params(R, mu, sigma, log_p, lpm, rho_c, rho_k, 3)

    n = rng.poisson(20, size=(T, 2)).astype(float)
    y = np.minimum(rng.poisson(8, size=(T, 2)), n)
    a, b = p.alpha, p.beta
    e_c = betabin_logpmf(y[:, None, :], n[:, None, :], a[None, :, None], b[None, :, None]).sum(-1)
    e_k = betabin_logpmf(
        np.minimum(y + 1, n)[:, None, :], n[:, None, :], a[None, :, None], b[None, :, None]
    ).sum(-1)

    t0 = time.perf_counter()
    log_z, traj = run_reference_filter(rng, p, e_c, e_k, M, B)
    elapsed = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "reference_cpu_sites_per_sec",
                "value": round(T / elapsed, 2),
                "unit": "sites/s",
                "T": T, "M": M, "B": B,
                "log_z": round(float(log_z), 3),
                "elapsed_s": round(elapsed, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
