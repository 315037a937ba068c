"""Single-group change-point model: parameter packing and densities.

Replaces the C++ ModelParameters/Model specialisation (singleGroup.h) with
pure functions over precomputed tables. The latent state is (d, r): sojourn
time and methylation regime. theta packs, in order (singleGroup.h:104-116):

    theta[0 : R(R-1)]        row-wise off-diagonal softmax params of P
    theta[R(R-1) : R^2]      logit(omega)
    theta[R^2 : R(R+1)]      log(kappa)        (only if kappa not fixed)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from hygeia_tpu.ops.distributions import (
    inv_logit,
    logit,
    mu_sigma_to_alpha_beta,
    row_softmax_offdiag,
)
from hygeia_tpu.ops.hazard import hazard_table_with_grads

_NEG_INF = -jnp.inf


class SingleGroupModel(NamedTuple):
    """Static configuration (hyperparameters vartheta; singleGroup.h:173-195)."""

    n_regimes: int
    u: int  # minimum distance between change points
    kappa_fixed: bool
    d_max: int  # hazard table depth (sojourns clamp here; see ops/hazard)
    alpha: jnp.ndarray  # (R,)
    beta: jnp.ndarray  # (R,)
    kappa0: jnp.ndarray  # (R,) fixed kappa values (used when kappa_fixed)

    @property
    def dim_theta(self) -> int:
        R = self.n_regimes
        return R * R if self.kappa_fixed else R * (R + 1)


class ThetaTables(NamedTuple):
    """Everything derived from theta, rebuilt on each parameter update."""

    P: jnp.ndarray  # (R, R) transition matrix, zero diagonal
    log_P: jnp.ndarray  # (R, R), -inf diagonal
    omega: jnp.ndarray  # (R,)
    kappa: jnp.ndarray  # (R,)
    rho: jnp.ndarray  # (R, d_max)
    exit_status: jnp.ndarray  # (R, d_max) bool
    grad_omega_log_rho: jnp.ndarray  # (R, d_max)
    grad_kappa_log_rho: jnp.ndarray  # (R, d_max) (zeros when kappa fixed)


def make_model(mu, sigma, u, kappa, *, kappa_fixed=True, d_max=4096, dtype=jnp.float32):
    """Build the static model config from the CLI-level parameters
    (get_known_parameters, model_functions.R:36-63)."""
    mu = jnp.asarray(mu, dtype)
    sigma = jnp.asarray(sigma, dtype)
    alpha, beta = mu_sigma_to_alpha_beta(mu, sigma)
    return SingleGroupModel(
        n_regimes=int(mu.shape[0]),
        u=int(u),
        kappa_fixed=bool(kappa_fixed),
        d_max=int(d_max),
        alpha=alpha,
        beta=beta,
        kappa0=jnp.asarray(kappa, dtype),
    )


def build_tables(model: SingleGroupModel, theta) -> ThetaTables:
    """theta -> (P, omega, kappa) + hazard/gradient tables.

    Mirrors ModelParameters::setUnknownParameters (singleGroup.h:197-269).
    Fully traceable: called inside the scan on every parameter update.
    """
    R = model.n_regimes
    theta = jnp.asarray(theta)
    P = row_softmax_offdiag(theta[: R * (R - 1)], R)
    log_P = jnp.where(P > 0.0, jnp.log(P), _NEG_INF)
    omega = inv_logit(theta[R * (R - 1) : R * R])
    if model.kappa_fixed:
        kappa = model.kappa0.astype(theta.dtype)
    else:
        kappa = jnp.exp(theta[R * R : R * (R + 1)])
    haz = hazard_table_with_grads(
        kappa, omega, model.u, model.d_max, kappa_fixed=model.kappa_fixed
    )
    gk = haz["grad_kappa_log_rho"]
    if gk is None:
        gk = jnp.zeros_like(haz["grad_omega_log_rho"])
    return ThetaTables(
        P=P,
        log_P=log_P,
        omega=omega,
        kappa=kappa,
        rho=haz["rho"],
        exit_status=haz["exit_status"],
        grad_omega_log_rho=haz["grad_omega_log_rho"],
        grad_kappa_log_rho=gk,
    )


def parameters_to_theta(P, omega, kappa=None, kappa_fixed=True):
    """(P, omega, kappa) -> theta (convert_model_parameters_to_theta,
    model_functions.R:65-78): log of off-diagonal P entries (row-major),
    logit(omega), and log(kappa) when estimated."""
    P = np.asarray(P, np.float64)
    R = P.shape[0]
    offdiag = np.array(
        [np.log(P[r, c]) for r in range(R) for c in range(R) if c != r]
    )
    theta = np.concatenate([offdiag, np.asarray(logit(jnp.asarray(omega)))])
    if not kappa_fixed:
        theta = np.concatenate([theta, np.log(np.asarray(kappa))])
    return theta


def theta_to_parameters(theta, n_regimes, kappa_fixed=True):
    """theta -> dict(p, p_non_diag, omega[, kappa])
    (convert_theta_to_model_parameters, model_functions.R:81-111)."""
    R = n_regimes
    theta = np.asarray(theta, np.float64)
    P = np.asarray(row_softmax_offdiag(jnp.asarray(theta[: R * (R - 1)]), R))
    p_non_diag = np.array(
        [P[r, c] for r in range(R) for c in range(R) if c != r]
    )
    out = {
        "p": P,
        "p_non_diag": p_non_diag,
        "omega": np.asarray(inv_logit(jnp.asarray(theta[R * (R - 1) : R * R]))),
    }
    if not kappa_fixed:
        out["kappa"] = np.exp(theta[R * R : R * (R + 1)])
    return out


def continuation_log_density(tables: ThetaTables, d_prev, r_prev):
    """log f((d_prev+1, r_prev) | (d_prev, r_prev)) = log(1 - rho), -inf on
    the exit latch or when rho numerically exceeds 1
    (evaluateLogTransitionDensity, singleGroup.h:597-605)."""
    d_idx = jnp.clip(d_prev - 1, 0, tables.rho.shape[1] - 1)
    rho = tables.rho[r_prev, d_idx]
    exit_s = tables.exit_status[r_prev, d_idx]
    return jnp.where(exit_s | (rho > 1.0), _NEG_INF, jnp.log1p(-rho))


def change_point_log_density(tables: ThetaTables, u, r_new, d_prev, r_prev):
    """log f((1, r_new) | (d_prev, r_prev)) for r_new != r_prev, d_prev >= u:
    log rho + log P[r_prev, r_new]; the log rho term is dropped on the exit
    latch (singleGroup.h:584-596). Shapes broadcast."""
    d_idx = jnp.clip(d_prev - 1, 0, tables.rho.shape[1] - 1)
    rho = tables.rho[r_prev, d_idx]
    exit_s = tables.exit_status[r_prev, d_idx]
    log_rho_term = jnp.where(exit_s, 0.0, jnp.log(rho))
    valid = (r_new != r_prev) & (d_prev >= u)
    return jnp.where(valid, log_rho_term + tables.log_P[r_prev, r_new], _NEG_INF)
