from hygeia_tpu.ops.distributions import (
    beta_binomial_log_pmf,
    beta_binomial_log_pmf_grads,
    neg_binomial_log_pmf,
    mu_sigma_to_alpha_beta,
    logit,
    inv_logit,
)
from hygeia_tpu.ops.hazard import (
    hazard_table,
    hazard_table_with_grads,
    rho_two_group,
)
from hygeia_tpu.ops.resampling import (
    systematic_resampling,
    optimal_finite_state_resampling,
)

__all__ = [
    "beta_binomial_log_pmf",
    "beta_binomial_log_pmf_grads",
    "neg_binomial_log_pmf",
    "mu_sigma_to_alpha_beta",
    "logit",
    "inv_logit",
    "hazard_table",
    "hazard_table_with_grads",
    "rho_two_group",
    "systematic_resampling",
    "optimal_finite_state_resampling",
]
