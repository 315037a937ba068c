"""The `simulate_two_groups` verb: generative simulation + optional
self-test inference (the reference's de-facto integration test,
simulate_two_groups.py + SURVEY.md section 4).

REGIME_CONFIGS reproduces the reference's 10 fixed (mu, sigma) scenario
presets (simulate_two_groups.py:122-192; config 10 is the 5-regime one)."""

from __future__ import annotations

import numpy as _np

REGIME_CONFIGS = {
    1: ([0.95, 0.05, 0.85, 0.15, 0.50, 0.50],
        [0.10, 0.10, 0.08, 0.08, 0.15, 1 / _np.sqrt(12)]),
    2: ([0.95, 0.05, 0.85, 0.15, 0.50, 0.50],
        [0.10, 0.10, 0.04, 0.04, 0.15, 1 / _np.sqrt(12)]),
    3: ([0.95, 0.05, 0.85, 0.15, 0.50, 0.50],
        [0.15, 0.15, 0.08, 0.08, 0.15, 1 / _np.sqrt(12)]),
    4: ([0.95, 0.05, 0.85, 0.15, 0.50, 0.50],
        [0.15, 0.15, 0.04, 0.04, 0.15, 1 / _np.sqrt(12)]),
    5: ([0.99, 0.01, 0.80, 0.20, 0.50, 0.50],
        [0.05, 0.05, 0.05, 0.05, 0.10, 1 / _np.sqrt(6)]),
    6: ([0.99, 0.01, 0.80, 0.20, 0.50, 0.50],
        [0.05, 0.05, 0.10, 0.10, 0.10, 1 / _np.sqrt(6)]),
    7: ([0.95, 0.05, 0.85, 0.15, 0.50, 0.50],
        [0.05, 0.05, 0.05, 0.05, 0.05, 1 / _np.sqrt(12)]),
    8: ([0.95, 0.05, 0.80, 0.20, 0.50, 0.50],
        [0.05, 0.05, 0.10, 0.10, 0.10, 1 / _np.sqrt(12)]),
    9: ([0.95, 0.05, 0.75, 0.25, 0.50, 0.50],
        [0.10, 0.10, 0.10, 0.10, 0.10, 1 / _np.sqrt(12)]),
    10: ([0.95, 0.05, 0.80, 0.20, 0.50],
         [0.05, 0.05, 0.10, 0.10, 0.10]),
}

import os

import numpy as np
import jax
import jax.numpy as jnp

from hygeia_tpu.utils.io import savez_fast
from hygeia_tpu.ops.distributions import logit
from hygeia_tpu.ops.emissions import emission_log_prob_table
from hygeia_tpu.two_group.model import make_params
from hygeia_tpu.two_group.simulate import simulate
from hygeia_tpu.two_group.filter import run_filter
from hygeia_tpu.two_group.backward import backward_simulation, smoothing_functionals


def simulate_two_groups(args):
    os.makedirs(args.results_dir, exist_ok=True)
    mu, sigma = args.mu, args.sigma
    cfg = getattr(args, "regimes_config", None)
    if cfg:
        mu, sigma = REGIME_CONFIGS[cfg]
    R = len(mu)
    rng = np.random.default_rng(args.seed)

    # Random row-normalised off-diagonal transition matrix (the reference
    # randomises model parameters for its self-test, simulate_two_groups.py:196-234).
    logits = rng.normal(size=(R, R))
    np.fill_diagonal(logits, -np.inf)
    with np.errstate(over="ignore"):
        p = np.exp(logits - np.nanmax(np.where(np.isfinite(logits), logits, np.nan)))
    p = np.where(np.isfinite(logits), p, 0.0)
    p = p / p.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore"):
        log_p = np.log(p)

    params = make_params(
        mu=mu,
        sigma=sigma,
        p_softmax_control=log_p,
        omega_logit_control=np.asarray(logit(jnp.full((R,), args.omega_control))),
        omega_case=args.omega_case,
        kappa_control=np.full(R, 2.0),
        kappa_case=np.full(R, 2.0),
        merge_log_prob=args.merge_log_prob,
        split_prob=args.split_prob,
        minimum_duration=args.minimum_duration,
        d_max=max(64, args.n_observations + 1),
    )

    T, S = args.n_observations, args.n_samples
    # Poisson reads with optional missing-data mask (simulate_two_groups.py:250-256).
    n_c = rng.poisson(args.lambda_reads, size=(T, S)).astype(np.float64)
    n_k = rng.poisson(args.lambda_reads, size=(T, S)).astype(np.float64)
    if args.missing_prob > 0:
        n_c *= rng.random((T, S)) > args.missing_prob
        n_k *= rng.random((T, S)) > args.missing_prob

    sim = simulate(jax.random.PRNGKey(args.seed), params, n_c, n_k)
    states = np.asarray(sim.states)

    savez_fast(
        os.path.join(args.results_dir, "true_merged_states"), states[:, 0]
    )
    savez_fast(
        os.path.join(args.results_dir, "true_control_states"), states[:, 1:3]
    )
    savez_fast(
        os.path.join(args.results_dir, "true_case_states"), states[:, 3:5]
    )
    np.savetxt(
        os.path.join(args.results_dir, "observations_control.csv.gz"),
        np.asarray(sim.obs_control), delimiter=",", fmt="%s",
    )
    np.savetxt(
        os.path.join(args.results_dir, "observations_case.csv.gz"),
        np.asarray(sim.obs_case), delimiter=",", fmt="%s",
    )
    np.savetxt(
        os.path.join(args.results_dir, "n_total_reads_control.csv.gz"),
        n_c, delimiter=",", fmt="%s",
    )
    np.savetxt(
        os.path.join(args.results_dir, "n_total_reads_case.csv.gz"),
        n_k, delimiter=",", fmt="%s",
    )
    print(f"Simulated {T} sites; split fraction {float(np.mean(states[:, 0] == 0)):.3f}")

    if args.run_inference:
        M = args.num_resampled_particles
        N = M * (2 * R + R * R)
        E_c = emission_log_prob_table(sim.obs_control, n_c, params.alpha, params.beta)
        E_k = emission_log_prob_table(sim.obs_case, n_k, params.alpha, params.beta)

        @jax.jit
        def run(key):
            res = run_filter(key, params, E_c, E_k, M)
            traj = backward_simulation(
                jax.random.fold_in(key, 1),
                params,
                res.log_weights,
                res.particles,
                args.num_samples_backward,
            )
            return res.log_normalizing_constant, traj

        log_z, traj = run(jax.random.PRNGKey(args.seed))
        traj = np.asarray(traj)
        split, regime = smoothing_functionals(traj, R)
        savez_fast(
            os.path.join(args.results_dir, f"optimal_backward_particles_merged_state_{N}_{args.seed}"),
            traj[:, :, 0].astype(np.int16),
        )
        savez_fast(
            os.path.join(args.results_dir, f"optimal_backward_particles_control_state_{N}_{args.seed}"),
            traj[:, :, 1:3].astype(np.int32),
        )
        savez_fast(
            os.path.join(args.results_dir, f"optimal_backward_particles_case_state_{N}_{args.seed}"),
            traj[:, :, 3:5].astype(np.int32),
        )
        savez_fast(
            os.path.join(args.results_dir, f"optimal_split_probs_{N}_{args.seed}"),
            np.asarray(split),
        )
        savez_fast(
            os.path.join(args.results_dir, f"optimal_regime_probs_{N}_{args.seed}"),
            np.asarray(regime),
        )
        acc = float(
            np.mean(
                np.asarray(regime)[:, :R].argmax(-1) == states[:, 2]
            )
        )
        print(
            f"self-test: logZ={float(log_z):.2f}, control-regime recovery {acc:.3f}"
        )
