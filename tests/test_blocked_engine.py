"""Within-chromosome blocked theta stage (single_group/blocked.py): parity
against the sequential chain — halo-blocked regime probabilities, warm-start
theta recovery, and the single-block degenerate case."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hygeia_tpu.ops.emissions import emission_log_prob_table
from hygeia_tpu.single_group.model import make_model, parameters_to_theta
from hygeia_tpu.single_group.engine import (
    EngineConfig,
    run_online_combined_inference,
)
from hygeia_tpu.single_group.blocked import run_online_combined_inference_blocked
from hygeia_tpu.single_group.simulate import simulate


def _sim_setup(R=3, T=600, seed=2, coverage=30.0):
    mu = np.array([0.1, 0.5, 0.9])[:R]
    sigma = np.full(R, 0.08)
    kappa = np.full(R, 2.0)
    model = make_model(mu, sigma, 2, kappa, d_max=512)
    P_true = np.array([[0.0, 0.7, 0.3], [0.5, 0.0, 0.5], [0.2, 0.8, 0.0]])[:R, :R]
    omega_true = np.array([0.9, 0.8, 0.85])[:R]
    theta_true = parameters_to_theta(P_true, omega_true)
    n_tot = np.full((T, 2), coverage)
    sim = simulate(jax.random.PRNGKey(seed), model, theta_true, n_tot)
    E = emission_log_prob_table(sim.n_methylated, n_tot, model.alpha, model.beta)
    return model, theta_true, np.asarray(E), np.asarray(sim.r)


def test_blocked_single_block_equals_sequential():
    """T below one block: the blocked entry point degenerates to the plain
    sequential program."""
    model, theta, E, _ = _sim_setup(T=80)
    cfg = EngineConfig(n_particles_max=40, estimate_parameters=False)
    key = jax.random.PRNGKey(0)
    seq = run_online_combined_inference(key, model, jnp.asarray(theta), jnp.asarray(E), cfg)
    blk = run_online_combined_inference_blocked(
        key, model, theta, E, cfg, block_size=128, halo=16
    )
    np.testing.assert_allclose(
        np.asarray(blk.regime_probs), np.asarray(seq.regime_probs), atol=1e-5
    )
    np.testing.assert_allclose(
        float(blk.log_normalizing_constant),
        float(seq.log_normalizing_constant),
        rtol=1e-6,
    )


def test_blocked_regimes_match_sequential_within_halo_error():
    """Fixed theta (module-3 semantics): halo-blocked smoothing estimates
    must agree with the sequential chain up to Monte-Carlo + halo error —
    posterior modes near-identical, probabilities close on average."""
    model, theta, E, true_r = _sim_setup(T=600)
    cfg = EngineConfig(n_particles_max=100, estimate_parameters=False)
    key = jax.random.PRNGKey(1)
    seq = run_online_combined_inference(
        key, model, jnp.asarray(theta), jnp.asarray(E), cfg
    )
    blk = run_online_combined_inference_blocked(
        key, model, theta, E, cfg, block_size=200, halo=100
    )
    p_seq = np.asarray(seq.regime_probs)
    p_blk = np.asarray(blk.regime_probs)
    assert p_blk.shape == p_seq.shape
    np.testing.assert_allclose(p_blk.sum(axis=1), 1.0, atol=1e-5)
    mode_agree = (p_blk.argmax(1) == p_seq.argmax(1)).mean()
    assert mode_agree > 0.95, mode_agree
    mean_abs = np.abs(p_blk - p_seq).mean()
    assert mean_abs < 0.05, mean_abs
    # Both recover the simulated truth equally well.
    acc_seq = (p_seq.argmax(1) == true_r).mean()
    acc_blk = (p_blk.argmax(1) == true_r).mean()
    assert acc_blk > acc_seq - 0.03, (acc_seq, acc_blk)


def test_blocked_theta_recovery_comparable_to_sequential():
    """Parameter estimation: warmup chain + per-block continued ADAM chains,
    block-final thetas averaged — the estimate must improve on the init like
    the sequential chain does (same harness as
    test_parameter_estimation_moves_toward_truth)."""
    R, T = 3, 4000
    rng = np.random.default_rng(4)
    model, theta_true, _, _ = _sim_setup(T=8)
    n_tot = np.full((T, 2), 30.0)
    sim = simulate(jax.random.PRNGKey(5), model, theta_true, n_tot)
    E = np.asarray(
        emission_log_prob_table(sim.n_methylated, n_tot, model.alpha, model.beta)
    )
    theta_init = theta_true + rng.normal(scale=1.5, size=len(theta_true))
    cfg = EngineConfig(
        n_particles_max=60,
        estimate_regimes=False,
        estimate_parameters=True,
        steps_per_update=50,
        learning_rate_factor=0.3,
        learning_rate_exponent=0.1,
    )
    blk = run_online_combined_inference_blocked(
        jax.random.PRNGKey(6), model, theta_init, E, cfg,
        block_size=1000, halo=200, warmup_sites=1000,
    )
    trace = np.asarray(blk.theta_trace)
    assert np.isfinite(trace).all()
    om_idx = slice(R * (R - 1), R * R)
    err_init = np.abs(theta_init[om_idx] - theta_true[om_idx]).mean()
    err_final = np.abs(trace[-1][om_idx] - theta_true[om_idx]).mean()
    assert err_final < err_init, (err_init, err_final)
    # The final row IS the averaged final theta.
    np.testing.assert_array_equal(trace[-1], np.asarray(blk.final_theta))


def test_blocked_multi_matches_per_chromosome():
    """Several chromosomes' blocks ride ONE vmapped program with per-unit
    theta lanes; each chromosome's outputs must match its single-chromosome
    blocked run (same keys by construction; values to f32 reduction ulp)."""
    from hygeia_tpu.single_group.blocked import (
        run_online_combined_inference_blocked_multi,
    )

    model, theta_true, E1, _ = _sim_setup(T=620, seed=2)
    _, _, E2, _ = _sim_setup(T=500, seed=6)
    rng = np.random.default_rng(4)
    theta_init = theta_true + rng.normal(scale=0.8, size=len(theta_true))
    cfg = EngineConfig(
        n_particles_max=50,
        estimate_regimes=True,
        estimate_parameters=True,
        steps_per_update=50,
        learning_rate_factor=0.2,
    )
    key = jax.random.PRNGKey(3)
    kw = dict(block_size=200, halo=64, warmup_sites=200)
    singles = [
        run_online_combined_inference_blocked(
            key, model, theta_init, E, cfg, **kw
        )
        for E in (E1, E2)
    ]
    multi = run_online_combined_inference_blocked_multi(
        key, model, [theta_init, theta_init], [E1, E2], cfg, **kw
    )
    for c in range(2):
        np.testing.assert_allclose(
            np.asarray(multi[c].final_theta),
            np.asarray(singles[c].final_theta),
            rtol=2e-4, atol=1e-4, err_msg=f"chrom {c}",
        )
        p_m = np.asarray(multi[c].regime_probs)
        p_s = np.asarray(singles[c].regime_probs)
        agree = (p_m.argmax(1) == p_s.argmax(1)).mean()
        assert agree > 0.97, (c, agree)
        assert np.abs(p_m - p_s).mean() < 0.02, c


def test_blocked_combined_pipeline_stage(tmp_path):
    """_single_group_on_counts with the blocked threshold lowered writes the
    same file set with consistent shapes, and its theta feeds downstream."""
    import pandas as pd

    from hygeia_tpu.pipeline.orchestrator import _single_group_on_counts
    from hygeia_tpu.utils import io as hio

    model, theta_true, _, _ = _sim_setup(T=8)
    T = 500
    n_tot = np.full((T, 1), 25.0)
    sim = simulate(jax.random.PRNGKey(7), model, theta_true, n_tot)
    pre = tmp_path / "pre"
    pre.mkdir()
    hio.write_count_matrix(pre / "positions_cx.txt.gz", np.arange(1, T + 1) * 7)
    hio.write_count_matrix(pre / "n_total_reads_control_cx.txt.gz", n_tot)
    hio.write_count_matrix(
        pre / "n_methylated_reads_control_cx.txt.gz", np.asarray(sim.n_methylated)
    )
    sg = tmp_path / "sg"
    sg.mkdir()
    _single_group_on_counts(
        pre, sg, "cx", group="control",
        mu=(0.1, 0.5, 0.9), sigma=(0.08, 0.08, 0.08), u=2,
        n_particles=40, epsilon=0.01, steps_per_update=50,
        learning_rate_exponent=0.1, learning_rate_factor=0.1, rng_seed=0,
        theta_block_size=200, theta_halo=64, theta_block_threshold=300,
    )
    probs = pd.read_csv(sg / "regime_probabilities_cx.csv.gz")
    assert len(probs) == T
    np.testing.assert_allclose(
        probs.iloc[:, 1:].to_numpy(float).sum(axis=1), 1.0, atol=1e-4
    )
    theta = hio.read_theta(sg / "theta_cx.csv.gz")
    assert np.isfinite(theta).all() and len(theta) == model.dim_theta
