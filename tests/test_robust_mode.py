"""End-to-end robust-mode test (VERDICT round 2 "weak" #6): simulate
two-group data, contaminate single samples with extreme outliers, run
`infer --robust` through the real CLI, and assert (a) the robust run writes
the same file set as the standard run, (b) regime recovery beats the
standard filter on the contaminated data — the feature's whole point
(case_control_robust_regime_model.py:202-238; beta-divergence default
beta = 0.05 per :62).

The contamination model matches what the beta-divergence score protects
against: ONE sample per contaminated site flipped to the opposite extreme
(full/zero methylation). Under the standard BetaBinomial log-pmf that single
outlier contributes an unbounded negative term to the TRUE regime's score
and drags the posterior to the wrong regime; the robust score's influence
function is bounded, so the clean samples plus the duration prior keep the
true regime (calibrated separation here: ~0.82 vs ~0.39 mode accuracy at
contaminated sites, ~0.96 vs ~0.79 overall).
"""

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp

from hygeia_tpu.cli import main as cli_main
from hygeia_tpu.ops.distributions import logit
from hygeia_tpu.single_group.model import parameters_to_theta
from hygeia_tpu.two_group.model import make_params
from hygeia_tpu.two_group.simulate import simulate
from hygeia_tpu.utils import io as hio

R = 6
MU = [0.95, 0.05, 0.80, 0.20, 0.50, 0.50]
SIGMA = [0.05, 0.05, 0.1, 0.1, 0.1, 0.2886751]
T, S = 200, 4
SEG, BUF, M, B = 200, 0, 12, 40
N = M * (2 * R + R * R)


@pytest.fixture(scope="module")
def contaminated_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("robust")
    data_dir = root / "data"
    sg_dir = root / "single_group"
    data_dir.mkdir()
    sg_dir.mkdir()

    rng = np.random.default_rng(0)
    P = rng.dirichlet(np.ones(R - 1), size=R)
    Pfull = np.zeros((R, R))
    for r in range(R):
        Pfull[r, [c for c in range(R) if c != r]] = P[r]
    omega = np.full(R, 0.9)
    hio.write_theta(sg_dir / "theta_t.csv.gz", parameters_to_theta(Pfull, omega))

    with np.errstate(divide="ignore"):
        log_p = np.log(Pfull)
    params = make_params(
        mu=MU,
        sigma=SIGMA,
        p_softmax_control=log_p,
        omega_logit_control=np.asarray(logit(jnp.asarray(omega))),
        omega_case=0.8,
        kappa_control=np.full(R, 2.0),
        kappa_case=np.full(R, 2.0),
        merge_log_prob=np.log(0.1),
        split_prob=0.01,
        minimum_duration=3,
        d_max=512,
        dtype=jnp.float64,
    )
    n_c = rng.poisson(30, size=(T, S)).astype(np.float64)
    n_k = rng.poisson(30, size=(T, S)).astype(np.float64)
    sim = simulate(jax.random.PRNGKey(3), params, n_c, n_k)
    y_c = np.asarray(sim.obs_control).copy()
    y_k = np.asarray(sim.obs_case).copy()

    # Contaminate ~15% of sites: one control sample flipped to the extreme.
    mask = rng.random(T) < 0.15
    for t in np.where(mask)[0]:
        j = rng.integers(S)
        y_c[t, j] = 0.0 if (y_c[t, j] / n_c[t, j]) > 0.5 else n_c[t, j]

    hio.write_count_matrix(data_dir / "positions_t.txt.gz", np.arange(1, T + 1) * 50)
    hio.write_count_matrix(data_dir / "n_total_reads_control_t.txt.gz", n_c)
    hio.write_count_matrix(data_dir / "n_total_reads_case_t.txt.gz", n_k)
    hio.write_count_matrix(data_dir / "n_methylated_reads_control_t.txt.gz", y_c)
    hio.write_count_matrix(data_dir / "n_methylated_reads_case_t.txt.gz", y_k)
    return root, data_dir, sg_dir, np.asarray(sim.states)[:, 2], mask


def _run_infer(root, data_dir, sg_dir, results_name, extra):
    results = root / results_name
    for seed in range(2):
        cli_main(
            [
                "infer",
                "--data_dir", str(data_dir),
                "--single_group_dir", str(sg_dir),
                "--results_dir", str(results),
                "--chrom", "t",
                "--batch", "0",
                "--seed", str(seed),
                "--segment_size", str(SEG),
                "--buffer_size", str(BUF),
                "--num_resampled_particles", str(M),
                "--num_samples_backward", str(B),
                *extra,
            ]
        )
    return results


def _mode_recovery(results, true_ctrl, mask):
    """Posterior-mode control regimes from the regime-marginal archives,
    seed-averaged; returns (overall, contaminated-site) accuracy."""
    probs = np.mean(
        [
            np.load(results / "chrom_t_0" / f"optimal_regime_probs_{N}_{s}.npz")["arr_0"]
            for s in range(2)
        ],
        axis=0,
    )
    mode = probs[:, :R].argmax(axis=1)
    return (mode == true_ctrl).mean(), (mode[mask] == true_ctrl[mask]).mean()


@pytest.mark.slow
def test_robust_meshed_infer(contaminated_dirs):
    """Robust mode on the MESHED path (previously an untested combination —
    the data-dependent support bound of the robust table broke under the
    jitted/vmapped table program, and the per-call closure defeated the
    program cache: both round-5 fixes). Two calls must reuse ONE cached
    program and produce the standard file set."""
    from hygeia_tpu.parallel import sharded
    from hygeia_tpu.two_group.runner import infer_chromosome_meshed

    root, data_dir, sg_dir, true_ctrl, mask = contaminated_dirs
    results = root / "results_robust_meshed"
    kw = dict(
        data_dir=str(data_dir),
        single_group_dir=str(sg_dir),
        results_dir=str(results),
        chrom="t",
        mesh_shape=(2, 1),
        seed=[0],
        segment_size=100,
        buffer_size=10,
        mu=MU,
        sigma=SIGMA,
        minimum_duration=3,
        num_resampled_particles=(6,),
        num_samples_backward=8,
        robust=True,
        robust_beta=0.05,
    )
    infer_chromosome_meshed(**kw)
    n_programs = len(sharded._PROGRAMS)
    infer_chromosome_meshed(**kw)  # same robust_beta -> same cached program
    assert len(sharded._PROGRAMS) == n_programs
    n_bwd = 6 * (2 * R + R * R)
    assert (
        results / "chrom_t_0" / f"optimal_regime_probs_{n_bwd}_0.npz"
    ).exists()
    assert (
        results / "chrom_t_1" / f"optimal_regime_probs_{n_bwd}_0.npz"
    ).exists()


@pytest.mark.slow
def test_robust_mode_end_to_end(contaminated_dirs):
    root, data_dir, sg_dir, true_ctrl, mask = contaminated_dirs
    assert 10 <= mask.sum() <= 60

    std = _run_infer(root, data_dir, sg_dir, "results_std", [])
    rob = _run_infer(root, data_dir, sg_dir, "results_robust", ["--robust"])

    # (a) identical file set, and the robust flag is recorded.
    std_files = sorted(p.name for p in (std / "chrom_t_0").iterdir())
    rob_files = sorted(p.name for p in (rob / "chrom_t_0").iterdir())
    assert std_files == rob_files and len(std_files) > 0
    assert "--robust=True" in (rob / "chrom_t_0" / "flags0.txt").read_text()
    assert "--robust=False" in (std / "chrom_t_0" / "flags0.txt").read_text()

    # (b) robustness: the beta-divergence emissions recover the true control
    # regimes better than the standard filter on the contaminated data, by a
    # wide margin at the contaminated sites.
    std_all, std_cont = _mode_recovery(std, true_ctrl, mask)
    rob_all, rob_cont = _mode_recovery(rob, true_ctrl, mask)
    assert rob_cont > std_cont + 0.2, (std_cont, rob_cont)
    assert rob_all > std_all + 0.05, (std_all, rob_all)
    assert rob_all > 0.85, rob_all
