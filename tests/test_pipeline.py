"""End-to-end pipeline test: the minimum slice from SURVEY.md section 7 —
simulated two-group data through infer (2 batches x 2 seeds), aggregate and
get_dmps, exercising every layer via the CLI entry point."""

import gzip
import os

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


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    """Simulate a small 'chromosome' and write reference-format inputs."""
    root = tmp_path_factory.mktemp("pipe")
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
    theta = parameters_to_theta(Pfull, omega)
    hio.write_theta(sg_dir / "theta_t.csv.gz", theta)

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
    T, S = 260, 2
    n_c = rng.poisson(30, size=(T, S)).astype(np.float64)
    n_k = rng.poisson(30, size=(T, S)).astype(np.float64)
    sim = simulate(jax.random.PRNGKey(3), params, n_c, n_k)

    hio.write_count_matrix(data_dir / "positions_t.txt.gz", np.arange(1, T + 1) * 50)
    hio.write_count_matrix(data_dir / "n_total_reads_control_t.txt.gz", n_c)
    hio.write_count_matrix(data_dir / "n_total_reads_case_t.txt.gz", n_k)
    hio.write_count_matrix(
        data_dir / "n_methylated_reads_control_t.txt.gz", np.asarray(sim.obs_control)
    )
    hio.write_count_matrix(
        data_dir / "n_methylated_reads_case_t.txt.gz", np.asarray(sim.obs_case)
    )
    return root, data_dir, sg_dir, np.asarray(sim.states)


@pytest.mark.slow
def test_full_pipeline(pipeline_dirs):
    root, data_dir, sg_dir, true_states = pipeline_dirs
    results = root / "results"
    T = true_states.shape[0]
    seg, buf, M, B = 150, 30, 12, 40
    N = M * (2 * R + R * R)

    # ---- segments ---------------------------------------------------------
    seg_csv = root / "segments.csv"
    cli_main(
        [
            "get_chrom_segments",
            "--input_file", str(data_dir / "positions_t.txt.gz"),
            "--chromosome", "t",
            "--segment_size", str(seg),
            "--output_csv", str(seg_csv),
        ]
    )
    segs = pd.read_csv(seg_csv)
    assert len(segs) == 1 + T // seg == 2

    # ---- infer: 2 batches x 2 seeds --------------------------------------
    for batch in range(2):
        for seed in range(2):
            cli_main(
                [
                    "infer",
                    "--data_dir", str(data_dir),
                    "--single_group_dir", str(sg_dir),
                    "--results_dir", str(results),
                    "--chrom", "t",
                    "--batch", str(batch),
                    "--seed", str(seed),
                    "--segment_size", str(seg),
                    "--buffer_size", str(buf),
                    "--num_resampled_particles", str(M),
                    "--num_samples_backward", str(B),
                ]
            )
    for batch in range(2):
        d = results / f"chrom_t_{batch}"
        assert (d / "positions.csv.gz").exists()
        for seed in range(2):
            assert (
                d / f"optimal_backward_particles_merged_state_{N}_{seed}.npz"
            ).exists()
    # Halo trimming: batch 0 returns seg sites, batch 1 the remaining T-seg.
    p0 = hio.read_positions(results / "chrom_t_0" / "positions.csv.gz")
    p1 = hio.read_positions(results / "chrom_t_1" / "positions.csv.gz")
    assert len(p0) == seg and len(p1) == T - seg
    assert p0[-1] < p1[0]
    # Per-run artifacts: serialized flags (run_inference_two_groups.py:96-108)
    # and timing files (:286-296). Filter + backward run FUSED in one device
    # program (PARITY.md): optimal_time holds the fused per-seed wall,
    # optimal_time_backward records 0.0 for the phase boundary that no
    # longer exists.
    d0 = results / "chrom_t_0"
    assert f"--seed=0" in (d0 / "flags0.txt").read_text()
    tb = eval((d0 / "optimal_time_backward_0.txt").read_text())
    tf_ = eval((d0 / "optimal_time_0.txt").read_text())
    assert tb and all(v == 0.0 for v in tb.values()), tb
    assert tf_ and all(v > 0 for v in tf_.values()), tf_

    # ---- aggregate --------------------------------------------------------
    agg = root / "agg"
    cli_main(
        [
            "aggregate",
            "--results_dir", str(results),
            "--output_dir", str(agg),
            "--seeds", "2",
            "--chrom", "t",
            "--num_batches", "5",
            "--num_particles", str(N),
        ]
    )
    ctrl = pd.read_csv(agg / "control_regimes_chrom_t.csv.gz", sep="\t").set_index("pos")
    assert ctrl.shape == (T, 2 * B)  # seeds concatenated on the particle axis
    split = pd.read_csv(agg / "split_probs_t.csv.gz", sep="\t").set_index("pos")
    assert len(split) == T

    # Posterior-mode control regimes should recover the simulated truth.
    acc = np.mean(ctrl.to_numpy().astype(int).mean(axis=1).round() >= 0)  # sanity
    mode = np.apply_along_axis(
        lambda row: np.bincount(row, minlength=R).argmax(), 1, ctrl.to_numpy().astype(int)
    )
    recovery = np.mean(mode == true_states[:, 2])
    assert recovery > 0.75, recovery

    # ---- get_dmps ---------------------------------------------------------
    dmp_dir = root / "dmp"
    cli_main(
        [
            "get_dmps",
            "--results_dir", str(agg),
            "--output_dir", str(dmp_dir),
            "--chrom", "t",
            "--n_regimes", str(R),
        ]
    )
    for thr in (0.01, 0.05):
        f = dmp_dir / f"dmp_{thr}.csv"
        assert f.exists()
        df = pd.read_csv(f)
        expected_cols = {"chrom", "position", "null_stats", "false_negative_weight"}
        assert expected_cols.issubset(df.columns)
        assert {f"Control_METEOR_{i+1}" for i in range(R)}.issubset(df.columns)
        assert (dmp_dir / f"weighted_dmp_{thr}.csv").exists()

    # DMP calls should be enriched at truly-split sites.
    dmp = pd.read_csv(dmp_dir / "dmp_0.05.csv")
    if len(dmp):
        pos = hio.read_positions(data_dir / "positions_t.txt.gz")
        true_split = dict(zip(pos, true_states[:, 0] == 0))
        frac_true = np.mean([true_split[p] for p in dmp["position"]])
        assert frac_true > 0.5, frac_true


def test_infer_marginal_cli(pipeline_dirs):
    """`infer --marginal`: the adaptive-lag constant-memory path writes the
    split/regime probability outputs from smoothing functionals (no backward
    particle archives) with the same names/shapes as the trajectory path."""
    root, data_dir, sg_dir, true_states = pipeline_dirs
    results = root / "results_marginal"
    seg, buf, M = 150, 30, 12
    N = M * (2 * R + R * R)
    cli_main(
        [
            "infer", "--marginal",
            "--data_dir", str(data_dir),
            "--single_group_dir", str(sg_dir),
            "--results_dir", str(results),
            "--chrom", "t",
            "--batch", "0",
            "--seed", "0",
            "--segment_size", str(seg),
            "--buffer_size", str(buf),
            "--num_resampled_particles", str(M),
            "--marginal_window", "48",
        ]
    )
    d = results / "chrom_t_0"
    split = np.load(d / f"optimal_split_probs_{N}_0.npz")["arr_0"]
    regime = np.load(d / f"optimal_regime_probs_{N}_0.npz")["arr_0"]
    assert split.shape == (seg,) and regime.shape == (seg, 2 * R)
    assert np.all(split >= 0) and np.all(split <= 1.01)
    # Control-regime marginals sum to ~1 per site (rows finalised by the
    # all-R epsilon rule are exact sums; forced spills stay normalised too).
    np.testing.assert_allclose(regime[:, :R].sum(axis=1), 1.0, atol=1e-3)
    # Functional agreement with the simulated truth: split probability must
    # be higher at truly-split sites than merged ones on average.
    truth_split = true_states[:seg, 0] == 0
    if truth_split.any() and (~truth_split).any():
        assert split[truth_split].mean() > split[~truth_split].mean()
    # No trajectory archives in marginal mode.
    assert not (d / f"optimal_backward_particles_merged_state_{N}_0.npz").exists()
    assert "--marginal=True" in (d / "flags0.txt").read_text()


def test_make_bed_file(tmp_path):
    regimes = pd.DataFrame(
        {
            "genomic_position": [100, 200, 300],
            "regime_1": [0.9, 0.2, 0.5],
            "regime_2": [0.1, 0.8, 0.5],
        }
    )
    rf = tmp_path / "regimes.csv"
    regimes.to_csv(rf, index=False)
    out = tmp_path / "out.bed"
    cli_main(["make_bed_file", "--chr", "21", "--regimes_file", str(rf), "--output_file", str(out)])
    bed = pd.read_csv(out, sep="\t", header=None)
    assert bed.shape == (3, 9)
    assert list(bed[1]) == [99, 199, 299]
    assert bed[3][0] == "regime_1"
    assert bed[3][2] == "equiprobable"
    assert bed[8][2] == "128,128,128"


def test_single_group_cli_roundtrip(tmp_path):
    """simulate_data -> estimate_parameters_and_regimes via the CLI."""
    sim_dir = tmp_path / "sim"
    sim_dir.mkdir()
    cli_main(
        [
            "simulate_data",
            "--n_cpg_sites", "400",
            "--n_samples", "2",
            "--u", "2",
            "--rng_seed", "1",
            "--regimes_csv_file", str(sim_dir / "regimes.csv"),
            "--n_methylated_reads_csv_file", str(sim_dir / "meth.csv"),
            "--genomic_positions_csv_file", str(sim_dir / "pos.csv"),
            "--n_total_reads_csv_file", str(sim_dir / "total.csv"),
        ]
    )
    out = tmp_path / "out"
    cli_main(
        [
            "estimate_parameters_and_regimes",
            "--n_methylated_reads_csv_file", str(sim_dir / "meth.csv"),
            "--genomic_positions_csv_file", str(sim_dir / "pos.csv"),
            "--n_total_reads_csv_file", str(sim_dir / "total.csv"),
            "--estimate_regime_probabilities",
            "--u", "2",
            "--n_particles", "60",
            "--regime_probabilities_csv_file", str(out / "regimes_probs.csv"),
        ]
    )
    probs = pd.read_csv(out / "regimes_probs.csv")
    assert probs.shape == (400, 7)
    true_regimes = pd.read_csv(sim_dir / "regimes.csv")["regime"].to_numpy()
    est = probs[[f"regime_{i+1}" for i in range(6)]].to_numpy().argmax(1)
    acc = np.mean(est == true_regimes)
    assert acc > 0.7, acc


def test_aggregate_skips_zero_site_batch(tmp_path):
    """The reference's n_batches = 1 + n // S convention creates an EMPTY
    trailing batch whenever the chromosome length is an exact multiple of
    segment_size (get_chrom_segments.py); its per-unit input files are empty.
    aggregate must treat it as zero rows, not crash with EmptyDataError —
    and must also skip (skip_missing=True) a unit that died mid-compute,
    leaving input CSVs but no archives (ADVICE r2)."""
    import numpy as np

    from hygeia_tpu.pipeline.aggregate import aggregate_chromosome
    from hygeia_tpu.utils import io as hio

    res = tmp_path / "res"
    N, B, T0 = 12, 4, 7
    rng = np.random.default_rng(0)

    # batch 0: complete tiny unit
    d0 = res / "chrom_cZ_0"
    d0.mkdir(parents=True)
    hio.write_count_matrix(d0 / "positions.csv.gz", np.arange(1, T0 + 1) * 5)
    for name in (
        "observations_control.csv.gz",
        "observations_case.csv.gz",
        "n_total_reads_control.csv.gz",
        "n_total_reads_case.csv.gz",
    ):
        hio.write_count_matrix(d0 / name, rng.integers(0, 9, (T0, 2)))
    np.savez_compressed(
        d0 / f"optimal_backward_particles_merged_state_{N}_0",
        rng.integers(0, 2, (T0, N)).astype(np.int16),
    )
    np.savez_compressed(
        d0 / f"optimal_backward_particles_control_state_{N}_0",
        rng.integers(0, 6, (T0, N, 2)).astype(np.int32),
    )
    np.savez_compressed(
        d0 / f"optimal_backward_particles_case_state_{N}_0",
        rng.integers(0, 6, (T0, N, 2)).astype(np.int32),
    )

    # batch 1: zero-site batch (empty files, like a T % S == 0 tail)
    d1 = res / "chrom_cZ_1"
    d1.mkdir()
    for name in (
        "positions.csv.gz",
        "observations_control.csv.gz",
        "observations_case.csv.gz",
        "n_total_reads_control.csv.gz",
        "n_total_reads_case.csv.gz",
    ):
        hio.write_count_matrix(d1 / name, np.zeros((0,)))

    # batch 2: died mid-compute — input CSVs present, archives missing
    d2 = res / "chrom_cZ_2"
    d2.mkdir()
    hio.write_count_matrix(d2 / "positions.csv.gz", np.arange(1, 4) * 1000)
    for name in (
        "observations_control.csv.gz",
        "observations_case.csv.gz",
        "n_total_reads_control.csv.gz",
        "n_total_reads_case.csv.gz",
    ):
        hio.write_count_matrix(d2 / name, rng.integers(0, 9, (3, 2)))

    out = tmp_path / "agg"
    n = aggregate_chromosome(
        str(res), str(out), "cZ", seeds=1, num_particles=N,
        num_batches=3, skip_missing=True,
    )
    assert n == 1
    import pandas as pd

    split = pd.read_csv(out / "split_probs_cZ.csv.gz", sep="\t", index_col=0)
    assert len(split) == T0

    # skip_missing=False: the zero-site batch is still skipped (it is not a
    # missing batch), and the mid-compute corpse then raises like the
    # reference's np.load would.
    import pytest

    with pytest.raises(FileNotFoundError):
        aggregate_chromosome(
            str(res), str(tmp_path / "agg2"), "cZ", seeds=1,
            num_particles=N, num_batches=3, skip_missing=False,
        )
