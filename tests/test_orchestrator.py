"""Orchestrator test: the full two-group pipeline (`hygeia run --two_group`)
from preprocessed counts to DMPs in one process, including resume markers."""

import json
import time

import numpy as np
import pytest
import pandas as pd
import jax
import jax.numpy as jnp

from hygeia_tpu.cli import main as cli_main
from hygeia_tpu.ops.distributions import logit
from hygeia_tpu.two_group.model import make_params
from hygeia_tpu.two_group.simulate import simulate
from hygeia_tpu.utils import io as hio

R = 6
MU = [0.95, 0.05, 0.80, 0.20, 0.50, 0.50]
SIGMA = [0.05, 0.05, 0.1, 0.1, 0.1, 0.2886751]


@pytest.mark.slow
def test_run_two_group_pipeline(tmp_path):
    # Simulated preprocessed inputs for one tiny 'chromosome'.
    rng = np.random.default_rng(7)
    Pd = rng.dirichlet(np.ones(R - 1), size=R)
    Pfull = np.zeros((R, R))
    for r in range(R):
        Pfull[r, [c for c in range(R) if c != r]] = Pd[r]
    with np.errstate(divide="ignore"):
        log_p = np.log(Pfull)
    params = make_params(
        mu=MU, sigma=SIGMA, p_softmax_control=log_p,
        omega_logit_control=np.asarray(logit(jnp.full((R,), 0.9))),
        omega_case=0.8, kappa_control=np.full(R, 2.0), kappa_case=np.full(R, 2.0),
        merge_log_prob=np.log(0.1), split_prob=0.01, minimum_duration=3,
        d_max=512, dtype=jnp.float64,
    )
    T, S = 220, 2
    n_c = rng.poisson(30, size=(T, S)).astype(float)
    n_k = rng.poisson(30, size=(T, S)).astype(float)
    sim = simulate(jax.random.PRNGKey(11), params, n_c, n_k)

    pre = tmp_path / "pre"
    pre.mkdir()
    hio.write_count_matrix(pre / "positions_c9.txt.gz", np.arange(1, T + 1) * 41)
    hio.write_count_matrix(pre / "n_total_reads_control_c9.txt.gz", n_c)
    hio.write_count_matrix(pre / "n_total_reads_case_c9.txt.gz", n_k)
    hio.write_count_matrix(
        pre / "n_methylated_reads_control_c9.txt.gz", np.asarray(sim.obs_control)
    )
    hio.write_count_matrix(
        pre / "n_methylated_reads_case_c9.txt.gz", np.asarray(sim.obs_case)
    )

    out = tmp_path / "out"
    argv = [
        "run", "--two_group",
        "--output_dir", str(out),
        "--chroms", "c9",
        "--preprocessed_dir", str(pre),
        "--batch_size", "120",
        "--buffer_size", "25",
        "--num_of_inference_seeds", "2",
        "--num_resampled_particles", "10",
        "--num_samples_backward", "20",
        "--n_particles", "40",
    ]
    t0 = time.time()
    cli_main(argv)
    first_run = time.time() - t0

    # All six stage outputs exist.
    assert (out / "2_ESTIMATE_PARAMETERS_AND_REGIMES" / "c9" / "theta_c9.csv.gz").exists()
    assert (out / "3_GET_CHROM_SEGMENTS" / "c9" / "chrom_segments_c9.csv").exists()
    assert (out / "5_AGGREGATE_RESULTS" / "c9" / "split_probs_c9.csv.gz").exists()
    assert (out / "6_GET_DMPS" / "c9" / "dmp_0.05.csv").exists()

    # The single-group stage actually learned something usable: theta parses.
    theta = hio.read_theta(
        out / "2_ESTIMATE_PARAMETERS_AND_REGIMES" / "c9" / "theta_c9.csv.gz"
    )
    assert theta.shape == (R * R,) and np.isfinite(theta).all()

    # Resume: a second invocation must skip everything (fast, no recompute).
    t0 = time.time()
    cli_main(argv)
    second_run = time.time() - t0
    assert second_run < max(2.0, first_run * 0.2), (first_run, second_run)

    # Aggregated recovery sanity vs simulated truth.
    ctrl = pd.read_csv(
        out / "5_AGGREGATE_RESULTS" / "c9" / "control_regimes_chrom_c9.csv.gz", sep="\t"
    ).set_index("pos").to_numpy()
    truth = np.asarray(sim.states)[:, 2]
    mode = np.apply_along_axis(
        lambda row: np.bincount(row.astype(int), minlength=R).argmax(), 1, ctrl
    )
    acc = np.mean(mode == truth)
    assert acc > 0.5, acc


def test_run_single_group_pipeline(tmp_path):
    """Two-pass single-group path: estimate parameters, then regimes, then BED."""
    from hygeia_tpu.pipeline.orchestrator import run_single_group
    from hygeia_tpu.single_group.model import make_model, parameters_to_theta
    from hygeia_tpu.single_group.simulate import simulate as sg_simulate

    R = 6
    mu = np.array([0.99, 0.01, 0.80, 0.20, 0.50, 0.50])
    sigma = np.array([0.05, 0.05, 0.20, 0.20, 0.20, 0.2886751])
    kappa = np.full(R, 2.0)
    model = make_model(mu, sigma, 2, kappa, d_max=512)
    P = np.full((R, R), 0.2)
    np.fill_diagonal(P, 0.0)
    theta = parameters_to_theta(P, np.full(R, 0.95), kappa)
    T = 600
    n_tot = np.full((T, 2), 30.0)
    sim = sg_simulate(jax.random.PRNGKey(0), model, theta, n_tot)

    pre = tmp_path / "pre"
    pre.mkdir()
    # Our preprocess stage emits the sample's counts as the 'case' group
    # (modules/single_group/1_preprocess.nf:29-35 passes the sample as
    # --case_data_path).
    hio.write_count_matrix(pre / "positions_c1.txt.gz", np.arange(1, T + 1) * 17)
    hio.write_count_matrix(pre / "n_total_reads_case_c1.txt.gz", n_tot)
    hio.write_count_matrix(
        pre / "n_methylated_reads_case_c1.txt.gz", np.asarray(sim.n_methylated)
    )

    out = tmp_path / "out"
    run_single_group(
        output_dir=out,
        chroms=["c1"],
        samples=[("s1", pre)],
        mu=mu,
        sigma=sigma,
        u=2,
        n_particles=60,
        n_steps_without_parameter_update=50,
        learning_rate_factor=0.2,
    )
    assert (out / "2_ESTIMATE_PARAMETERS" / "s1" / "c1" / "theta_c1.csv.gz").exists()
    reg = pd.read_csv(out / "3_ESTIMATE_REGIMES" / "s1" / "c1" / "regime_probabilities_c1.csv.gz")
    assert reg.shape == (T, R + 1)
    # Module-4 parity: bgzip-compressed BED + tabix index, gzip-readable.
    import gzip

    bed_gz = out / "4_SINGLE_GROUP_OUTPUT" / "s1" / "s1_regimes_c1.bed.gz"
    assert bed_gz.exists() and (bed_gz.parent / (bed_gz.name + ".tbi")).exists()
    with gzip.open(bed_gz, "rt") as f:
        bed = pd.read_csv(f, sep="\t", header=None)
    assert bed.shape[0] == T and bed.shape[1] == 9
    # Regime recovery from the two-pass flow.
    est = reg[[f"regime_{i+1}" for i in range(R)]].to_numpy().argmax(1)
    acc = np.mean(est == np.asarray(sim.r))
    assert acc > 0.6, acc
    # The tabix index resolves region queries correctly.
    from hygeia_tpu.utils.tabix import TabixFile

    pos = np.arange(1, T + 1) * 17
    lo, hi = int(pos[100]) - 1, int(pos[140])
    hits = list(TabixFile(str(bed_gz)).query("c1", lo, hi))
    expected = ((pos - 1 < hi) & (pos + 1 > lo)).sum()
    assert len(hits) == expected, (len(hits), expected)


def _write_two_group_fixture(tmp_path, T=170, seed=13):
    """Simulated preprocessed two-group inputs for one tiny chromosome."""
    rng = np.random.default_rng(seed)
    Pd = rng.dirichlet(np.ones(R - 1), size=R)
    Pfull = np.zeros((R, R))
    for r in range(R):
        Pfull[r, [c for c in range(R) if c != r]] = Pd[r]
    with np.errstate(divide="ignore"):
        log_p = np.log(Pfull)
    params = make_params(
        mu=MU, sigma=SIGMA, p_softmax_control=log_p,
        omega_logit_control=np.asarray(logit(jnp.full((R,), 0.9))),
        omega_case=0.8, kappa_control=np.full(R, 2.0), kappa_case=np.full(R, 2.0),
        merge_log_prob=np.log(0.1), split_prob=0.01, minimum_duration=3,
        d_max=512, dtype=jnp.float64,
    )
    n_c = rng.poisson(30, size=(T, 2)).astype(float)
    n_k = rng.poisson(30, size=(T, 2)).astype(float)
    sim = simulate(jax.random.PRNGKey(5), params, n_c, n_k)
    pre = tmp_path / "pre"
    pre.mkdir()
    hio.write_count_matrix(pre / "positions_cF.txt.gz", np.arange(1, T + 1) * 41)
    hio.write_count_matrix(pre / "n_total_reads_control_cF.txt.gz", n_c)
    hio.write_count_matrix(pre / "n_total_reads_case_cF.txt.gz", n_k)
    hio.write_count_matrix(
        pre / "n_methylated_reads_control_cF.txt.gz", np.asarray(sim.obs_control)
    )
    hio.write_count_matrix(
        pre / "n_methylated_reads_case_cF.txt.gz", np.asarray(sim.obs_case)
    )
    return pre


@pytest.mark.slow
def test_infer_unit_failure_is_retried_then_ignored(tmp_path, monkeypatch):
    """errorStrategy retry/ignore (nextflow.config:23-27): an INFER unit that
    fails every attempt must not kill the chromosome — later batches still
    aggregate, a transiently-failing unit succeeds on retry, and trace.tsv
    records attempts.

    Batch 1's persistent failure is injected MID-COMPUTE (inside the backward
    dispatch), i.e. AFTER infer_segment has already written positions.csv.gz
    and the trimmed input CSVs — the OOM shape the retry/ignore strategy
    targets. AGGREGATE must key unit completion on the npz archives, not the
    early input files (ADVICE r2)."""
    from hygeia_tpu.pipeline.orchestrator import run_two_group
    import hygeia_tpu.two_group.runner as runner_mod

    pre = _write_two_group_fixture(tmp_path)

    real_infer = runner_mod.infer_segment
    real_backward = runner_mod.backward_simulation
    calls = {"batch0": 0}

    def flaky_infer(**kw):
        if kw["batch"] == 1:
            # Fail after the early input-CSV writes: run the real unit but
            # blow up in the backward pass.
            def boom(*a, **k):
                raise ValueError("injected mid-compute failure")

            runner_mod.backward_simulation = boom
            try:
                return real_infer(**kw)
            finally:
                runner_mod.backward_simulation = real_backward
        if kw["batch"] == 0:
            calls["batch0"] += 1
            if calls["batch0"] == 1:
                raise RuntimeError("injected transient failure")
        return real_infer(**kw)

    monkeypatch.setattr(runner_mod, "infer_segment", flaky_infer)

    out = tmp_path / "out"
    run_two_group(
        output_dir=out,
        chroms=["cF"],
        preprocessed_dir=pre,
        segment_size=60,
        buffer_size=25,
        inference_seeds=(0,),
        num_resampled_particles=6,
        num_samples_backward=8,
        n_particles_single_group=30,
        max_retries=1,
    )

    # Pipeline completed through DMPs despite the dead unit.
    assert (out / "6_GET_DMPS" / "cF" / "dmp_0.05.csv").exists()

    trace = pd.read_csv(out / "trace.tsv", sep="\t")
    row1 = trace[trace.stage == "INFER[1]"].iloc[0]
    assert row1.status.startswith("ignored"), row1
    assert row1.attempts == 2  # first try + 1 retry
    row0 = trace[trace.stage == "INFER[0]"].iloc[0]
    assert row0.status == "ok" and row0.attempts == 2, row0

    # Aggregation skipped the missing batch but kept batches 0 and 2:
    # batch 0 returns sites 1..60, batch 2 sites 121..170.
    split = pd.read_csv(
        out / "5_AGGREGATE_RESULTS" / "cF" / "split_probs_cF.csv.gz", sep="\t"
    )
    assert len(split) == 60 + 50, len(split)


def test_single_group_sample_sheet_end_to_end(tmp_path):
    """Raw BED + sample sheet through the full single-group DAG
    (main.nf:20-30): preprocess -> estimate -> regimes -> indexed BED."""
    from hygeia_tpu.pipeline.orchestrator import run_single_group

    T = 80
    rng = np.random.default_rng(3)
    pos = np.arange(1, T + 1) * 23  # 1-based CpG starts
    cpg = tmp_path / "cpg.tsv"
    pd.DataFrame({"seqID": "7", "start": pos}).to_csv(cpg, sep="\t", index=False)

    header = [
        "chr", "start", "end", "name", "score", "strand", "thickStart",
        "thickEnd", "itemRgb", "coverage", "percent_methylated",
        "ref_genotype", "sample_genotype", "quality_score",
    ]
    cov = rng.poisson(25, size=T) + 1
    pct = np.where(rng.random(T) < 0.5, 95.0, 5.0)
    bed = tmp_path / "sampleA.bed"
    with open(bed, "w") as f:
        f.write("\t".join(header) + "\n")
        for i in range(T):
            f.write(
                "\t".join(
                    str(x)
                    for x in [
                        "7", pos[i] - 1, pos[i], "n", 0, "+", 0, 0, ".",
                        cov[i], pct[i], "CG", "CG", 30,
                    ]
                )
                + "\n"
            )
    sheet = tmp_path / "samples.csv"
    sheet.write_text(f"id,file\nsampleA,{bed}\n")

    out = tmp_path / "out"
    cli_main(
        [
            "run",
            "--output_dir", str(out),
            "--chroms", "7",
            "--sample_sheet", str(sheet),
            "--cpg_file_path", str(cpg),
            "--n_particles", "40",
        ]
    )
    assert (
        out / "1_PREPROCESS" / "sampleA" / "7" / "n_total_reads_case_7.txt.gz"
    ).exists()
    assert (out / "2_ESTIMATE_PARAMETERS" / "sampleA" / "7" / "theta_7.csv.gz").exists()
    bed_gz = out / "4_SINGLE_GROUP_OUTPUT" / "sampleA" / "sampleA_regimes_7.bed.gz"
    assert bed_gz.exists() and (bed_gz.parent / (bed_gz.name + ".tbi")).exists()
    import gzip

    with gzip.open(bed_gz, "rt") as f:
        assert sum(1 for _ in f) == T


def test_single_group_stub_run(tmp_path):
    out = tmp_path / "stub_sg"
    sheet = tmp_path / "samples.csv"
    sheet.write_text("id,file\ns1,/nonexistent.bed\n")
    cli_main(
        [
            "run", "--stub_run",
            "--output_dir", str(out),
            "--chroms", "c3",
            "--sample_sheet", str(sheet),
        ]
    )
    assert (out / "4_SINGLE_GROUP_OUTPUT" / "s1" / "s1_regimes_c3.bed.gz").exists()
    assert (out / "2_ESTIMATE_PARAMETERS" / "s1" / "c3" / "theta_c3.csv.gz").exists()
    assert (out / "trace.tsv").exists()


def test_stub_run(tmp_path):
    out = tmp_path / "stub"
    cli_main(
        [
            "run", "--two_group", "--stub_run",
            "--output_dir", str(out),
            "--chroms", "chrA,chrB",
        ]
    )
    for chrom in ("chrA", "chrB"):
        assert (out / "6_GET_DMPS" / chrom / "dmp_0.05.csv").exists()
        assert (out / "3_GET_CHROM_SEGMENTS" / chrom / f"chrom_segments_{chrom}.csv").exists()
    assert (out / "trace.tsv").exists()
    assert (out / "versions.yml").exists()
    # Nextflow-artifact analogs (nextflow.config:36-51).
    assert "<h2>" in (out / "timeline.html").read_text()
    assert "<table>" in (out / "report.html").read_text()
    assert "digraph" in (out / "dag.dot").read_text()


@pytest.mark.slow
def test_meshed_infer_matches_sequential_format(tmp_path):
    """VERDICT r2 #1: `hygeia run` with mesh_shape maps the INFER stage onto
    parallel/sharded.sharded_two_group_inference (batches -> "genome" axis,
    seeds -> "seed") instead of the sequential per-batch loop, writing the
    same per-batch output files so AGGREGATE and GET_DMPS are untouched.

    Asserts: identical file SETS per INFER unit and per downstream stage,
    identical positions index and table shapes in the aggregates, identical
    DMP columns — and statistically-consistent split probabilities (the RNG
    streams differ by design, PARITY.md)."""
    import shutil

    from hygeia_tpu.pipeline.orchestrator import run_two_group

    pre = _write_two_group_fixture(tmp_path)
    kw = dict(
        chroms=["cF"],
        preprocessed_dir=pre,
        segment_size=60,
        buffer_size=25,
        inference_seeds=(0, 1),
        num_resampled_particles=6,
        num_samples_backward=8,
        n_particles_single_group=30,
        max_retries=0,
    )
    out_seq = run_two_group(output_dir=tmp_path / "seq", **kw)
    # Reuse the (deterministic, identical) single-group estimate so the mesh
    # run only re-executes INFER onward.
    (tmp_path / "mesh").mkdir()
    shutil.copytree(
        out_seq / "2_ESTIMATE_PARAMETERS_AND_REGIMES",
        tmp_path / "mesh" / "2_ESTIMATE_PARAMETERS_AND_REGIMES",
    )
    out_mesh = run_two_group(
        output_dir=tmp_path / "mesh", mesh_shape=(4, 2), **kw
    )

    # INFER unit dirs: same per-batch file sets.
    for b in range(3):
        seq_d = out_seq / "4_INFER" / f"chrom_cF_{b}"
        mesh_d = out_mesh / "4_INFER" / f"chrom_cF_{b}"
        seq_files = sorted(p.name for p in seq_d.iterdir())
        mesh_files = sorted(p.name for p in mesh_d.iterdir())
        assert seq_files == mesh_files, (b, seq_files, mesh_files)
        # Archive shapes match exactly (same windows). split/regime prob
        # npzs: the reference (and our sequential path) write those UNtrimmed
        # over the buffered window (run_inference_two_groups.py:311-316);
        # the meshed path has no per-batch buffer rows, so they come trimmed
        # to the segment (PARITY.md). They are not consumed downstream.
        for name in seq_files:
            if not name.endswith(".npz"):
                continue
            e = np.load(seq_d / name)["arr_0"]
            g = np.load(mesh_d / name)["arr_0"]
            if "split_probs" in name or "regime_probs" in name:
                n_ret = 60 if b < 2 else 50
                assert g.shape[0] == n_ret, (name, g.shape)
            else:
                assert e.shape == g.shape, (name, e.shape, g.shape)
                assert e.dtype == g.dtype, (name, e.dtype, g.dtype)

    # Aggregates: same file set, identical positions index, same shapes.
    seq_agg = out_seq / "5_AGGREGATE_RESULTS" / "cF"
    mesh_agg = out_mesh / "5_AGGREGATE_RESULTS" / "cF"
    seq_files = sorted(p.name for p in seq_agg.iterdir() if p.name != ".done")
    mesh_files = sorted(p.name for p in mesh_agg.iterdir() if p.name != ".done")
    assert seq_files == mesh_files
    for name in seq_files:
        e = pd.read_csv(seq_agg / name, sep="\t", index_col=0)
        g = pd.read_csv(mesh_agg / name, sep="\t", index_col=0)
        assert e.shape == g.shape, name
        np.testing.assert_array_equal(e.index, g.index, err_msg=name)
        # Inputs (counts) pass through both paths byte-identically.
        if "reads" in name or "meth" in name:
            pd.testing.assert_frame_equal(e, g, check_exact=True, obj=name)

    # Split probabilities agree statistically (different RNG streams; 2
    # seeds x 8 backward samples per path).
    e = pd.read_csv(seq_agg / "split_probs_cF.csv.gz", sep="\t", index_col=0)
    g = pd.read_csv(mesh_agg / "split_probs_cF.csv.gz", sep="\t", index_col=0)
    assert float(np.abs(e.values - g.values).mean()) < 0.2

    # DMP stage: same file set and columns.
    seq_dmp = out_seq / "6_GET_DMPS" / "cF"
    mesh_dmp = out_mesh / "6_GET_DMPS" / "cF"
    seq_files = sorted(p.name for p in seq_dmp.iterdir() if p.name != ".done")
    mesh_files = sorted(p.name for p in mesh_dmp.iterdir() if p.name != ".done")
    assert seq_files == mesh_files
    for name in seq_files:
        e = pd.read_csv(seq_dmp / name)
        g = pd.read_csv(mesh_dmp / name)
        assert list(e.columns) == list(g.columns), name

    trace = pd.read_csv(out_mesh / "trace.tsv", sep="\t")
    assert (trace.stage == "INFER[mesh]").any()


@pytest.mark.slow
def test_run_two_group_bucket_dir_staging(tmp_path):
    """--bucket_dir mirrors the output tree to an fsspec URL after every
    stage and restores it before a resumed run — the Nextflow -bucket-dir
    work-dir staging analog (run.sh:6): wiping the local results tree and
    re-running with --resume must restore and skip, not recompute."""
    import shutil

    rng = np.random.default_rng(3)
    T, S = 100, 1
    n = rng.poisson(25, size=(T, S)).astype(float)
    y = np.minimum(rng.poisson(8, size=(T, S)), n)
    pre = tmp_path / "pre"
    pre.mkdir()
    hio.write_count_matrix(pre / "positions_cb.txt.gz", np.arange(1, T + 1) * 13)
    hio.write_count_matrix(pre / "n_total_reads_control_cb.txt.gz", n)
    hio.write_count_matrix(pre / "n_total_reads_case_cb.txt.gz", n)
    hio.write_count_matrix(pre / "n_methylated_reads_control_cb.txt.gz", y)
    hio.write_count_matrix(
        pre / "n_methylated_reads_case_cb.txt.gz", np.minimum(y + 4, n)
    )

    out, bucket = tmp_path / "out", tmp_path / "bucket"
    argv = [
        "run", "--two_group",
        "--output_dir", str(out),
        "--chroms", "cb",
        "--preprocessed_dir", str(pre),
        "--batch_size", "100",
        "--buffer_size", "10",
        "--num_of_inference_seeds", "1",
        "--num_resampled_particles", "6",
        "--num_samples_backward", "8",
        "--n_particles", "30",
        "--bucket_dir", str(bucket),
    ]
    cli_main(argv)
    # The mirror carries outputs AND resume markers.
    assert (bucket / "6_GET_DMPS" / "cb" / "dmp_0.05.csv").exists()
    assert (bucket / "6_GET_DMPS" / "cb" / ".done").exists()

    # Fresh machine: no local tree at all; resume restores from the bucket
    # and skips every stage.
    shutil.rmtree(out)
    t0 = time.time()
    cli_main(argv)
    resumed = time.time() - t0
    assert (out / "6_GET_DMPS" / "cb" / "dmp_0.05.csv").exists()
    assert resumed < 30.0, resumed
    trace = (out / "trace.tsv").read_text()
    assert "BUCKET_RESTORE" in trace
    # Every real stage row in the resumed run is a skip.
    rows = [r.split("\t") for r in trace.strip().splitlines()[1:]]
    assert all(r[3] == "True" for r in rows if r[0] not in ("BUCKET_RESTORE",)), rows


def test_batched_theta_not_rerun_without_resume(tmp_path, monkeypatch):
    """With --no_resume (resume=False), the per-chromosome loop ignores .done
    markers — the batched theta pre-pass must still be honoured in-process so
    the stage doesn't silently execute twice per run (advisor round-4 low)."""
    from hygeia_tpu.pipeline import orchestrator as orch

    sequential_calls = []
    real = orch._single_group_on_counts
    monkeypatch.setattr(
        orch,
        "_single_group_on_counts",
        lambda *a, **k: (sequential_calls.append(a), real(*a, **k)),
    )

    rng = np.random.default_rng(12)
    pre = tmp_path / "pre"
    pre.mkdir()
    for chrom, T in (("ca", 90), ("cb", 70)):
        n = rng.poisson(25, size=(T, 1)).astype(float)
        y = np.minimum(rng.poisson(8, size=(T, 1)), n)
        hio.write_count_matrix(pre / f"positions_{chrom}.txt.gz", np.arange(1, T + 1) * 11)
        hio.write_count_matrix(pre / f"n_total_reads_control_{chrom}.txt.gz", n)
        hio.write_count_matrix(pre / f"n_total_reads_case_{chrom}.txt.gz", n)
        hio.write_count_matrix(pre / f"n_methylated_reads_control_{chrom}.txt.gz", y)
        hio.write_count_matrix(
            pre / f"n_methylated_reads_case_{chrom}.txt.gz", np.minimum(y + 3, n)
        )

    orch.run_two_group(
        output_dir=tmp_path / "out",
        chroms=["ca", "cb"],
        preprocessed_dir=pre,
        segment_size=90,
        buffer_size=10,
        inference_seeds=(0,),
        num_resampled_particles=6,
        num_samples_backward=8,
        n_particles_single_group=30,
        resume=False,
    )
    trace_txt = (tmp_path / "out" / "trace.tsv").read_text()
    assert "ESTIMATE_PARAMETERS_AND_REGIMES[batched]" in trace_txt
    # The sequential per-chromosome theta stage never ran: the batched pass
    # covered both chromosomes even though resume markers are being ignored.
    assert not sequential_calls


@pytest.mark.slow
def test_batched_single_group_stage_matches_per_chromosome(tmp_path):
    """With preprocessed counts for several chromosomes, the theta stage
    runs ONCE as a vmapped ragged batch; its per-chromosome outputs must be
    IDENTICAL to individual runs (the engine's t_limit masking is bit-exact
    — test_t_limit_masking_matches_unbatched_run)."""
    rng = np.random.default_rng(4)
    pre = tmp_path / "pre"
    pre.mkdir()
    lengths = {"ca": 120, "cb": 90}
    for chrom, T in lengths.items():
        n = rng.poisson(25, size=(T, 1)).astype(float)
        y = np.minimum(rng.poisson(8, size=(T, 1)), n)
        hio.write_count_matrix(pre / f"positions_{chrom}.txt.gz", np.arange(1, T + 1) * 11)
        hio.write_count_matrix(pre / f"n_total_reads_control_{chrom}.txt.gz", n)
        hio.write_count_matrix(pre / f"n_total_reads_case_{chrom}.txt.gz", n)
        hio.write_count_matrix(pre / f"n_methylated_reads_control_{chrom}.txt.gz", y)
        hio.write_count_matrix(
            pre / f"n_methylated_reads_case_{chrom}.txt.gz", np.minimum(y + 3, n)
        )

    common = [
        "run", "--two_group",
        "--preprocessed_dir", str(pre),
        "--batch_size", "120",
        "--buffer_size", "10",
        "--num_of_inference_seeds", "1",
        "--num_resampled_particles", "6",
        "--num_samples_backward", "8",
        "--n_particles", "30",
    ]
    out_b = tmp_path / "batched"
    cli_main(common + ["--output_dir", str(out_b), "--chroms", "ca,cb"])
    trace_txt = (out_b / "trace.tsv").read_text()
    assert "ESTIMATE_PARAMETERS_AND_REGIMES[batched]" in trace_txt

    for chrom in lengths:
        out_i = tmp_path / f"indiv_{chrom}"
        cli_main(common + ["--output_dir", str(out_i), "--chroms", chrom])
        sgb = out_b / "2_ESTIMATE_PARAMETERS_AND_REGIMES" / chrom
        sgi = out_i / "2_ESTIMATE_PARAMETERS_AND_REGIMES" / chrom
        # The t_limit carry masking is bit-exact
        # (test_t_limit_masking_matches_unbatched_run), but the batched
        # PROGRAM differs from the per-unit one (vmap lanes + different
        # output structure), so XLA may reassociate f32 reductions — theta
        # compares by value at reduction-order-ulp tolerance (measured
        # <=4e-5 relative), like the regime probabilities below.
        tb = hio.read_theta(sgb / f"theta_{chrom}.csv.gz")
        ti = hio.read_theta(sgi / f"theta_{chrom}.csv.gz")
        np.testing.assert_allclose(tb, ti, rtol=2e-4, atol=1e-5, err_msg=chrom)
        # The batched trace must have T rows like the per-unit trace — a
        # `: T_u - 1` slice silently dropped the final row (and with it any
        # last-step ADAM update; round-5 review finding).
        trace_b = pd.read_csv(sgb / f"theta_trace_{chrom}.csv.gz")
        trace_i = pd.read_csv(sgi / f"theta_trace_{chrom}.csv.gz")
        assert len(trace_b) == len(trace_i) == lengths[chrom], chrom
        b = pd.read_csv(sgb / f"regime_probabilities_{chrom}.csv.gz")
        i = pd.read_csv(sgi / f"regime_probabilities_{chrom}.csv.gz")
        np.testing.assert_allclose(
            b.to_numpy(float), i.to_numpy(float), rtol=1e-4, atol=1e-6
        )
        # Downstream results (theta-dependent) agree too.
        assert (out_b / "6_GET_DMPS" / chrom / "dmp_0.05.csv").exists()


@pytest.mark.slow
def test_batched_single_group_passes_match_per_unit(tmp_path):
    """run_single_group with several (sample x chrom) units runs BOTH engine
    passes as vmapped ragged batches; thetas and regime probabilities must
    equal per-unit runs to f32 reduction-order ulp."""
    from hygeia_tpu.pipeline.orchestrator import run_single_group

    rng = np.random.default_rng(9)
    pre = tmp_path / "pre"
    pre.mkdir()
    lengths = {"c1": 140, "c2": 100}
    for chrom, T in lengths.items():
        n = np.full((T, 2), 25.0)
        y = np.minimum(rng.poisson(8, size=(T, 2)), n)
        hio.write_count_matrix(pre / f"positions_{chrom}.txt.gz", np.arange(1, T + 1) * 19)
        hio.write_count_matrix(pre / f"n_total_reads_case_{chrom}.txt.gz", n)
        hio.write_count_matrix(pre / f"n_methylated_reads_case_{chrom}.txt.gz", y)

    kw = dict(
        samples=[("s1", pre)],
        mu=MU, sigma=SIGMA, u=2, n_particles=40,
        n_steps_without_parameter_update=40,
    )
    out_b = tmp_path / "batched"
    run_single_group(output_dir=out_b, chroms=list(lengths), **kw)
    trace_txt = (out_b / "trace.tsv").read_text()
    assert "ESTIMATE_PARAMETERS[batched]" in trace_txt
    assert "ESTIMATE_REGIMES[batched]" in trace_txt

    for chrom in lengths:
        out_i = tmp_path / f"indiv_{chrom}"
        run_single_group(output_dir=out_i, chroms=[chrom], **kw)
        # Value-equality at f32 reduction-order-ulp tolerance (the batched
        # program's fusion differs from the per-unit one; see the same
        # comment in test_batched_single_group_stage_matches_per_chromosome).
        tb = hio.read_theta(
            out_b / "2_ESTIMATE_PARAMETERS" / "s1" / chrom / f"theta_{chrom}.csv.gz"
        )
        ti = hio.read_theta(
            out_i / "2_ESTIMATE_PARAMETERS" / "s1" / chrom / f"theta_{chrom}.csv.gz"
        )
        np.testing.assert_allclose(tb, ti, rtol=2e-4, atol=1e-5, err_msg=chrom)
        b = pd.read_csv(
            out_b / "3_ESTIMATE_REGIMES" / "s1" / chrom
            / f"regime_probabilities_{chrom}.csv.gz"
        )
        i = pd.read_csv(
            out_i / "3_ESTIMATE_REGIMES" / "s1" / chrom
            / f"regime_probabilities_{chrom}.csv.gz"
        )
        np.testing.assert_allclose(
            b.to_numpy(float), i.to_numpy(float), rtol=1e-4, atol=1e-6
        )
        assert (
            out_b / "4_SINGLE_GROUP_OUTPUT" / "s1" / f"s1_regimes_{chrom}.bed.gz"
        ).exists()
