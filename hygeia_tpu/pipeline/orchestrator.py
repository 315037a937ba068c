"""Pipeline orchestrator: the `hygeia run` verb.

Replaces the Nextflow DSL2 workflow (main.nf:16-95): a DAG of the six
two-group stages (or four single-group stages) over (chromosome x segment x
seed) work units, executed in ONE process so the accelerator is acquired
once. Stage completion is recorded with on-disk markers (the `-resume`
work-dir caching analog, run.sh:7,13); a re-run skips completed stages.

Output tree mirrors the reference's publishDir layout:
  1_PREPROCESS/ 2_ESTIMATE_PARAMETERS_AND_REGIMES/ 3_GET_CHROM_SEGMENTS/
  4_INFER/ 5_AGGREGATE_RESULTS/ 6_GET_DMPS/   (modules/*/[1-6]_*.nf)
"""

from __future__ import annotations

import json
import os
import platform
import time
from pathlib import Path

import numpy as np

from hygeia_tpu import __version__ as _VERSION


class StageTrace:
    """Per-stage wall-clock trace — the analog of Nextflow's
    timeline/report/trace artifacts (nextflow.config:36-51). Written as a
    TSV (`trace.tsv`) plus `versions.yml` per run directory (the
    versions-emission convention of every reference module, e.g.
    modules/two_group/4_infer.nf:54-57)."""

    def __init__(self, output_dir):
        self.path = Path(output_dir)
        self.rows = []

    def record(self, stage, chrom, seconds, skipped=False):
        self.rows.append((stage, str(chrom), round(seconds, 3), skipped))

    def flush(self):
        self.path.mkdir(parents=True, exist_ok=True)
        with open(self.path / "trace.tsv", "w") as f:
            f.write("stage\tchrom\twall_s\tskipped\n")
            for r in self.rows:
                f.write("\t".join(str(x) for x in r) + "\n")
        with open(self.path / "versions.yml", "w") as f:
            f.write(
                f'hygeia_tpu: "{_VERSION}"\npython: "{platform.python_version()}"\n'
            )
        try:
            import jax

            with open(self.path / "versions.yml", "a") as f:
                f.write(f'jax: "{jax.__version__}"\n')
        except Exception:
            pass


def _marker(path: Path) -> Path:
    return path / ".done"


def _stage(path: Path, resume: bool):
    """Returns True if the stage should run (and ensures the directory)."""
    path.mkdir(parents=True, exist_ok=True)
    if resume and _marker(path).exists():
        return False
    return True


def _finish(path: Path, meta=None):
    _marker(path).write_text(json.dumps(meta or {"t": time.time()}))


def run_two_group(
    *,
    output_dir,
    chroms,
    cpg_file_path=None,
    control_data_paths=(),
    control_id_names=(),
    case_data_paths=(),
    case_id_names=(),
    preprocessed_dir=None,
    mu=(0.95, 0.05, 0.80, 0.20, 0.50, 0.50),
    sigma=(0.05, 0.05, 0.1, 0.1, 0.1, 0.2886751),
    u=3,
    segment_size=100000,
    buffer_size=5000,
    inference_seeds=(0, 1),
    num_resampled_particles=50,
    num_samples_backward=25,
    n_particles_single_group=250,
    epsilon=0.01,
    n_steps_without_parameter_update=200,
    learning_rate_exponent=0.1,
    learning_rate_factor=0.01,
    fdr_thresholds=(0.01, 0.05),
    resume=True,
    rng_seed=0,
    stub_run=False,
):
    """Full two-group pipeline for a list of chromosomes.

    Either provide BED inputs (cpg_file_path + *_data_paths) or a
    `preprocessed_dir` that already holds the per-chromosome count files.

    stub_run=True wires the DAG without computation (the Nextflow
    `-stub-run` analog: every module has a stub block emitting empty
    outputs, e.g. modules/two_group/4_infer.nf:60-71).
    """
    out = Path(output_dir)
    R = len(mu)
    n_backward_total = num_resampled_particles * (2 * R + R * R)
    trace = StageTrace(out)

    if stub_run:
        _stub_two_group(out, chroms, inference_seeds, n_backward_total)
        trace.flush()
        return out

    for chrom in chroms:
        # ---- 1: preprocess ------------------------------------------------
        pre_dir = out / "1_PREPROCESS" / str(chrom)
        if preprocessed_dir is not None:
            pre_dir = Path(preprocessed_dir)
        elif _stage(pre_dir, resume):
            from hygeia_tpu.pipeline.preprocess_bed import process_bed

            process_bed(
                cpg_file_path,
                pre_dir,
                chrom,
                control_data_paths=control_data_paths,
                control_id_names=control_id_names,
                case_data_paths=case_data_paths,
                case_id_names=case_id_names,
            )
            _finish(pre_dir)

        # ---- 2: single-group estimation on the CONTROL group --------------
        # (modules/two_group/2_estimate_parameters_and_regimes.nf:39-52 runs
        # the engine on control reads with both estimation flags).
        sg_dir = out / "2_ESTIMATE_PARAMETERS_AND_REGIMES" / str(chrom)
        t_stage = time.time()
        if _stage(sg_dir, resume):
            _single_group_on_counts(
                pre_dir,
                sg_dir,
                chrom,
                group="control",
                mu=mu,
                sigma=sigma,
                u=u,
                n_particles=n_particles_single_group,
                epsilon=epsilon,
                steps_per_update=n_steps_without_parameter_update,
                learning_rate_exponent=learning_rate_exponent,
                learning_rate_factor=learning_rate_factor,
                rng_seed=rng_seed,
            )
            _finish(sg_dir)
            trace.record("ESTIMATE_PARAMETERS_AND_REGIMES", chrom, time.time() - t_stage)
        else:
            trace.record("ESTIMATE_PARAMETERS_AND_REGIMES", chrom, 0.0, skipped=True)

        # ---- 3: segments --------------------------------------------------
        seg_dir = out / "3_GET_CHROM_SEGMENTS" / str(chrom)
        from hygeia_tpu.utils import io as hio

        positions = hio.read_positions(pre_dir / f"positions_{chrom}.txt.gz")
        n_batches = 1 + len(positions) // segment_size
        if _stage(seg_dir, resume):
            from hygeia_tpu.pipeline.segments import chrom_segments

            chrom_segments(len(positions), str(chrom), segment_size).to_csv(
                seg_dir / f"chrom_segments_{chrom}.csv", index=False
            )
            _finish(seg_dir)

        # ---- 4: infer over (batch x seed) ---------------------------------
        infer_dir = out / "4_INFER"
        from hygeia_tpu.two_group.runner import infer_segment

        for batch in range(n_batches):
            # All seeds of a batch run vmapped in one device program.
            unit = infer_dir / f"unit_{chrom}_{batch}"
            if not _stage(unit, resume):
                trace.record(f"INFER[{batch}]", chrom, 0.0, skipped=True)
                continue
            t_stage = time.time()
            infer_segment(
                data_dir=str(pre_dir),
                single_group_dir=str(sg_dir),
                results_dir=str(infer_dir),
                chrom=chrom,
                batch=batch,
                seed=list(inference_seeds),
                segment_size=segment_size,
                buffer_size=buffer_size,
                mu=mu,
                sigma=sigma,
                minimum_duration=u,
                num_resampled_particles=(num_resampled_particles,),
                num_samples_backward=num_samples_backward,
            )
            _finish(unit)
            trace.record(f"INFER[{batch}]", chrom, time.time() - t_stage)

        # ---- 5: aggregate --------------------------------------------------
        agg_dir = out / "5_AGGREGATE_RESULTS" / str(chrom)
        t_stage = time.time()
        if _stage(agg_dir, resume):
            from hygeia_tpu.pipeline.aggregate import aggregate_chromosome

            aggregate_chromosome(
                str(infer_dir),
                str(agg_dir),
                chrom,
                seeds=len(inference_seeds),
                num_particles=n_backward_total,
                num_batches=n_batches,
            )
            _finish(agg_dir)
            trace.record("AGGREGATE_RESULTS", chrom, time.time() - t_stage)

        # ---- 6: DMPs -------------------------------------------------------
        dmp_dir = out / "6_GET_DMPS" / str(chrom)
        t_stage = time.time()
        if _stage(dmp_dir, resume):
            from hygeia_tpu.pipeline.dmps import call_dmps

            call_dmps(
                str(agg_dir),
                str(dmp_dir),
                chrom,
                n_regimes=R,
                fdr_thresholds=fdr_thresholds,
            )
            _finish(dmp_dir)
            trace.record("GET_DMPS", chrom, time.time() - t_stage)

    trace.flush()
    return out


def _stub_two_group(out, chroms, inference_seeds, n_backward_total):
    """Create the full output tree with empty files (DAG wiring test)."""
    for chrom in chroms:
        for stage in (
            f"1_PREPROCESS/{chrom}",
            f"2_ESTIMATE_PARAMETERS_AND_REGIMES/{chrom}",
            f"3_GET_CHROM_SEGMENTS/{chrom}",
            "4_INFER",
            f"5_AGGREGATE_RESULTS/{chrom}",
            f"6_GET_DMPS/{chrom}",
        ):
            (out / stage).mkdir(parents=True, exist_ok=True)
        for name in (
            f"1_PREPROCESS/{chrom}/positions_{chrom}.txt.gz",
            f"2_ESTIMATE_PARAMETERS_AND_REGIMES/{chrom}/theta_{chrom}.csv.gz",
            f"3_GET_CHROM_SEGMENTS/{chrom}/chrom_segments_{chrom}.csv",
            f"5_AGGREGATE_RESULTS/{chrom}/split_probs_{chrom}.csv.gz",
            f"6_GET_DMPS/{chrom}/dmp_0.05.csv",
        ):
            (out / name).touch()
        for seed in inference_seeds:
            d = out / "4_INFER" / f"chrom_{chrom}_0"
            d.mkdir(parents=True, exist_ok=True)
            (d / f"optimal_backward_particles_merged_state_{n_backward_total}_{seed}.npz").touch()


def _single_group_on_counts(
    pre_dir,
    sg_dir,
    chrom,
    *,
    group,
    mu,
    sigma,
    u,
    n_particles,
    epsilon,
    steps_per_update,
    learning_rate_exponent,
    learning_rate_factor,
    rng_seed,
    estimate_regimes=True,
    estimate_parameters=True,
    theta_fixed=None,
):
    """Run the single-group engine directly on preprocessed count matrices
    and write the reference-named outputs (theta_{chrom}.csv.gz etc.)."""
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from hygeia_tpu.ops.emissions import emission_log_prob_table
    from hygeia_tpu.single_group.model import make_model, theta_to_parameters
    from hygeia_tpu.single_group.engine import (
        EngineConfig,
        run_online_combined_inference,
    )
    from hygeia_tpu.utils import io as hio

    pre_dir, sg_dir = Path(pre_dir), Path(sg_dir)
    R = len(mu)
    kappa = np.full(R, 2.0)
    n_total = hio.read_count_matrix(pre_dir / f"n_total_reads_{group}_{chrom}.txt.gz")
    n_meth = hio.read_count_matrix(
        pre_dir / f"n_methylated_reads_{group}_{chrom}.txt.gz"
    )
    positions = hio.read_positions(pre_dir / f"positions_{chrom}.txt.gz")
    model = make_model(np.asarray(mu), np.asarray(sigma), u, kappa, d_max=4096)
    if theta_fixed is not None:
        theta_init = np.asarray(theta_fixed)
    elif estimate_parameters:
        theta_init = np.asarray(
            jax.random.normal(jax.random.PRNGKey(rng_seed), (model.dim_theta,))
        )
    else:
        from hygeia_tpu.single_group.runner import default_p, DEFAULT_OMEGA
        from hygeia_tpu.single_group.model import parameters_to_theta

        theta_init = parameters_to_theta(default_p(R), np.asarray(DEFAULT_OMEGA[:R]), kappa)
    E = emission_log_prob_table(n_meth, n_total, model.alpha, model.beta)
    cfg = EngineConfig(
        n_particles_max=n_particles,
        epsilon=epsilon,
        estimate_regimes=estimate_regimes,
        estimate_parameters=estimate_parameters,
        steps_per_update=steps_per_update,
        learning_rate_exponent=learning_rate_exponent,
        learning_rate_factor=learning_rate_factor,
    )
    res = jax.jit(
        lambda key: run_online_combined_inference(
            key, model, jnp.asarray(theta_init, jnp.float32), E, cfg
        )
    )(jax.random.PRNGKey(rng_seed))

    if estimate_regimes:
        probs = np.asarray(res.regime_probs)
        df = pd.DataFrame(probs, columns=[f"regime_{i + 1}" for i in range(R)])
        df.insert(0, "genomic_position", positions[: len(df)])
        df.to_csv(sg_dir / f"regime_probabilities_{chrom}.csv.gz", index=False)

    trace = np.asarray(res.theta_trace)
    pd.DataFrame(
        trace, columns=[f"theta_{i + 1}" for i in range(trace.shape[1])]
    ).to_csv(sg_dir / f"theta_trace_{chrom}.csv.gz", index=False)
    final = theta_to_parameters(trace[-1], R)
    pd.DataFrame(final["p"], columns=[f"regime_{i + 1}" for i in range(R)]).to_csv(
        sg_dir / f"p_{chrom}.csv.gz", index=False
    )
    hio.write_headed_column(sg_dir / f"omega_{chrom}.csv.gz", final["omega"], "omega")
    hio.write_headed_column(sg_dir / f"kappa_{chrom}.csv.gz", kappa, "kappa")
    hio.write_theta(sg_dir / f"theta_{chrom}.csv.gz", trace[-1])


def run_single_group(
    *,
    output_dir,
    chroms,
    samples,  # list of (sample_id, preprocessed_dir) or BED inputs upstream
    mu=(0.99, 0.01, 0.80, 0.20, 0.50, 0.50),
    sigma=(0.05, 0.05, 0.20, 0.20, 0.20, 0.2886751),
    u=3,
    n_particles=250,
    epsilon=0.01,
    n_steps_without_parameter_update=200,
    learning_rate_exponent=0.1,
    learning_rate_factor=0.01,
    resume=True,
    rng_seed=0,
):
    """Single-group path (main.nf:20-30), mirroring the reference's two-pass
    structure: ESTIMATE_PARAMETERS (modules/single_group/2) learns theta from
    a prior init, then ESTIMATE_REGIMES (modules/single_group/3) re-runs the
    engine with the estimated p/omega/kappa to produce regime probabilities,
    then BED export (modules/single_group/4)."""
    import pandas as pd

    from hygeia_tpu.single_group.model import theta_to_parameters
    from hygeia_tpu.utils import io as hio

    out = Path(output_dir)
    R = len(mu)
    for sample_id, pre_dir in samples:
        for chrom in chroms:
            # Pass 1: parameter estimation.
            est_dir = out / "2_ESTIMATE_PARAMETERS" / sample_id / str(chrom)
            if _stage(est_dir, resume):
                _single_group_on_counts(
                    pre_dir,
                    est_dir,
                    chrom,
                    group=sample_id,
                    mu=mu,
                    sigma=sigma,
                    u=u,
                    n_particles=n_particles,
                    epsilon=epsilon,
                    steps_per_update=n_steps_without_parameter_update,
                    learning_rate_exponent=learning_rate_exponent,
                    learning_rate_factor=learning_rate_factor,
                    rng_seed=rng_seed,
                    estimate_regimes=False,
                    estimate_parameters=True,
                )
                _finish(est_dir)
            # Pass 2: regime estimation with the learned parameters.
            reg_dir = out / "3_ESTIMATE_REGIMES" / sample_id / str(chrom)
            if _stage(reg_dir, resume):
                theta = hio.read_theta(est_dir / f"theta_{chrom}.csv.gz")
                _single_group_on_counts(
                    pre_dir,
                    reg_dir,
                    chrom,
                    group=sample_id,
                    mu=mu,
                    sigma=sigma,
                    u=u,
                    n_particles=n_particles,
                    epsilon=epsilon,
                    steps_per_update=n_steps_without_parameter_update,
                    learning_rate_exponent=learning_rate_exponent,
                    learning_rate_factor=learning_rate_factor,
                    rng_seed=rng_seed,
                    estimate_regimes=True,
                    estimate_parameters=False,
                    theta_fixed=theta,
                )
                _finish(reg_dir)
            bed_dir = out / "4_BED" / sample_id
            if _stage(bed_dir, resume):
                from hygeia_tpu.pipeline.bed import make_bed

                make_bed(
                    chrom,
                    reg_dir / f"regime_probabilities_{chrom}.csv.gz",
                    bed_dir / f"{sample_id}_{chrom}.bed",
                )
                _finish(bed_dir)
    return out
