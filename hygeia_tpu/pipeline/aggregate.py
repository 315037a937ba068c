"""Aggregate per-(batch, seed) inference outputs into per-chromosome tables.

Replaces aggregate_results.py: walks `chrom_{chrom}_{batch}` result
directories, concatenates backward-simulation particle archives across seeds
(along the particle axis) and batches (along the genome axis), and writes the
per-chromosome csv.gz outputs with the reference's exact names and layout
(tab-separated, position-indexed; aggregate_results.py:165-206)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

# gzip level 1: pandas' default level-9 gzip dominated the AGGREGATE stage
# wall at chromosome scale (9 x ~400k-row int tables); decompressed content
# is identical, so downstream consumers (incl. the reference's pd.read_table)
# see the same files.
_GZ1 = {"method": "gzip", "compresslevel": 1}


def aggregate_chromosome(
    results_dir,
    output_dir,
    chrom,
    *,
    seeds,
    num_particles,
    num_batches,
    compute_freqs=False,
    skip_missing=False,
):
    """skip_missing=False reproduces the reference exactly (aggregate_results
    .py:71-85 breaks at the first absent batch dir). skip_missing=True keeps
    going — the orchestrator uses it so one INFER unit that failed after all
    retries (errorStrategy ignore, nextflow.config:23-27) does not discard
    every later batch of the chromosome.

    Unit completion is keyed on the backward-particle archives, NOT on
    positions.csv.gz: infer_segment writes the trimmed input CSVs *before*
    inference runs, so a unit that died mid-compute (the OOM scenario the
    retry/ignore strategy targets) leaves positions.csv.gz present with no
    npz outputs — skip_missing must treat that as a missing batch rather
    than crash the AGGREGATE stage."""
    os.makedirs(output_dir, exist_ok=True)
    N = num_particles

    frames = {
        k: []
        for k in (
            "positions",
            "merged",
            "ctrl_regime",
            "case_regime",
            "ctrl_dur",
            "case_dur",
            "n_tot_ctrl",
            "n_tot_case",
            "obs_ctrl",
            "obs_case",
            "split",
        )
    }
    processed = 0
    for batch in range(num_batches):
        data_dir = os.path.join(results_dir, f"chrom_{chrom}_{batch}")
        pos_file = os.path.join(data_dir, "positions.csv.gz")
        if not os.path.isfile(pos_file):
            if skip_missing:
                continue
            break
        if skip_missing:
            # The archives are written only after inference succeeds; a unit
            # ignored after all retries may have the early input CSVs but no
            # archives. (With skip_missing=False a half-written unit raises,
            # like the reference's np.load would.)
            archives = [
                os.path.join(
                    data_dir,
                    f"optimal_backward_particles_{kind}_state_{N}_{seed}.npz",
                )
                for seed in range(seeds)
                for kind in ("merged", "control", "case")
            ]
            if not all(os.path.isfile(p) for p in archives):
                continue
        try:
            positions = pd.read_table(pos_file, sep=",", header=None, dtype=np.int64)
        except pd.errors.EmptyDataError:
            # A zero-site batch: the reference's n_batches = 1 + n // S
            # convention (get_chrom_segments.py) creates an empty trailing
            # batch whenever the chromosome length is an exact multiple of
            # segment_size; its input files are empty. Zero rows, not a
            # failure — skip it in both modes.
            continue

        merged_seeds, ctrl_seeds, case_seeds = [], [], []
        for seed in range(seeds):
            m = np.load(
                os.path.join(
                    data_dir,
                    f"optimal_backward_particles_merged_state_{N}_{seed}.npz",
                )
            )["arr_0"]
            c = np.load(
                os.path.join(
                    data_dir,
                    f"optimal_backward_particles_control_state_{N}_{seed}.npz",
                )
            )["arr_0"]
            k = np.load(
                os.path.join(
                    data_dir,
                    f"optimal_backward_particles_case_state_{N}_{seed}.npz",
                )
            )["arr_0"]
            merged_seeds.append(m)
            ctrl_seeds.append(c)
            case_seeds.append(k)
        # Seeds concatenate along the particle axis (aggregate_results.py:125-127).
        merged = np.concatenate(merged_seeds, axis=-1)
        ctrl = np.concatenate(ctrl_seeds, axis=1)
        case = np.concatenate(case_seeds, axis=1)

        frames["positions"].append(positions)
        frames["merged"].append(pd.DataFrame(merged).astype(np.int8))
        # State archives are (T, B, 2) = (duration, regime) pairs.
        frames["ctrl_regime"].append(pd.DataFrame(ctrl[:, :, 1]).astype(np.int8))
        frames["case_regime"].append(pd.DataFrame(case[:, :, 1]).astype(np.int8))
        frames["ctrl_dur"].append(pd.DataFrame(ctrl[:, :, 0]).astype(np.int32))
        frames["case_dur"].append(pd.DataFrame(case[:, :, 0]).astype(np.int32))
        for key, fname in (
            ("n_tot_ctrl", "n_total_reads_control.csv.gz"),
            ("n_tot_case", "n_total_reads_case.csv.gz"),
            ("obs_ctrl", "observations_control.csv.gz"),
            ("obs_case", "observations_case.csv.gz"),
        ):
            from hygeia_tpu.utils import io as hio

            frames[key].append(
                pd.DataFrame(
                    hio.read_count_matrix(
                        os.path.join(data_dir, fname), np.int16
                    )
                )
            )
        processed += 1

    if processed == 0:
        raise FileNotFoundError(
            f"no batch outputs found under {results_dir} for chrom {chrom}"
        )

    pos = pd.concat(frames["positions"]).rename(columns={0: "pos"}).astype(np.int32)
    index = pos["pos"]
    index_np = index.to_numpy(np.int64)

    def _write(df_list, name):
        df = pd.concat(df_list)
        df = df.set_index(index)
        # Native writer: itoa + parallel gzip members, decompressed bytes
        # identical to to_csv (tests/test_pipeline.py); pandas' CSV
        # formatting path cost ~20 s over the nine production tables.
        from hygeia_tpu.native.loader import write_int_table_gz

        header = "pos\t" + "\t".join(str(c) for c in df.columns)
        if not write_int_table_gz(
            os.path.join(output_dir, name),
            df.to_numpy(),
            index=index_np,
            header=header,
            sep="\t",
            level=1,
        ):
            df.to_csv(
                os.path.join(output_dir, name), sep="\t", compression=_GZ1
            )
        return df

    ctrl_regimes = _write(frames["ctrl_regime"], f"control_regimes_chrom_{chrom}.csv.gz")
    case_regimes = _write(frames["case_regime"], f"case_regimes_chrom_{chrom}.csv.gz")
    merged_states = _write(frames["merged"], f"merge_states_chrom_{chrom}.csv.gz")
    split_probs = (merged_states == 0).mean(axis=1)
    split_probs.to_csv(
        os.path.join(output_dir, f"split_probs_{chrom}.csv.gz"),
        sep="\t",
        compression=_GZ1,
    )
    _write(frames["n_tot_ctrl"], f"n_total_reads_control_chrom_{chrom}.csv.gz")
    _write(frames["n_tot_case"], f"n_total_reads_case_chrom_{chrom}.csv.gz")
    _write(frames["obs_ctrl"], f"n_meth_reads_control_chrom_{chrom}.csv.gz")
    _write(frames["obs_case"], f"n_meth_reads_case_chrom_{chrom}.csv.gz")
    _write(frames["ctrl_dur"], f"control_durations_chrom_{chrom}.csv.gz")
    _write(frames["case_dur"], f"case_durations_chrom_{chrom}.csv.gz")

    if compute_freqs:
        for df, name in (
            (case_regimes, f"case_regimes_freq_{chrom}.csv"),
            (ctrl_regimes, f"control_regimes_freq_{chrom}.csv"),
        ):
            freq = df.apply(lambda x: x.value_counts(normalize=True), axis=1)
            freq.to_csv(os.path.join(output_dir, name), sep="\t")
    return processed
