"""DMP (differentially methylated position) calling under FDR control.

Replaces get_dmps.py: the test statistic per site is the posterior
probability of the null, 1 - (1/B) * #{backward particles with control
regime != case regime} (get_dmps.py:46-69); sites are selected with the
plain and weighted FDR procedures at each threshold, with per-regime METEOR
frequency columns (:113-125) and position-gap false-negative weights
(:96-101: w_fn = 1 / mean of the 1,2,3-lag position differences)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from hygeia_tpu.pipeline.multiple_testing import fdr_procedure, weighted_fdr_procedure


def _regime_freq_frame(regimes, rows, n_regimes, prefix):
    freqs = np.zeros((len(rows), n_regimes))
    for i, row in enumerate(regimes[rows]):
        freqs[i] = np.bincount(row, minlength=n_regimes) / row.shape[0]
    return pd.DataFrame(
        freqs, columns=[f"{prefix}_METEOR_{i + 1}" for i in range(n_regimes)]
    )


def _read_regime_table(path):
    """(T, B) int regimes from an aggregate table (header + pos index) via
    the native loader (pandas' read of two ~400k x 51 tables was most of
    the DMP stage wall); pandas fallback."""
    from hygeia_tpu.native.loader import load_matrix

    m = load_matrix(path, skip_rows=1)
    if m is not None:
        return m[:, 1:].astype(np.int64)
    return pd.read_csv(path, sep="\t").set_index("pos").to_numpy()


def call_dmps(
    results_dir,
    output_dir,
    chrom,
    *,
    n_regimes=6,
    fdr_thresholds=(0.01, 0.05),
    test_regime_combinations=False,
):
    os.makedirs(output_dir, exist_ok=True)
    ctrl = _read_regime_table(
        os.path.join(results_dir, f"control_regimes_chrom_{chrom}.csv.gz")
    )
    case = _read_regime_table(
        os.path.join(results_dir, f"case_regimes_chrom_{chrom}.csv.gz")
    )
    num_particles = ctrl.shape[-1]
    # Posterior probability of the null (same regime in both groups).
    null_stats = 1.0 - np.sum(ctrl != case, axis=1) / num_particles

    split = pd.read_csv(
        os.path.join(results_dir, f"split_probs_{chrom}.csv.gz"), sep="\t"
    ).set_index("pos")
    pos_index = pd.DataFrame(split.index)
    # Mean of 1-, 2- and 3-lag position gaps (get_dmps.py:79-80).
    gaps = (
        pos_index.diff(1) + pos_index.diff(2) + pos_index.diff(3)
    ) / 3.0
    positions = pos_index.copy()
    positions["chrom"] = chrom
    pos_arr = positions.to_numpy()

    w_fp = np.ones(len(gaps))
    w_fn = np.squeeze(1.0 / gaps.fillna(1e5).to_numpy(), -1)

    def _frame(rows, stats, fn_weights):
        df = pd.DataFrame(
            {
                "chrom": pos_arr[rows, 1],
                "position": pos_arr[rows, 0],
                "null_stats": stats,
            }
        )
        df["false_negative_weight"] = fn_weights
        df = pd.concat(
            [
                df.reset_index(drop=True),
                _regime_freq_frame(ctrl, rows, n_regimes, "Control"),
                _regime_freq_frame(case, rows, n_regimes, "Case"),
            ],
            axis=1,
        )
        return df

    for thr in fdr_thresholds:
        _, _, cutoff = fdr_procedure(null_stats, thr)
        selected = null_stats < cutoff
        rows = np.flatnonzero(selected)
        _frame(rows, null_stats[rows], 1.0).to_csv(
            os.path.join(output_dir, f"dmp_{thr}.csv"), index=False, float_format="%.4f"
        )

        w_rows, _ = weighted_fdr_procedure(null_stats, thr, w_fp, w_fn)
        w_rows = np.sort(w_rows)
        _frame(w_rows, null_stats[w_rows], w_fn[w_rows]).to_csv(
            os.path.join(output_dir, f"weighted_dmp_{thr}.csv"),
            index=False,
            float_format="%.4f",
        )

        if test_regime_combinations:
            for i in range(n_regimes):
                for j in range(n_regimes):
                    if i == j:
                        continue
                    stats_ij = 1.0 - np.sum((ctrl == i) & (case == j), axis=1) / num_particles
                    _, _, cut_ij = fdr_procedure(stats_ij, thr)
                    rows_ij = np.flatnonzero(stats_ij < cut_ij)
                    pd.DataFrame(
                        {
                            "chrom": pos_arr[rows_ij, 1],
                            "position": pos_arr[rows_ij, 0],
                            "null_stats": stats_ij[rows_ij],
                            "false_negative_weight": 1.0,
                        }
                    ).to_csv(
                        os.path.join(output_dir, f"dmp_{i}_{j}_{thr}.csv"), index=False
                    )
                    wr, _ = weighted_fdr_procedure(stats_ij, thr, w_fp, w_fn)
                    wr = np.sort(wr)
                    pd.DataFrame(
                        {
                            "chrom": pos_arr[wr, 1],
                            "position": pos_arr[wr, 0],
                            "null_stats": stats_ij[wr],
                            "false_negative_weight": w_fn[wr],
                        }
                    ).to_csv(
                        os.path.join(output_dir, f"weighted_dmp_{i}_{j}_{thr}.csv"),
                        index=False,
                    )
