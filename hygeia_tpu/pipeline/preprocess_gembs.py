"""gemBS-format methylation preprocessing.

Replaces preprocess_gembs.py: gemBS tab files already carry per-CpG
methylated/unmethylated counts as `{sample}:non_conv` / `{sample}:conv`
columns keyed by `Pos0`, so no strand collapse is needed — filter to
(chr{chromosome}, Ref == 'CG'), outer-merge onto the reference CpG
positions, impute zeros, and write the same count-matrix outputs as the BED
path (reference :140-186, :188-260).

Note the gemBS path expects `chr`-prefixed contig names in both the CpG file
(`seqID == chr{chromosome}`, :109-111) and the sample files, unlike the BED
path which compares raw chromosome strings.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd


def read_gembs_sample(path, chromosome, sample_id):
    comp = "gzip" if str(path).endswith(".gz") else None
    df = pd.read_csv(path, sep="\t", compression=comp)
    df = df[(df["Contig"] == f"chr{chromosome}") & (df["Ref"] == "CG")]
    cols = ["Pos0", f"{sample_id}:non_conv", f"{sample_id}:conv"]
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"missing columns in {path}: {missing}")
    return df[cols].copy()


def process_gembs(
    cpg_file_path,
    output_path,
    chromosome,
    *,
    control_data_paths=(),
    control_id_names=(),
    case_data_paths=(),
    case_id_names=(),
):
    output_path = Path(output_path)
    output_path.mkdir(parents=True, exist_ok=True)

    comp = "gzip" if str(cpg_file_path).endswith(".gz") else None
    cpg = pd.read_csv(cpg_file_path, sep="\t", compression=comp)
    cpg = cpg[cpg["seqID"] == f"chr{chromosome}"]
    if cpg.empty:
        raise ValueError(f"No CpG sites found for chromosome {chromosome}")

    merged = pd.DataFrame({"Pos0": (cpg["start"] - 1).astype(np.int64)})
    for paths, names in (
        (control_data_paths, control_id_names),
        (case_data_paths, case_id_names),
    ):
        for path, name in zip(paths, names):
            sample = read_gembs_sample(path, chromosome, name)
            merged = pd.merge(merged, sample, on="Pos0", how="outer")
    merged = merged.sort_values("Pos0").reset_index(drop=True)
    merged = merged[merged["Pos0"].notna()]

    positions = merged["Pos0"].to_numpy(np.int64)
    data = np.nan_to_num(merged.drop(columns=["Pos0"]).to_numpy(float))

    n_control = len(control_id_names)
    n_case = len(case_id_names)
    files = {
        "positions": positions,
        "cpg_sites_merged": np.array([len(positions)]),
    }
    if n_control:
        meth = data[:, 0 : 2 * n_control : 2]
        unmeth = data[:, 1 : 2 * n_control : 2]
        files["n_methylated_reads_control"] = meth
        files["n_total_reads_control"] = meth + unmeth
    if n_case:
        off = 2 * n_control
        meth = data[:, off::2]
        unmeth = data[:, off + 1 :: 2]
        files["n_methylated_reads_case"] = meth
        files["n_total_reads_case"] = meth + unmeth
    for name, arr in files.items():
        np.savetxt(
            output_path / f"{name}_{chromosome}.txt.gz", arr, delimiter=",", fmt="%s"
        )
    return len(positions)
