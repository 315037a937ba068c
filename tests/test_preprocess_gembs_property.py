"""Property-style gemBS preprocess parity tests against a direct port of the
reference's merge logic (preprocess_gembs.py:100-237 load/merge/extract,
:239-282 save), mirroring tests/test_preprocess_property.py for the BED path
(VERDICT round 2 "weak" #7).

The oracle below is a line-faithful pandas/NumPy port of the reference's
MethylationProcessor run on randomized fixtures that exercise: per-sample
position subsets, sample positions absent from the reference CpG list,
wrong-contig and non-CG rows, multi-sample column ordering, control-only and
case-only groups, an empty-chromosome sample (NaN column slot), a
missing-columns sample (NaN column slot) and a missing file (no column
slot — the reference's `continue` at :147). Outputs are compared
byte-identically (decompressed text) file-for-file.
"""

import gzip
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from hygeia_tpu.pipeline.preprocess_gembs import process_gembs


# ---------------------------------------------------------------------------
# Oracle: direct port of the reference MethylationProcessor
# ---------------------------------------------------------------------------


def _oracle_group(data_paths, id_names, cpg_starts, chromosome):
    """process_sample_data (:122-186)."""
    meth_data = pd.DataFrame({"Pos0": cpg_starts - 1})
    for data_path, sample_id in zip(data_paths, id_names):
        if not Path(data_path).exists():
            continue  # :145-147 — NO column slot
        try:
            sample_data = pd.read_csv(data_path, sep="\t", compression="gzip")
            chrom_data = sample_data[
                (sample_data["Contig"] == f"chr{chromosome}")
                & (sample_data["Ref"] == "CG")
            ].copy()
            if chrom_data.empty:
                meth_data[f"{sample_id}:non_conv"] = np.nan
                meth_data[f"{sample_id}:conv"] = np.nan
                continue
            required = ["Pos0", f"{sample_id}:non_conv", f"{sample_id}:conv"]
            if any(c not in chrom_data.columns for c in required):
                meth_data[f"{sample_id}:non_conv"] = np.nan
                meth_data[f"{sample_id}:conv"] = np.nan
                continue
            meth_data = pd.merge(
                meth_data, chrom_data[required].copy(), on="Pos0", how="outer"
            )
        except Exception:
            meth_data[f"{sample_id}:non_conv"] = np.nan
            meth_data[f"{sample_id}:conv"] = np.nan
            continue
    return meth_data.sort_values("Pos0").reset_index(drop=True)


def _oracle(cpg_file, out_dir, chromosome, case_paths, case_ids, control_paths, control_ids):
    """process (:284-337) + extract_count_arrays (:188-237) + save (:239-282)."""
    cpg = pd.read_csv(cpg_file, sep="\t")
    cpg = cpg[cpg["seqID"] == f"chr{chromosome}"].copy()
    merged = pd.DataFrame({"Pos0": cpg["start"] - 1})
    if control_paths and control_ids:
        merged = pd.merge(
            merged,
            _oracle_group(control_paths, control_ids, cpg["start"], chromosome),
            on="Pos0",
            how="outer",
        )
    if case_paths and case_ids:
        merged = pd.merge(
            merged,
            _oracle_group(case_paths, case_ids, cpg["start"], chromosome),
            on="Pos0",
            how="outer",
        )
    merged = merged.sort_values("Pos0").reset_index(drop=True)

    positions = merged["Pos0"].to_numpy()
    n_control, n_case = len(control_ids), len(case_ids)
    empty = np.array([]).reshape(len(positions), 0)
    ncc = cc = nck = ck = empty
    if merged.shape[1] > 1:
        # (the reference passes copy=False; modern pandas can hand back a
        # read-only view here, so copy — output-identical)
        data = np.nan_to_num(merged.drop("Pos0", axis=1).to_numpy())
        if n_control > 0:
            end = n_control * 2
            if data.shape[1] >= end:
                ncc, cc = data[:, 0:end:2], data[:, 1:end:2]
                if n_case > 0 and data.shape[1] > end:
                    nck, ck = data[:, end::2], data[:, end + 1 :: 2]
        elif n_case > 0:
            nck, ck = data[:, 0::2], data[:, 1::2]

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    file_mapping = {
        "positions": positions,
        "cpg_sites_merged": np.array([len(positions)]),
    }
    if ncc.size > 0:
        file_mapping["n_methylated_reads_control"] = ncc
        file_mapping["n_total_reads_control"] = cc + ncc
    if nck.size > 0:
        file_mapping["n_methylated_reads_case"] = nck
        file_mapping["n_total_reads_case"] = ck + nck
    for name, arr in file_mapping.items():
        np.savetxt(out_dir / f"{name}_{chromosome}.txt.gz", arr, delimiter=",", fmt="%s")
    return set(file_mapping)


# ---------------------------------------------------------------------------
# Fixture generation
# ---------------------------------------------------------------------------


def _write_gembs(path, sample_id, rows):
    """rows: list of (contig, pos0, ref, non_conv, conv)."""
    df = pd.DataFrame(
        {
            "Contig": [r[0] for r in rows],
            "Pos0": [r[1] for r in rows],
            "Ref": [r[2] for r in rows],
            f"{sample_id}:non_conv": [r[3] for r in rows],
            f"{sample_id}:conv": [r[4] for r in rows],
            # trailing extra column the merge must ignore
            f"{sample_id}:meth": [0.5 for _ in rows],
        }
    )
    df.to_csv(path, sep="\t", index=False, compression="gzip")


def _random_sample_rows(rng, cpg_starts, chromosome):
    rows = []
    for s in cpg_starts:
        kind = rng.integers(0, 4)
        if kind == 0:
            continue  # uncovered site -> NaN -> zero counts
        rows.append(
            (f"chr{chromosome}", int(s) - 1, "CG", int(rng.integers(0, 40)), int(rng.integers(0, 40)))
        )
    # Filtered noise: wrong contig, non-CG ref.
    rows.append((f"chr{chromosome + 1}", 10_000, "CG", 9, 9))
    rows.append((f"chr{chromosome}", 10_001, "CA", 9, 9))
    # A position absent from the CpG list: survives the outer merge.
    rows.append((f"chr{chromosome}", int(max(cpg_starts)) + 500, "CG", 7, 3))
    rng.shuffle(rows)
    return rows


def _compare_outputs(got_dir, exp_dir, chromosome, expected_names):
    got = sorted(Path(got_dir).glob("*.txt.gz"))
    exp = sorted(Path(exp_dir).glob("*.txt.gz"))
    assert [p.name for p in got] == [p.name for p in exp]
    assert {p.name for p in exp} == {f"{n}_{chromosome}.txt.gz" for n in expected_names}
    for g, e in zip(got, exp):
        with gzip.open(g, "rt") as f:
            g_text = f.read()
        with gzip.open(e, "rt") as f:
            e_text = f.read()
        assert g_text == e_text, g.name


@pytest.mark.parametrize("trial", range(4))
def test_process_gembs_matches_reference_oracle(tmp_path, trial):
    rng = np.random.default_rng(300 + trial)
    chromosome = 21
    cpg_starts = np.sort(rng.choice(np.arange(100, 5000), 35, replace=False))
    cpg = tmp_path / "cpg.tsv"
    pd.DataFrame({"seqID": f"chr{chromosome}", "start": cpg_starts}).to_csv(
        cpg, sep="\t", index=False
    )

    n_control, n_case = 2, 2
    paths, ids = [], []
    for i in range(n_control + n_case):
        sid = f"s{i}"
        p = tmp_path / f"{sid}.tsv.gz"
        _write_gembs(p, sid, _random_sample_rows(rng, cpg_starts, chromosome))
        paths.append(str(p))
        ids.append(sid)

    got_dir, exp_dir = tmp_path / "got", tmp_path / "exp"
    process_gembs(
        cpg,
        got_dir,
        chromosome,
        control_data_paths=paths[:n_control],
        control_id_names=ids[:n_control],
        case_data_paths=paths[n_control:],
        case_id_names=ids[n_control:],
    )
    _oracle(cpg, exp_dir, chromosome, paths[n_control:], ids[n_control:], paths[:n_control], ids[:n_control])
    _compare_outputs(
        got_dir,
        exp_dir,
        chromosome,
        [
            "positions",
            "cpg_sites_merged",
            "n_methylated_reads_control",
            "n_total_reads_control",
            "n_methylated_reads_case",
            "n_total_reads_case",
        ],
    )


@pytest.mark.parametrize(
    "group_kw",
    [
        dict(which="control"),
        dict(which="case"),
    ],
    ids=["control_only", "case_only"],
)
def test_process_gembs_single_group(tmp_path, group_kw):
    rng = np.random.default_rng(7)
    chromosome = 5
    cpg_starts = np.sort(rng.choice(np.arange(100, 2000), 20, replace=False))
    cpg = tmp_path / "cpg.tsv"
    pd.DataFrame({"seqID": f"chr{chromosome}", "start": cpg_starts}).to_csv(
        cpg, sep="\t", index=False
    )
    p = tmp_path / "s0.tsv.gz"
    _write_gembs(p, "s0", _random_sample_rows(rng, cpg_starts, chromosome))

    kw = (
        dict(control_data_paths=[str(p)], control_id_names=["s0"])
        if group_kw["which"] == "control"
        else dict(case_data_paths=[str(p)], case_id_names=["s0"])
    )
    got_dir, exp_dir = tmp_path / "got", tmp_path / "exp"
    process_gembs(cpg, got_dir, chromosome, **kw)
    _oracle(
        cpg,
        exp_dir,
        chromosome,
        kw.get("case_data_paths", []),
        kw.get("case_id_names", []),
        kw.get("control_data_paths", []),
        kw.get("control_id_names", []),
    )
    _compare_outputs(
        got_dir,
        exp_dir,
        chromosome,
        [
            "positions",
            "cpg_sites_merged",
            f"n_methylated_reads_{group_kw['which']}",
            f"n_total_reads_{group_kw['which']}",
        ],
    )


def test_process_gembs_degenerate_samples(tmp_path):
    """Empty-chromosome slice and missing-columns samples keep NaN column
    slots (zero counts, alignment preserved); a missing FILE keeps no slot at
    all — all exactly as the reference (:144-184), byte-for-byte."""
    rng = np.random.default_rng(11)
    chromosome = 8
    cpg_starts = np.sort(rng.choice(np.arange(100, 2000), 15, replace=False))
    cpg = tmp_path / "cpg.tsv"
    pd.DataFrame({"seqID": f"chr{chromosome}", "start": cpg_starts}).to_csv(
        cpg, sep="\t", index=False
    )

    good = tmp_path / "good.tsv.gz"
    _write_gembs(good, "good", _random_sample_rows(rng, cpg_starts, chromosome))
    # Rows exist but none on chr8/CG -> empty slice -> NaN slot.
    empty = tmp_path / "empty.tsv.gz"
    _write_gembs(empty, "empty", [(f"chr{chromosome + 1}", 500, "CG", 3, 4)])
    # Column names don't carry the expected sample id -> NaN slot.
    badcols = tmp_path / "badcols.tsv.gz"
    _write_gembs(badcols, "otherid", _random_sample_rows(rng, cpg_starts, chromosome))
    missing = tmp_path / "does_not_exist.tsv.gz"

    ctl_paths = [str(empty), str(good)]
    ctl_ids = ["empty", "good"]
    case_paths = [str(missing), str(badcols), str(good)]
    case_ids = ["gone", "badcols", "good"]

    got_dir, exp_dir = tmp_path / "got", tmp_path / "exp"
    process_gembs(
        cpg,
        got_dir,
        chromosome,
        control_data_paths=ctl_paths,
        control_id_names=ctl_ids,
        case_data_paths=case_paths,
        case_id_names=case_ids,
    )
    names = _oracle(cpg, exp_dir, chromosome, case_paths, case_ids, ctl_paths, ctl_ids)
    _compare_outputs(got_dir, exp_dir, chromosome, sorted(names))
    # The empty-slice sample's slot exists and is all zero.
    ctl = np.loadtxt(
        got_dir / f"n_total_reads_control_{chromosome}.txt.gz", delimiter=","
    )
    assert ctl.shape[1] == 2 and np.all(ctl[:, 0] == 0)
