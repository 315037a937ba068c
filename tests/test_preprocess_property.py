"""Property-style preprocess parity tests against a direct port of the
reference's polars logic (preprocess_bed.py:184-263 strand collapse,
:317-327 count derivation, :398-402 site imputation, :430-473 layout).

The oracle below is an independent dict-based re-implementation of the
reference semantics — including polars'/Rust's round-half-AWAY-from-zero
(`f64::round`) where numpy's np.round would round half to even — run on
randomized fixtures that exercise: minus-only CpGs, plus-only, both strands,
zero-coverage records, exact .5 rounding, sample positions absent from the
reference CpG list, sites covered in no sample, multi-sample column
ordering, and a missing input file.
"""

import numpy as np
import pandas as pd
import pytest

from hygeia_tpu.pipeline.preprocess_bed import process_bed
from hygeia_tpu.utils import io as hio

_HEADER = [
    "chr", "start", "end", "name", "score", "strand", "thickStart",
    "thickEnd", "itemRgb", "coverage", "percent_methylated",
    "ref_genotype", "sample_genotype", "quality_score",
]


def _round_ref(x):
    """Rust f64::round — half away from zero (non-negative inputs here)."""
    return int(np.floor(x + 0.5))


def _oracle_sample(rows, chromosome):
    """Direct port of read_bed_file + collapse_strands for one sample:
    {Pos0: (methylated, unmethylated)}."""
    rows = [r for r in rows if str(r["chr"]) == str(chromosome) and r["ref_genotype"] == "CG"]
    pos = {r["end"]: r for r in rows if r["strand"] == "+"}  # key = +.end
    neg = {r["start"]: r for r in rows if r["strand"] == "-"}  # key = -.start
    out = {}
    for key in set(pos) | set(neg):
        p, n = pos.get(key), neg.get(key)
        cov_p = float(p["coverage"]) if p else 0.0
        cov_n = float(n["coverage"]) if n else 0.0
        pct_p = float(p["percent_methylated"]) if p else 0.0
        pct_n = float(n["percent_methylated"]) if n else 0.0
        total = cov_p + cov_n
        if total <= 0:
            continue  # filter total_coverage > 0 (:232)
        avg = (cov_p * pct_p + cov_n * pct_n) / total
        start = p["start"] if p else n["start"] - 1  # coalesce (:226-230)
        meth = _round_ref(total * avg / 100.0)
        unmeth = _round_ref(total * (100.0 - avg) / 100.0)
        out[start] = (meth, unmeth)
    return out


def _oracle_matrices(cpg_starts, samples, chromosome):
    """Outer-join all samples onto the reference sites (Pos0 = start - 1),
    keeping sample-only positions, imputing zeros (:281-283, :398-402)."""
    per_sample = [_oracle_sample(rows, chromosome) for rows in samples]
    positions = set(int(s) - 1 for s in cpg_starts)
    for d in per_sample:
        positions |= set(d)
    positions = sorted(positions)
    meth = np.zeros((len(positions), len(samples)))
    tot = np.zeros((len(positions), len(samples)))
    for j, d in enumerate(per_sample):
        for i, p in enumerate(positions):
            if p in d:
                m, u = d[p]
                meth[i, j] = m
                tot[i, j] = m + u
    return np.asarray(positions, np.int64), meth, tot


def _write_bed(path, rows):
    with open(path, "w") as f:
        f.write("\t".join(_HEADER) + "\n")
        for r in rows:
            f.write("\t".join(str(r[c]) for c in _HEADER) + "\n")


def _random_rows(rng, cpg_starts, chromosome):
    """Random strand records over (a superset of) the CpG list."""
    rows = []
    # Coverage/percent grids that produce exact .5 products (cov*pct/100).
    covs = [0, 1, 2, 3, 6, 10, 15]
    pcts = [0.0, 5.0, 25.0, 45.0, 50.0, 55.0, 75.0, 95.0, 100.0]

    def rec(start, end, strand, cov, pct, chrom=None, geno="CG"):
        return dict(
            chr=chrom if chrom is not None else chromosome,
            start=start, end=end, name="n", score=0, strand=strand,
            thickStart=start, thickEnd=end, itemRgb=".",
            coverage=cov, percent_methylated=pct,
            ref_genotype=geno, sample_genotype=geno, quality_score=30,
        )

    for s in cpg_starts:
        p0 = int(s) - 1  # 0-based CpG start; + record [p0, p0+1), - [p0+1, p0+2)
        kind = rng.integers(0, 5)
        if kind == 0:
            continue  # uncovered -> imputed zeros
        if kind in (1, 3):  # + strand (3 = both)
            rows.append(rec(p0, p0 + 1, "+", int(rng.choice(covs)), float(rng.choice(pcts))))
        if kind in (2, 3):  # - strand (minus-only when kind == 2)
            rows.append(rec(p0 + 1, p0 + 2, "-", int(rng.choice(covs)), float(rng.choice(pcts))))
        if kind == 4:  # zero-coverage + record only -> dropped
            rows.append(rec(p0, p0 + 1, "+", 0, float(rng.choice(pcts))))
    # Noise that must be filtered: wrong chromosome, non-CG genotype.
    rows.append(rec(10_000, 10_001, "+", 9, 50.0, chrom="99"))
    rows.append(rec(10_000, 10_001, "+", 9, 50.0, geno="CA"))
    # A covered position absent from the reference CpG list: survives the
    # outer join (:352-356) and is imputed for other samples.
    extra = int(max(cpg_starts)) + 100
    rows.append(rec(extra - 1, extra, "+", 7, 75.0))
    return rows


@pytest.mark.parametrize("trial", range(4))
def test_process_bed_matches_reference_oracle(tmp_path, trial):
    rng = np.random.default_rng(100 + trial)
    chromosome = "22"
    n_sites = 40
    cpg_starts = np.sort(rng.choice(np.arange(100, 5000), n_sites, replace=False))
    cpg = tmp_path / "cpg.tsv"
    pd.DataFrame({"seqID": chromosome, "start": cpg_starts}).to_csv(
        cpg, sep="\t", index=False
    )

    n_control, n_case = 2, 2
    all_rows, paths = [], []
    for i in range(n_control + n_case):
        rows = _random_rows(rng, cpg_starts, chromosome)
        p = tmp_path / f"s{i}.bed"
        _write_bed(p, rows)
        all_rows.append(rows)
        paths.append(str(p))

    out = tmp_path / "out"
    process_bed(
        cpg, out, chromosome,
        control_data_paths=paths[:n_control],
        control_id_names=[f"ctl{i}" for i in range(n_control)],
        case_data_paths=paths[n_control:],
        case_id_names=[f"case{i}" for i in range(n_case)],
    )

    o_pos, o_meth, o_tot = _oracle_matrices(cpg_starts, all_rows, chromosome)
    got_pos = hio.read_positions(out / f"positions_{chromosome}.txt.gz")
    np.testing.assert_array_equal(got_pos, o_pos)
    for group, sl in (("control", slice(0, n_control)), ("case", slice(n_control, None))):
        got_m = hio.read_count_matrix(out / f"n_methylated_reads_{group}_{chromosome}.txt.gz")
        got_t = hio.read_count_matrix(out / f"n_total_reads_{group}_{chromosome}.txt.gz")
        np.testing.assert_array_equal(got_m, o_meth[:, sl], err_msg=f"{group} meth")
        np.testing.assert_array_equal(got_t, o_tot[:, sl], err_msg=f"{group} total")
    n = hio.read_count_matrix(out / f"cpg_sites_merged_{chromosome}.txt.gz")
    assert int(np.ravel(n)[0]) == len(o_pos)


def test_half_rounding_matches_reference(tmp_path):
    """cov*pct/100 landing exactly on .5 must round AWAY from zero (polars/
    Rust round), not to even (np.round): cov=2 pct=25 -> 0.5 -> 1."""
    chromosome = "5"
    cpg = tmp_path / "cpg.tsv"
    pd.DataFrame({"seqID": chromosome, "start": [101, 201]}).to_csv(
        cpg, sep="\t", index=False
    )
    rows = [
        # site 100: cov 2, pct 25 -> meth 0.5 -> 1; unmeth 1.5 -> 2
        dict(zip(_HEADER, [chromosome, 100, 101, "n", 0, "+", 0, 0, ".", 2, 25.0, "CG", "CG", 30])),
        # site 200: cov 6, pct 75 -> meth 4.5 -> 5; unmeth 1.5 -> 2
        dict(zip(_HEADER, [chromosome, 200, 201, "n", 0, "+", 0, 0, ".", 6, 75.0, "CG", "CG", 30])),
    ]
    bed = tmp_path / "s.bed"
    _write_bed(bed, rows)
    out = tmp_path / "out"
    process_bed(
        cpg, out, chromosome,
        control_data_paths=[str(bed)], control_id_names=["s"],
    )
    meth = hio.read_count_matrix(out / f"n_methylated_reads_control_{chromosome}.txt.gz")
    tot = hio.read_count_matrix(out / f"n_total_reads_control_{chromosome}.txt.gz")
    np.testing.assert_array_equal(meth.ravel(), [1, 5])
    np.testing.assert_array_equal(tot.ravel(), [3, 7])


def test_missing_sample_file_keeps_column_slot(tmp_path):
    """A missing input keeps its all-zero column slot so later samples stay
    aligned (process_sample_data :288-296)."""
    chromosome = "3"
    cpg = tmp_path / "cpg.tsv"
    pd.DataFrame({"seqID": chromosome, "start": [101]}).to_csv(cpg, sep="\t", index=False)
    rows = [dict(zip(_HEADER, [chromosome, 100, 101, "n", 0, "+", 0, 0, ".", 10, 50.0, "CG", "CG", 30]))]
    bed = tmp_path / "s.bed"
    _write_bed(bed, rows)
    out = tmp_path / "out"
    process_bed(
        cpg, out, chromosome,
        control_data_paths=[str(tmp_path / "missing.bed"), str(bed)],
        control_id_names=["gone", "here"],
    )
    tot = hio.read_count_matrix(out / f"n_total_reads_control_{chromosome}.txt.gz")
    np.testing.assert_array_equal(tot, [[0, 10]])
