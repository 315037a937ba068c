"""Preprocessing test: synthetic BED files through the `preprocess` verb,
checking strand collapse, count computation, and reference-site imputation."""

import gzip

import numpy as np
import pandas as pd

from hygeia_tpu.cli import main as cli_main
from hygeia_tpu.utils import io as hio


def _write_bed(path, rows):
    header = "\t".join(
        [
            "chr", "start", "end", "name", "score", "strand", "thickStart",
            "thickEnd", "itemRgb", "coverage", "percent_methylated",
            "ref_genotype", "sample_genotype", "quality_score",
        ]
    )
    with open(path, "w") as f:
        f.write(header + "\n")
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")


def test_preprocess_bed(tmp_path):
    # Reference CpG list: sites at 1-based starts 101, 201, 301.
    cpg = tmp_path / "cpg.tsv"
    pd.DataFrame({"seqID": ["22", "22", "22", "21"], "start": [101, 201, 301, 50]}).to_csv(
        cpg, sep="\t", index=False
    )

    # Sample: CpG at 100 covered on both strands (+: start=100 end=101,
    # -: start=101 end=102), CpG at 200 only on the minus strand, site 300
    # uncovered (must be imputed with zeros).
    bed = tmp_path / "s1.bed"
    base = ("n", 0, ".", 0, 0, ".")
    _write_bed(
        bed,
        [
            ["22", 100, 101, "n", 0, "+", 0, 0, ".", 10, 50.0, "CG", "CG", 30],
            ["22", 101, 102, "n", 0, "-", 0, 0, ".", 6, 100.0, "CG", "CG", 30],
            ["22", 201, 202, "n", 0, "-", 0, 0, ".", 8, 25.0, "CG", "CG", 30],
            # wrong chromosome / non-CG rows must be ignored
            ["21", 100, 101, "n", 0, "+", 0, 0, ".", 9, 10.0, "CG", "CG", 30],
            ["22", 400, 401, "n", 0, "+", 0, 0, ".", 9, 10.0, "CA", "CA", 30],
        ],
    )

    out = tmp_path / "out"
    cli_main(
        [
            "preprocess",
            "--cpg_file_path", str(cpg),
            "--output_path", str(out),
            "--control_data_path", str(bed),
            "--control_id_names", "s1",
            "--chromosome", "22",
        ]
    )

    positions = hio.read_positions(out / "positions_22.txt.gz")
    np.testing.assert_array_equal(positions, [100, 200, 300])
    meth = hio.read_count_matrix(out / "n_methylated_reads_control_22.txt.gz")
    total = hio.read_count_matrix(out / "n_total_reads_control_22.txt.gz")
    # Site 100: cov 16, weighted pct = (10*50 + 6*100)/16 = 68.75 -> meth 11.
    # Site 200: minus-only, position = 201 - 1 = 200, cov 8, pct 25 -> meth 2.
    # Site 300: imputed zeros.
    np.testing.assert_array_equal(total.ravel(), [16, 8, 0])
    np.testing.assert_array_equal(meth.ravel(), [11, 2, 0])
    n = hio.read_count_matrix(out / "cpg_sites_merged_22.txt.gz")
    assert int(n.ravel()[0]) == 3
