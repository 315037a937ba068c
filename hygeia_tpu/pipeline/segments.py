"""Chromosome segmentation: split a chromosome's CpG positions into
fixed-size segments of work (get_chrom_segments.py).

num_segments = 1 + n_positions // segment_size (reference :32 — note the
trailing partial segment always exists, even when n_positions is an exact
multiple; downstream batch tasks with an out-of-range index exit cleanly)."""

from __future__ import annotations

import os

import pandas as pd


def chrom_segments(n_positions: int, chromosome: str, segment_size: int) -> pd.DataFrame:
    num_segments = 1 + n_positions // segment_size
    return pd.DataFrame(
        {"chrom": [chromosome] * num_segments, "segment_index": range(num_segments)}
    )


def write_chrom_segments(input_file, chromosome, segment_size, output_csv):
    positions = pd.read_csv(input_file, header=None, names=["position"], compression="gzip")
    df = chrom_segments(len(positions), chromosome, segment_size)
    out_dir = os.path.dirname(output_csv)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    df.to_csv(output_csv, index=False)
    return df
