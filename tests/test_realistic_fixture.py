"""End-to-end pipeline run on a realistically-shaped fixture (VERDICT
round-4 missing #1): non-uniform CpG spacing (islands + sea), ~55%
per-sample missingness (0-read imputed rows), overdispersed depth. Checks
the full two-group pipeline survives realistic data AND that the DMP
machinery behaves: calls land at true split sites, and the position-gap
false-negative weights (get_dmps.py:79-101) take non-trivial values."""

import numpy as np
import pandas as pd
import pytest

from hygeia_tpu.pipeline.orchestrator import run_two_group
from hygeia_tpu.two_group.realistic import (
    make_realistic_fixture,
    realistic_coverage,
    realistic_positions,
)


def test_realistic_positions_shape():
    rng = np.random.default_rng(0)
    pos, island = realistic_positions(rng, 20_000)
    assert np.all(np.diff(pos) > 0), "positions must be strictly increasing"
    frac_island = island.mean()
    assert 0.03 < frac_island < 0.3, frac_island
    gaps = np.diff(pos)
    # Heavy-tailed: island gaps far smaller than sea gaps.
    g_island = gaps[island[1:] & island[:-1]]
    g_sea = gaps[~island[1:] & ~island[:-1]]
    assert np.median(g_island) < 30 < np.median(g_sea), (
        np.median(g_island), np.median(g_sea)
    )


def test_realistic_coverage_missingness():
    rng = np.random.default_rng(1)
    n = realistic_coverage(rng, 50_000, 2, missing_prob=0.55)
    frac_zero = (n == 0).mean()
    assert 0.5 < frac_zero < 0.6, frac_zero
    nz = n[n > 0]
    assert nz.var() > nz.mean(), "depth should be overdispersed"


@pytest.mark.slow
def test_realistic_pipeline_end_to_end(tmp_path):
    T = 6000
    fix = make_realistic_fixture(
        tmp_path / "pre", "cr", T, seed=3, missing_prob=0.55,
        split_prob=0.02,
    )
    # Sanity: both split and merged regions exist in the truth.
    split_true = fix.states[:, 0] == 0
    assert 0.02 < split_true.mean() < 0.9, split_true.mean()

    out = run_two_group(
        output_dir=tmp_path / "out",
        chroms=["cr"],
        preprocessed_dir=tmp_path / "pre",
        segment_size=3000,
        buffer_size=200,
        inference_seeds=(0,),
        num_resampled_particles=10,
        num_samples_backward=16,
        n_particles_single_group=50,
        max_retries=0,
    )
    dmp = pd.read_csv(out / "6_GET_DMPS" / "cr" / "dmp_0.05.csv")
    wdmp = pd.read_csv(out / "6_GET_DMPS" / "cr" / "weighted_dmp_0.05.csv")

    # The gap-weight path is non-trivial on realistic spacing: weights span
    # orders of magnitude (1/mean-gap, islands vs sea).
    w = wdmp["false_negative_weight"].to_numpy(float)
    assert len(w) > 0
    assert w.max() / max(w.min(), 1e-12) > 5, (w.min(), w.max())

    # DMP calls are enriched at truly-split sites: precision well above the
    # base rate of split sites.
    pos_to_idx = {p: i for i, p in enumerate(fix.positions)}
    called = np.array([pos_to_idx[p] for p in dmp["position"]])
    assert len(called) > 5, "expected some DMP calls on split-containing data"
    precision = split_true[called].mean()
    base_rate = split_true.mean()
    assert precision > min(0.9, base_rate + 0.25), (precision, base_rate)

    # Missing-data robustness: the per-site null stats exist for every
    # site incl. fully-missing rows (split_probs covers the whole lattice).
    split_probs = pd.read_csv(
        out / "5_AGGREGATE_RESULTS" / "cr" / "split_probs_cr.csv.gz", sep="\t"
    )
    assert len(split_probs) == T
