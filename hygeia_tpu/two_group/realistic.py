"""Realistically-shaped chromosome fixtures (VERDICT round-4 missing #1).

Every prior end-to-end measurement used uniform-ish synthetic inputs; real
bisulfite data (the reference's operating regime, Readme.md:20-51) has:

* NON-UNIFORM CpG spacing — CpG islands (dense runs, ~10-40 bp gaps)
  embedded in background "sea" (~hundreds of bp between CpGs). The model
  itself is index-based (transitions per CpG site, not per bp;
  singleGroup.h:560-608), so spacing only reaches the statistics through
  the DMP gap weights (get_dmps.py:79-101) — which no uniform fixture
  ever exercised off the trivial path.
* MISSINGNESS — preprocess imputes the full reference CpG lattice with
  0-read rows where a sample has no coverage (preprocess_bed.py:398-402);
  50-70% of CpGs per sample is typical for WGBS at modest depth.
* RAGGED COVERAGE — per-site read depth is overdispersed (NB-like), not
  constant.

`make_realistic_fixture` writes a preprocessed-count-dir fixture with all
three properties, with the methylation states drawn from the two-group
generative model itself, and returns the ground truth for recovery checks
(tests/test_realistic_fixture.py; tools/production_pipeline.py
HYGEIA_PROD_REALISTIC=1 measures the pipeline on it at chromosome scale).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np


class RealisticFixture(NamedTuple):
    positions: np.ndarray  # (T,) int64 genomic coordinates
    states: np.ndarray  # (T, 5) int32 true (m, d_c, r_c, d_k, r_k)
    island_mask: np.ndarray  # (T,) bool — site lies in a CpG island
    n_total_control: np.ndarray  # (T, S) float32 (0 where missing)
    n_total_case: np.ndarray


def realistic_positions(rng, n_sites, *, island_rate=0.10, start=5_010_000):
    """CpG coordinates from a two-state (island/sea) Markov chain.

    Island runs average ~35 CpGs at 2-50 bp gaps; sea runs average ~150
    CpGs at ~100-2000 bp gaps (lognormal) — hg38 chr21-like density:
    ~1 CpG / 110 bp overall, ~10% of CpGs in islands, gap distribution
    heavy-tailed. Returns (positions, island_mask)."""
    in_island = np.zeros(n_sites, bool)
    state = False
    i = 0
    while i < n_sites:
        if state:
            run = max(5, int(rng.geometric(1.0 / 35)))
        else:
            run = max(10, int(rng.geometric(1.0 / (35 / island_rate * (1 - island_rate)))))
        run = min(run, n_sites - i)
        in_island[i : i + run] = state
        i += run
        state = not state
    gaps = np.where(
        in_island,
        2 + rng.geometric(1.0 / 14, n_sites),
        np.maximum(20, rng.lognormal(np.log(300), 0.9, n_sites)).astype(np.int64),
    ).astype(np.int64)
    return start + np.cumsum(gaps), in_island


def realistic_coverage(
    rng, n_sites, n_samples, *, mean_depth=30.0, dispersion=3.0,
    missing_prob=0.55,
):
    """(T, S) total-read matrix: NB-overdispersed depth with per-(site,
    sample) dropout — missing sites carry 0 reads, exactly the imputed-row
    convention of preprocess (preprocess_bed.py:398-402)."""
    p = dispersion / (dispersion + mean_depth)
    depth = rng.negative_binomial(dispersion, p, size=(n_sites, n_samples))
    miss = rng.random((n_sites, n_samples)) < missing_prob
    return np.where(miss, 0, np.maximum(depth, 1)).astype(np.float32)


def make_realistic_fixture(
    out_dir,
    chrom,
    n_sites,
    *,
    n_samples=2,
    seed=0,
    mean_depth=30.0,
    missing_prob=0.55,
    mu=(0.95, 0.05, 0.80, 0.20, 0.50, 0.50),
    sigma=(0.05, 0.05, 0.1, 0.1, 0.1, 0.2886751),
    omega=0.9,
    omega_case=0.8,
    minimum_duration=3,
    merge_log_prob=None,
    split_prob=0.01,
) -> RealisticFixture:
    """Simulate a realistically-shaped chromosome and write the preprocessed
    count-file set (positions/n_total/n_methylated x control/case)."""
    import jax
    import jax.numpy as jnp

    from hygeia_tpu.ops.distributions import logit
    from hygeia_tpu.two_group.model import make_params
    from hygeia_tpu.two_group.simulate import simulate
    from hygeia_tpu.utils import io as hio

    rng = np.random.default_rng(seed)
    R = len(mu)
    merge_log_prob = np.log(0.1) if merge_log_prob is None else merge_log_prob

    positions, island = realistic_positions(rng, n_sites)
    n_c = realistic_coverage(
        rng, n_sites, n_samples, mean_depth=mean_depth, missing_prob=missing_prob
    )
    n_k = realistic_coverage(
        rng, n_sites, n_samples, mean_depth=mean_depth, missing_prob=missing_prob
    )

    Pd = rng.dirichlet(np.ones(R - 1), size=R)
    P = np.zeros((R, R))
    for r in range(R):
        P[r, [c for c in range(R) if c != r]] = Pd[r]
    with np.errstate(divide="ignore"):
        log_p = np.log(P)
    params = make_params(
        mu=mu,
        sigma=sigma,
        p_softmax_control=log_p,
        omega_logit_control=np.asarray(logit(jnp.full((R,), omega))),
        omega_case=omega_case,
        kappa_control=np.full(R, 2.0),
        kappa_case=np.full(R, 2.0),
        merge_log_prob=merge_log_prob,
        split_prob=split_prob,
        minimum_duration=minimum_duration,
        d_max=n_sites + 2,
    )
    sim = simulate(jax.random.PRNGKey(seed), params, n_c, n_k)

    os.makedirs(out_dir, exist_ok=True)
    hio.write_count_matrix(
        os.path.join(out_dir, f"positions_{chrom}.txt.gz"), positions
    )
    hio.write_count_matrix(
        os.path.join(out_dir, f"n_total_reads_control_{chrom}.txt.gz"), n_c
    )
    hio.write_count_matrix(
        os.path.join(out_dir, f"n_total_reads_case_{chrom}.txt.gz"), n_k
    )
    hio.write_count_matrix(
        os.path.join(out_dir, f"n_methylated_reads_control_{chrom}.txt.gz"),
        np.asarray(sim.obs_control),
    )
    hio.write_count_matrix(
        os.path.join(out_dir, f"n_methylated_reads_case_{chrom}.txt.gz"),
        np.asarray(sim.obs_case),
    )
    return RealisticFixture(
        positions=positions,
        states=np.asarray(sim.states),
        island_mask=island,
        n_total_control=n_c,
        n_total_case=n_k,
    )
