"""Coverage tests for secondary components: robust emissions, gemBS
preprocessing, segment windows, logZ replicates, FDR procedures."""

import numpy as np
import pandas as pd
import pytest
import scipy.stats as st
import jax.numpy as jnp

from hygeia_tpu.ops.distributions import mu_sigma_to_alpha_beta
from hygeia_tpu.ops.emissions import robust_emission_log_prob_table
from hygeia_tpu.two_group.runner import segment_window
from hygeia_tpu.pipeline.multiple_testing import fdr_procedure, weighted_fdr_procedure


def test_robust_emission_matches_direct_tsallis_score():
    """Against a direct scipy computation of the beta-divergence score with
    the reference's support bound x in 0..max(n)-1 (robust_beta_binomial.py:29-38)."""
    rng = np.random.default_rng(0)
    T, S, R = 6, 2, 3
    mu = np.array([0.2, 0.5, 0.8])
    sigma = np.full(R, 0.1)
    a, b = map(np.asarray, mu_sigma_to_alpha_beta(mu, sigma))
    n = rng.poisson(15, size=(T, S)).astype(float)
    y = np.minimum(rng.poisson(6, size=(T, S)), n)
    beta_div = 0.05
    table = np.asarray(
        robust_emission_log_prob_table(y, n, a, b, beta_div, dtype=jnp.float64)
    )
    max_n = int(n.max())
    xs = np.arange(max_n)
    for t in range(T):
        for r in range(R):
            expected = 0.0
            for s in range(S):
                f_y = st.betabinom.pmf(y[t, s], n[t, s], a[r], b[r])
                f_x = st.betabinom.pmf(xs, n[t, s], a[r], b[r])
                f_x = np.where(xs <= n[t, s], f_x, 0.0)
                expected += (
                    f_y**beta_div / beta_div
                    - np.sum(f_x ** (beta_div + 1.0)) / (beta_div + 1.0)
                )
            np.testing.assert_allclose(
                table[t, r], expected, rtol=1e-5, err_msg=f"t={t} r={r}"
            )


def test_preprocess_gembs(tmp_path):
    from hygeia_tpu.pipeline.preprocess_gembs import process_gembs
    from hygeia_tpu.utils import io as hio

    cpg = tmp_path / "cpg.tsv"
    pd.DataFrame({"seqID": ["chr22", "chr22"], "start": [101, 201]}).to_csv(
        cpg, sep="\t", index=False
    )
    sample = tmp_path / "s1.tsv"
    pd.DataFrame(
        {
            "Contig": ["chr22", "chr22", "chr21"],
            "Ref": ["CG", "CG", "CG"],
            "Pos0": [100, 300, 50],
            "s1:non_conv": [4, 7, 9],
            "s1:conv": [6, 3, 1],
        }
    ).to_csv(sample, sep="\t", index=False)
    n = process_gembs(
        cpg, tmp_path / "out", "22",
        control_data_paths=[sample], control_id_names=["s1"],
    )
    # Reference positions (100, 200) outer-joined with the sample's (100, 300).
    positions = hio.read_positions(tmp_path / "out" / "positions_22.txt.gz")
    np.testing.assert_array_equal(positions, [100, 200, 300])
    meth = hio.read_count_matrix(tmp_path / "out" / "n_methylated_reads_control_22.txt.gz")
    total = hio.read_count_matrix(tmp_path / "out" / "n_total_reads_control_22.txt.gz")
    np.testing.assert_array_equal(meth.ravel(), [4, 0, 7])
    np.testing.assert_array_equal(total.ravel(), [10, 0, 10])


def test_segment_window_matches_reference_formula():
    """run_inference_two_groups.py:194-218 semantics."""
    n, S, B = 250_000, 100_000, 5_000
    # Batch 0: [0, S+B), return [0, S).
    sl, ret = segment_window(n, 0, S, B)
    assert (sl.start, sl.stop) == (0, S + B)
    assert (ret.start, ret.stop) == (0, S)
    # Batch 1: [S-B, 2S+B), return [B, B+S).
    sl, ret = segment_window(n, 1, S, B)
    assert (sl.start, sl.stop) == (S - B, 2 * S + B)
    assert (ret.start, ret.stop) == (B, B + S)
    # Batch 2 (truncated at chromosome end): the return range is capped at
    # the sliced length (run_inference_two_groups.py:218 applies min() to the
    # already-sliced positions array).
    sl, ret = segment_window(n, 2, S, B)
    assert (sl.start, sl.stop) == (2 * S - B, n)
    assert (ret.start, ret.stop) == (B, n - (2 * S - B))
    # Out-of-range batch.
    assert segment_window(n, 3, S, B) is None


def test_fdr_procedures_reference_semantics():
    stats = np.array([0.001, 0.002, 0.5, 0.9, 0.95])
    s, q, cutoff = fdr_procedure(stats, 0.05)
    # Mean of the two smallest = 0.0015 <= 0.05; adding 0.5 exceeds it.
    assert s == 2
    assert cutoff == 0.5
    # Threshold below the smallest stat: nothing selected.
    assert fdr_procedure(stats, 0.0001) == (0, 0.0, 0.0)
    # Everything passes.
    s, q, cutoff = fdr_procedure(np.array([0.001, 0.002]), 0.5)
    assert s == 2 and cutoff == 1.01

    # Weighted: uniform weights select a prefix with negative excess rate.
    idx, total = weighted_fdr_procedure(
        stats, 0.05, np.ones(5), np.ones(5)
    )
    assert set(idx.tolist()) == {0, 1}


def test_write_count_matrix_savetxt_byte_identity(tmp_path):
    """write_count_matrix's claim (utils/io.py) is BYTE-identity with
    np.savetxt(fmt="%s") after decompression — the property the stage-1
    count/position files' reference parity rests on. Regression-guard it so
    a pandas float-formatting change cannot silently alter outputs."""
    import gzip
    import io as _io

    from hygeia_tpu.utils.io import write_count_matrix

    rng = np.random.default_rng(3)
    f32 = np.round(
        rng.random((200, 3)) * rng.integers(1, 50, (200, 3)), 3
    ).astype(np.float32)
    f32[0, 0] = 0.0
    f32[1, 1] = 17.0  # integral-valued float
    i64 = rng.integers(0, 2**40, (150,)).astype(np.int64)
    for name, arr in (("f32", f32), ("i64", i64)):
        p = tmp_path / f"{name}.txt.gz"
        write_count_matrix(p, arr)
        with gzip.open(p, "rb") as f:
            got = f.read()
        buf = _io.BytesIO()
        np.savetxt(buf, arr if arr.ndim > 1 else arr[:, None], fmt="%s", delimiter=",")
        assert got == buf.getvalue(), f"{name}: bytes differ from np.savetxt"


def test_approximate_log_normalizing_constant_replicates():
    from hygeia_tpu.single_group.runner import approximate_log_normalizing_constant

    rng = np.random.default_rng(1)
    T = 60
    n = rng.poisson(20, size=(T, 2)).astype(float)
    y = np.minimum(rng.poisson(8, size=(T, 2)), n)
    out = approximate_log_normalizing_constant(
        n_replicates=3,
        n_methylated_reads=y,
        n_total_reads=n,
        mu=(0.2, 0.5, 0.8),
        sigma=(0.1, 0.1, 0.1),
        u=2,
        kappa=(2.0,) * 3,
        omega=(0.9, 0.9, 0.9),
        n_particles=40,
    )
    assert out.shape == (3,)
    assert np.isfinite(out).all()
    # Replicates of the same data should agree closely (small MC error).
    assert np.std(out) < 2.0
