"""Checkpointed streaming backward (two_group/streaming.py): exactness vs
enumeration, pathwise continuity across block joins, and runner integration."""

import numpy as np
import jax
import jax.numpy as jnp

from hygeia_tpu.ops.emissions import emission_log_prob_table
from hygeia_tpu.two_group.model import State, transition_log_prob
from hygeia_tpu.two_group.streaming import streamed_inference
from tests.test_two_group_filter import default_params, _exact_forward_backward


def test_streamed_matches_exact_inference():
    """Streamed (2-block) smoothing marginals and logZ agree with exact
    forward-backward enumeration — same oracle the monolithic path passes
    (tests/test_two_group_filter.py)."""
    T, R = 10, 3
    params = default_params(R=R, min_duration=2, d_max=32)
    rng = np.random.default_rng(11)
    n_c = rng.poisson(25, size=(T, 1)).astype(np.float64)
    n_k = rng.poisson(25, size=(T, 1)).astype(np.float64)
    y_c = np.minimum(rng.poisson(10, size=(T, 1)), n_c)
    y_k = np.minimum(rng.poisson(10, size=(T, 1)), n_k)
    E_c = emission_log_prob_table(y_c, n_c, params.alpha, params.beta, dtype=jnp.float64)
    E_k = emission_log_prob_table(y_k, n_k, params.alpha, params.beta, dtype=jnp.float64)

    M, B = 60, 4000
    phantom_r = 1
    keys = jnp.stack([jax.random.PRNGKey(0)])
    traj, log_z, degen = streamed_inference(
        keys, params, E_c, E_k, M, B, block_size=5,
        weight_dtype=jnp.float64, phantom_regime=phantom_r,
    )
    assert degen[0] == 0
    assert traj.shape == (1, T, B, 5)

    log_z_exact, split_exact, ctrl_exact, case_exact = _exact_forward_backward(
        params, E_c, E_k, phantom_r, T
    )
    np.testing.assert_allclose(log_z[0], log_z_exact, rtol=0, atol=0.05)
    split_pf = (traj[0, :, :, 0] == 0).mean(axis=1)
    np.testing.assert_allclose(split_pf, split_exact, atol=0.05)
    ctrl_pf = np.stack(
        [(traj[0, :, :, 2] == r).mean(axis=1) for r in range(R)], -1
    )
    case_pf = np.stack(
        [(traj[0, :, :, 4] == r).mean(axis=1) for r in range(R)], -1
    )
    np.testing.assert_allclose(ctrl_pf, ctrl_exact, atol=0.05)
    np.testing.assert_allclose(case_pf, case_exact, atol=0.05)


def test_streamed_trajectories_are_pathwise_continuous():
    """Every consecutive sampled pair — INCLUDING across block joins — must
    have a finite transition density: the conditioned per-block backward is
    the exact pathwise factorisation, not a marginal coupling."""
    T, R, M, B = 40, 3, 12, 16
    params = default_params(R=R, min_duration=2, d_max=64)
    rng = np.random.default_rng(5)
    n = rng.poisson(25, size=(T, 2)).astype(np.float64)
    y = np.minimum(rng.poisson(9, size=(T, 2)), n)
    E_c = emission_log_prob_table(y, n, params.alpha, params.beta, dtype=jnp.float64)
    E_k = emission_log_prob_table(
        np.minimum(y + 2, n), n, params.alpha, params.beta, dtype=jnp.float64
    )
    keys = jnp.stack([jax.random.PRNGKey(3), jax.random.PRNGKey(4)])
    traj, log_z, degen = streamed_inference(
        keys, params, E_c, E_k, M, B, block_size=16, weight_dtype=jnp.float64
    )
    assert np.all(degen == 0) and np.all(np.isfinite(log_z))
    for s in range(traj.shape[0]):
        for t in range(T - 1):
            cur = State(*(jnp.asarray(traj[s, t, :, i]) for i in range(5)))
            nxt = State(*(jnp.asarray(traj[s, t + 1, :, i]) for i in range(5)))
            lp = np.asarray(transition_log_prob(params, cur, nxt))
            assert np.all(np.isfinite(lp)), (s, t, lp)


def test_infer_segment_streaming_writes_same_files(tmp_path):
    """runner.infer_segment(streaming_blocks=W) produces the sequential
    path's exact file set with matching shapes, and statistically-consistent
    split probabilities."""
    from hygeia_tpu.two_group.runner import infer_segment
    from hygeia_tpu.single_group.model import parameters_to_theta
    from hygeia_tpu.utils import io as hio

    R, T = 6, 90
    rng = np.random.default_rng(0)
    P = np.full((R, R), 1.0 / (R - 1))
    np.fill_diagonal(P, 0.0)
    data, sg = tmp_path / "data", tmp_path / "sg"
    data.mkdir(), sg.mkdir()
    hio.write_theta(sg / "theta_s.csv.gz", parameters_to_theta(P, np.full(R, 0.9)))
    n = rng.poisson(30, size=(T, 2)).astype(np.float32)
    y = np.minimum(rng.poisson(9, size=(T, 2)), n).astype(np.float32)
    hio.write_count_matrix(data / "positions_s.txt.gz", np.arange(1, T + 1) * 7)
    hio.write_count_matrix(data / "n_total_reads_control_s.txt.gz", n)
    hio.write_count_matrix(data / "n_total_reads_case_s.txt.gz", n)
    hio.write_count_matrix(data / "n_methylated_reads_control_s.txt.gz", y)
    hio.write_count_matrix(
        data / "n_methylated_reads_case_s.txt.gz", np.minimum(y + 3, n)
    )

    common = dict(
        data_dir=str(data), single_group_dir=str(sg), chrom="s", batch=0,
        seed=[0, 1], segment_size=90, buffer_size=10,
        num_resampled_particles=(6,), num_samples_backward=16,
    )
    infer_segment(results_dir=str(tmp_path / "mono"), **common)
    infer_segment(
        results_dir=str(tmp_path / "stream"), streaming_blocks=32, **common
    )
    mono = tmp_path / "mono" / "chrom_s_0"
    stream = tmp_path / "stream" / "chrom_s_0"
    m_files = sorted(p.name for p in mono.iterdir())
    s_files = sorted(p.name for p in stream.iterdir())
    assert m_files == s_files
    for name in m_files:
        if name.endswith(".npz"):
            e = np.load(mono / name)["arr_0"]
            g = np.load(stream / name)["arr_0"]
            assert e.shape == g.shape, name
            assert e.dtype == g.dtype, name
    N = 6 * (2 * R + R * R)
    sp_m = np.load(mono / f"optimal_split_probs_{N}_0.npz")["arr_0"]
    sp_s = np.load(stream / f"optimal_split_probs_{N}_0.npz")["arr_0"]
    assert float(np.abs(sp_m - sp_s).mean()) < 0.25


def test_streamed_cross_segment_batching_matches_per_unit_runs():
    """3-D (S, T, R) emissions batch DIFFERENT segments into one streamed
    dispatch (cross-segment residency — PERF.md: residency is throughput).
    Each batched unit must reproduce its own single-unit run exactly: the
    per-unit key stream and block structure are identical, vmap only adds a
    leading lane."""
    T, R = 12, 3
    params = default_params(R=R, min_duration=2, d_max=32)
    rng = np.random.default_rng(23)
    E = []
    for _ in range(2):
        n_c = rng.poisson(25, size=(T, 1)).astype(np.float64)
        n_k = rng.poisson(25, size=(T, 1)).astype(np.float64)
        y_c = np.minimum(rng.poisson(10, size=(T, 1)), n_c)
        y_k = np.minimum(rng.poisson(10, size=(T, 1)), n_k)
        E.append(
            (
                emission_log_prob_table(y_c, n_c, params.alpha, params.beta, dtype=jnp.float64),
                emission_log_prob_table(y_k, n_k, params.alpha, params.beta, dtype=jnp.float64),
            )
        )
    M, B = 40, 50
    keys = jnp.stack([jax.random.PRNGKey(3), jax.random.PRNGKey(7)])
    E_c = jnp.stack([e[0] for e in E])
    E_k = jnp.stack([e[1] for e in E])
    traj_b, lz_b, dg_b = streamed_inference(
        keys, params, E_c, E_k, M, B, block_size=5,
        weight_dtype=jnp.float64, phantom_regime=1,
    )
    for u in range(2):
        traj_u, lz_u, dg_u = streamed_inference(
            keys[u : u + 1], params, E[u][0], E[u][1], M, B, block_size=5,
            weight_dtype=jnp.float64, phantom_regime=1,
        )
        np.testing.assert_array_equal(traj_b[u], traj_u[0])
        np.testing.assert_allclose(lz_b[u], lz_u[0], rtol=1e-12)
        assert dg_b[u] == dg_u[0]


def test_infer_chromosome_streamed_matches_per_batch(tmp_path):
    """Cross-segment batched chromosome INFER (runner.infer_chromosome_
    streamed) writes BIT-IDENTICAL outputs to per-batch
    infer_segment(streaming_blocks=W) runs — same per-unit keys, same
    per-window-length d_max; only the optimal_time_* files may differ."""
    from hygeia_tpu.two_group.runner import (
        infer_chromosome_streamed,
        infer_segment,
    )
    from hygeia_tpu.single_group.model import parameters_to_theta
    from hygeia_tpu.utils import io as hio

    R, T = 6, 200
    rng = np.random.default_rng(5)
    P = np.full((R, R), 1.0 / (R - 1))
    np.fill_diagonal(P, 0.0)
    data, sg = tmp_path / "data", tmp_path / "sg"
    data.mkdir(), sg.mkdir()
    hio.write_theta(sg / "theta_c.csv.gz", parameters_to_theta(P, np.full(R, 0.9)))
    n = rng.poisson(30, size=(T, 2)).astype(np.float32)
    y = np.minimum(rng.poisson(9, size=(T, 2)), n).astype(np.float32)
    hio.write_count_matrix(data / "positions_c.txt.gz", np.arange(1, T + 1) * 7)
    hio.write_count_matrix(data / "n_total_reads_control_c.txt.gz", n)
    hio.write_count_matrix(data / "n_total_reads_case_c.txt.gz", n)
    hio.write_count_matrix(data / "n_methylated_reads_control_c.txt.gz", y)
    hio.write_count_matrix(
        data / "n_methylated_reads_case_c.txt.gz", np.minimum(y + 3, n)
    )

    common = dict(
        data_dir=str(data), single_group_dir=str(sg), chrom="c",
        seed=[0, 1], segment_size=70, buffer_size=10,
        num_resampled_particles=(6,), num_samples_backward=8,
    )
    # 3 batches with 3 distinct window lengths (80 / 90 / 70) -> exercises
    # the window-length grouping; 2 seeds -> 6 units total.
    infer_chromosome_streamed(
        results_dir=str(tmp_path / "batched"), streaming_blocks=32, **common
    )
    for batch in range(3):
        infer_segment(
            results_dir=str(tmp_path / "perbatch"), batch=batch,
            streaming_blocks=32, **common
        )
    for batch in range(3):
        a = tmp_path / "batched" / f"chrom_c_{batch}"
        b = tmp_path / "perbatch" / f"chrom_c_{batch}"
        a_files = sorted(p.name for p in a.iterdir())
        b_files = sorted(p.name for p in b.iterdir())
        assert a_files == b_files, batch
        for name in a_files:
            if name.startswith("optimal_time"):
                continue
            if name.endswith(".npz"):
                x = np.load(a / name)["arr_0"]
                z = np.load(b / name)["arr_0"]
                np.testing.assert_array_equal(x, z, err_msg=f"{batch}/{name}")
            elif name.endswith(".gz"):
                # gzip headers embed an mtime; compare decompressed bytes.
                import gzip

                assert gzip.decompress(
                    (a / name).read_bytes()
                ) == gzip.decompress((b / name).read_bytes()), (batch, name)
            else:
                assert (a / name).read_bytes() == (b / name).read_bytes(), (
                    batch,
                    name,
                )
