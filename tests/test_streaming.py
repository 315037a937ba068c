"""Checkpointed streaming backward (two_group/streaming.py): exactness vs
enumeration, pathwise continuity across block joins, and runner integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hygeia_tpu.ops.emissions import emission_log_prob_table
from hygeia_tpu.two_group.model import State, transition_log_prob
from hygeia_tpu.two_group.streaming import streamed_inference
from tests.test_two_group_filter import default_params, _exact_forward_backward


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_pack_fill_roundtrip_merge_resets_case_duration():
    """Pack/unpack round trip over a hand-built VALID trajectory exercising
    the merge duration rule: a merge from a split state with d_k != d_c
    resets d_k to d_c_prev + 1 (model.py branch a only requires
    nxt.d_k == nxt.d_c) — including a merge that SHRINKS d_k (the round-3
    packing reconstructed it as d_k_prev + 1) and a post-merge unmerge with
    control jump where the case CONTINUES off the merged duration."""
    from hygeia_tpu.two_group.streaming import _pack_traj, _fill_block

    #           m  d_c r_c d_k r_k
    seq = [
        (0, 4, 0, 6, 1),  # block starts mid-continuation (d0 = [4, 6])
        (1, 5, 0, 5, 0),  # merge from unequal durations: d_k 6 -> 5 (SHRINK)
        (1, 6, 0, 6, 0),  # merged continuation
        (1, 1, 2, 1, 2),  # merged control changepoint (both reset bits)
        (1, 2, 2, 2, 2),
        (0, 1, 4, 3, 2),  # unmerge + control jump: case CONTINUES (d_k=3)
        (0, 2, 4, 4, 2),
        (0, 3, 4, 1, 5),  # case changepoint
        (0, 4, 4, 2, 5),
        (1, 5, 4, 5, 4),  # merge again: d_k 2 -> 5 (grow)
        (1, 6, 4, 6, 4),
    ]
    traj = np.asarray(seq, np.int32)[None, :, None, :]  # (S=1, W, B=1, 5)

    # Validity guard: every consecutive pair must have finite density so the
    # fixture can't drift from the model.
    params = default_params(R=6, min_duration=2, d_max=64)
    for t in range(len(seq) - 1):
        cur = State(*(jnp.asarray([v]) for v in seq[t]))
        nxt = State(*(jnp.asarray([v]) for v in seq[t + 1]))
        lp = np.asarray(transition_log_prob(params, cur, nxt))
        assert np.isfinite(lp).all(), (t, seq[t], seq[t + 1], lp)

    packed = np.asarray(_pack_traj(jnp.asarray(traj)))
    for split in (0, 3, 5, 6):
        out = np.empty_like(traj)
        for lo, hi in ((0, split), (split, len(seq))):
            if lo == hi:
                continue
            d0 = traj[:, lo][:, :, [1, 3]]  # (S, B, 2) first-site durations
            _fill_block(out[:, lo:hi], packed[:, lo:hi], d0)
        np.testing.assert_array_equal(out, traj, err_msg=f"split={split}")


def test_pack_fill_roundtrip_monolithic_backward():
    """Round trip real monolithic backward-simulation trajectories (full
    int32 states, independent of the streamed path) through the streamed
    pack/unpack — exact equality, with the fixture REQUIRED to contain a
    merge from an unequal-duration split state so the regression stays
    armed."""
    from hygeia_tpu.two_group.filter import run_filter
    from hygeia_tpu.two_group.backward import backward_simulation
    from hygeia_tpu.two_group.model import make_params
    from hygeia_tpu.two_group.streaming import _pack_traj, _fill_block

    R, T, M, B = 3, 160, 12, 24
    rng = np.random.default_rng(7)
    logp = np.where(np.eye(R, dtype=bool), -np.inf, rng.normal(size=(R, R)))
    with np.errstate(invalid="ignore"):
        logp = logp - np.log(
            np.nansum(np.where(np.isfinite(logp), np.exp(logp), 0.0), axis=1, keepdims=True)
        )
    params = make_params(
        mu=np.linspace(0.1, 0.9, R), sigma=np.full(R, 0.08),
        p_softmax_control=logp, omega_logit_control=rng.normal(size=R),
        omega_case=0.8, kappa_control=np.full(R, 2.0),
        kappa_case=np.full(R, 2.0),
        merge_log_prob=np.log(0.45), split_prob=0.35,  # churny merge/split
        minimum_duration=2, d_max=256, dtype=jnp.float64,
    )
    n = rng.poisson(20, size=(T, 1)).astype(np.float64)
    y = np.minimum(rng.poisson(8, size=(T, 1)), n)
    E_c = emission_log_prob_table(y, n, params.alpha, params.beta, dtype=jnp.float64)
    E_k = emission_log_prob_table(
        np.minimum(y + 4, n), n, params.alpha, params.beta, dtype=jnp.float64
    )
    res = run_filter(
        jax.random.PRNGKey(2), params, E_c, E_k, M, weight_dtype=jnp.float64
    )
    traj = np.asarray(
        backward_simulation(jax.random.PRNGKey(9), params, res.log_weights,
                            res.particles, B)
    )  # (T, B, 5)
    m, d_c, d_k = traj[..., 0], traj[..., 1], traj[..., 3]
    merge_entry = (m[1:] == 1) & (m[:-1] == 0)
    unequal = merge_entry & (d_k[:-1] != d_c[:-1])
    assert unequal.any(), "fixture must exercise merges from unequal durations"

    traj_s = traj[None]  # (S=1, T, B, 5)
    packed = np.asarray(_pack_traj(jnp.asarray(traj_s)))
    for W in (T, 64, 13):
        out = np.empty_like(traj_s)
        for lo in range(0, T, W):
            hi = min(lo + W, T)
            d0 = traj_s[:, lo][:, :, [1, 3]]
            _fill_block(out[:, lo:hi], packed[:, lo:hi], d0)
        np.testing.assert_array_equal(out, traj_s, err_msg=f"W={W}")
