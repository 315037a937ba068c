"""Streaming (checkpointed) filter + backward simulation: O(block) memory.

The monolithic path (runner.infer_segment) materialises the full (T, N)
filter history — ~4 GB at the production shape (T=110k, N=2400), which caps
a 16 GB v5e at ONE seed per dispatch (XLA holds ~2x the history inside the
fused program; a 2-seed dispatch over-subscribed HBM 12x-slower, PERF.md).
Throughput on this latency-bound workload comes from independent work units
amortising the per-step serial chain, so residency IS throughput.

This module trades one extra filter sweep for O(W) history memory — the
classic checkpoint/rematerialisation scheme, expressed with machinery the
engine already has:

1. FORWARD: per genome block of W sites, run the filter with
   ``return_history=False`` (identical realisation to the history-returning
   filter — same keys — unlike run_filter_final) warm-started from the
   previous block's final state. Store only the (N,)-sized per-block final
   states (checkpoints).
2. REVERSE: walk blocks right-to-left. Re-run block b's filter (same key,
   same warm start -> bit-identical history, O(W*N) live at once), then
   sample its trajectory segment with ``backward_simulation_conditioned``
   against the first-site states of the ALREADY-SAMPLED block b+1 — the
   exact pathwise backward factorisation x_t | x_{t+1} (the last block draws
   its terminal from the final weights, reproducing backward_simulation).

The result is an EXACT draw from the same smoothing distribution the
monolithic backward samples (per-block keys differ from the monolithic
stream, so realisations are statistically — not bitwise — equivalent;
tests/test_streaming.py checks logZ + marginals against the monolithic path
and exact enumeration, and pathwise continuity across block joins).

Memory per seed: one (W, N) block history (~0.6 GB at W=16384, N=2400)
instead of 4 GB — 8+ seeds resident per chip instead of 1 (8 measured on
the v5e; PERF.md round-3 streaming table).

The per-block programs are built ONCE per static configuration and cached
at module level with the model parameters passed as jit arguments — a
previous revision rebuilt four jax.jit objects inside every call, paying
~15 s/program of retrace + remote-compile-cache lookup per segment.

Reference scope: this replaces nothing in ucl-medical-genomics/hygeia — the
reference's only answer to segment memory is smaller Nextflow segments with
halo error (run_inference_two_groups.py:194-218). Streaming keeps the
segment exact end-to-end.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from hygeia_tpu.two_group.filter import run_filter
from hygeia_tpu.two_group.backward import backward_simulation_conditioned

# (M, B, multinomial, weight_dtype, phantom, n_regimes, min_duration) ->
# dict of jitted programs. TwoGroupParams' array leaves ride as jit
# arguments (no constant-embedding, no per-call retrace); its two static
# int fields are baked in via the cache key. Shapes (W vs tail, seed count)
# are handled by jit's own shape cache.
_PROGRAMS = {}


def _programs(M, B, multinomial, weight_dtype, phantom_regime, params):
    from hygeia_tpu.two_group.model import TwoGroupParams

    cfg = (
        M,
        B,
        multinomial,
        jnp.dtype(weight_dtype).name,
        phantom_regime,
        params.n_regimes,
        params.min_duration,
    )
    if cfg in _PROGRAMS:
        return _PROGRAMS[cfg]
    n_regimes, min_duration = params.n_regimes, params.min_duration

    def _filter_block(arrs, key, ec, ek, init, use_init, return_history):
        params = TwoGroupParams(n_regimes, min_duration, *arrs)
        return run_filter(
            key,
            params,
            ec,
            ek,
            M,
            multinomial_resampling=multinomial,
            weight_dtype=weight_dtype,
            phantom_regime=phantom_regime,
            init_state=init,
            use_init=use_init,
            return_history=return_history,
        )

    @jax.jit
    def fwd_cold(arrs, ks, ec, ek):
        def one(k):
            r = _filter_block(arrs, k, ec, ek, None, None, False)
            return r.log_weights, r.particles

        return jax.vmap(one)(ks)

    @jax.jit
    def fwd_warm(arrs, ks, ec, ek, lw0, p0):
        def one(k, l0, q0):
            r = _filter_block(
                arrs, k, ec, ek, (l0, q0), jnp.asarray(True), False
            )
            return r.log_weights, r.particles

        return jax.vmap(one)(ks, lw0, p0)

    def _pack(traj):
        # Trajectory D2H rides a ~21 MB/s tunnel that does NOT overlap
        # compute, so the transfer is packed: (m, r_c, r_k) int8 + the two
        # durations int32 — 11 B/element instead of 20 B (field order is
        # State's (m, d_c, r_c, d_k, r_k)).
        small = traj[..., jnp.array([0, 2, 4])].astype(jnp.int8)
        dur = traj[..., jnp.array([1, 3])]
        return small, dur

    @jax.jit
    def rev_cold(arrs, ks, bks, ec, ek, term, use_term):
        params = TwoGroupParams(n_regimes, min_duration, *arrs)

        def one(k, bk, tm):
            r = _filter_block(arrs, k, ec, ek, None, None, True)
            traj = backward_simulation_conditioned(
                bk, params, r.log_weights, r.particles, tm, use_term
            )
            return _pack(traj), r.log_normalizing_constant, r.degenerate_steps

        return jax.vmap(one)(ks, bks, term)

    @jax.jit
    def rev_warm(arrs, ks, bks, ec, ek, lw0, p0, term, use_term):
        params = TwoGroupParams(n_regimes, min_duration, *arrs)

        def one(k, bk, l0, q0, tm):
            r = _filter_block(
                arrs, k, ec, ek, (l0, q0), jnp.asarray(True), True
            )
            traj = backward_simulation_conditioned(
                bk, params, r.log_weights, r.particles, tm, use_term
            )
            return _pack(traj), r.log_normalizing_constant, r.degenerate_steps

        return jax.vmap(one)(ks, bks, lw0, p0, term)

    progs = {
        "fwd_cold": fwd_cold,
        "fwd_warm": fwd_warm,
        "rev_cold": rev_cold,
        "rev_warm": rev_warm,
    }
    _PROGRAMS[cfg] = progs
    return progs


def streamed_inference(
    keys,  # (S, 2) uint32 — one PRNG key per seed
    params,
    emission_control,  # (T, R)
    emission_case,  # (T, R)
    num_resampled_ancestors: int,
    num_samples_backward: int,
    *,
    block_size: int = 16384,
    multinomial=False,
    weight_dtype=jnp.float32,
    phantom_regime=None,
    timings: dict | None = None,
):
    """Returns (traj (S, T, B, 5) int32 np, log_z (S,) np, degenerate (S,) np).

    Seeds are vmapped inside every block dispatch; the block loop runs on
    the host (n_blocks * 3 dispatches of ~seconds each — the ~30 ms tunnel
    latency is noise). Pass ``timings={}`` to capture per-dispatch walls
    (lists keyed "fwd"/"rev"/"pull", seconds) for the perf harness.
    """
    T = emission_control.shape[0]
    B = num_samples_backward
    W = int(min(block_size, T))
    n_blocks = -(-T // W)
    bounds = [(b * W, min((b + 1) * W, T)) for b in range(n_blocks)]

    pg = _programs(
        num_resampled_ancestors, B, multinomial, weight_dtype, phantom_regime,
        params,
    )
    arrs = tuple(params[2:])  # array leaves; statics ride in the program cfg
    e_c = jnp.asarray(emission_control)
    e_k = jnp.asarray(emission_case)
    keys = jnp.asarray(keys)

    def _t(kind, fn):
        if timings is None:
            return fn()
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        timings.setdefault(kind, []).append(time.perf_counter() - t0)
        return out

    def block_key(ks, b):
        return jax.vmap(lambda k: jax.random.fold_in(k, b))(ks)

    # --- forward checkpoint sweep ------------------------------------------
    ckpts = [None] * n_blocks  # ckpts[b] = final (lw, particles) of block b
    state = None
    for b, (lo, hi) in enumerate(bounds):
        if n_blocks == 1:
            break  # single block: the reverse sweep cold-starts directly
        ks = block_key(keys, b)
        if b == 0:
            state = _t("fwd", lambda: pg["fwd_cold"](arrs, ks, e_c[lo:hi], e_k[lo:hi]))
        else:
            state = _t(
                "fwd",
                lambda: pg["fwd_warm"](
                    arrs, ks, e_c[lo:hi], e_k[lo:hi], state[0], state[1]
                ),
            )
        if b < n_blocks - 1:
            # Only the PREVIOUS block's final state is needed as a warm
            # start during the reverse sweep.
            ckpts[b] = state

    # --- reverse conditioned-backward sweep ---------------------------------
    # Trajectory blocks stay ON DEVICE during the sweep with asynchronous
    # host copies kicked off as soon as each block is sampled, so the
    # ~21 MB/s tunnel D2H transfer overlaps the next block's compute
    # (synchronous per-block np.asarray pulls serialized ~1.6 s/block).
    # The next block only needs the (S, B, 5) first-site states, which are
    # sliced device-side (the previous revision round-tripped them through
    # the host copy).
    S = keys.shape[0]
    dev_blocks = [None] * n_blocks
    log_z = np.zeros((S,), np.float64)
    degen = np.zeros((S,), np.int64)
    term = jnp.zeros((S, B, 5), jnp.int32)  # dummy for the last block
    use_term = jnp.asarray(False)
    for b in range(n_blocks - 1, -1, -1):
        lo, hi = bounds[b]
        ks = block_key(keys, b)
        bks = jax.vmap(lambda k: jax.random.fold_in(k, 1))(ks)
        if b == 0:
            (small, dur), lz, dg = _t(
                "rev",
                lambda: pg["rev_cold"](
                    arrs, ks, bks, e_c[lo:hi], e_k[lo:hi], term, use_term
                ),
            )
        else:
            lw0, p0 = ckpts[b - 1]
            (small, dur), lz, dg = _t(
                "rev",
                lambda: pg["rev_warm"](
                    arrs, ks, bks, e_c[lo:hi], e_k[lo:hi], lw0, p0, term, use_term
                ),
            )
        dev_blocks[b] = (small, dur)  # packed, device-resident
        log_z += np.asarray(lz, np.float64)
        degen += np.asarray(dg, np.int64)
        # First-site states for the left neighbour, assembled device-side in
        # State field order (m, d_c, r_c, d_k, r_k).
        s0, d0 = small[:, 0].astype(jnp.int32), dur[:, 0]
        term = jnp.stack(
            [s0[..., 0], d0[..., 0], s0[..., 1], d0[..., 1], s0[..., 2]],
            axis=-1,
        )
        use_term = jnp.asarray(True)

    # Pull the packed blocks (11 B/element vs 20 unpacked — the tunnel D2H
    # is the production bottleneck at ~21 MB/s) and reassemble on host.
    traj_full = np.empty((S, T, B, 5), np.int32)
    for b, (lo, hi) in enumerate(bounds):
        small, dur = dev_blocks[b]
        small_h = _t("pull", lambda: np.asarray(small))
        dur_h = _t("pull", lambda: np.asarray(dur))
        blk = traj_full[:, lo:hi]
        blk[..., 0] = small_h[..., 0]
        blk[..., 2] = small_h[..., 1]
        blk[..., 4] = small_h[..., 2]
        blk[..., 1] = dur_h[..., 0]
        blk[..., 3] = dur_h[..., 1]
    return traj_full, log_z, degen
