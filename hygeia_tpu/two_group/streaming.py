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
instead of 4 GB — 3-4 seeds resident per chip instead of 1.

Reference scope: this replaces nothing in ucl-medical-genomics/hygeia — the
reference's only answer to segment memory is smaller Nextflow segments with
halo error (run_inference_two_groups.py:194-218). Streaming keeps the
segment exact end-to-end.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hygeia_tpu.two_group.filter import run_filter
from hygeia_tpu.two_group.backward import backward_simulation_conditioned


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
):
    """Returns (traj (S, T, B, 5) int32 np, log_z (S,) np, degenerate (S,) np).

    Seeds are vmapped inside every block dispatch; the block loop runs on
    the host (n_blocks * 3 dispatches of ~seconds each — the ~30 ms tunnel
    latency is noise).
    """
    T = emission_control.shape[0]
    M = num_resampled_ancestors
    B = num_samples_backward
    W = int(min(block_size, T))
    n_blocks = -(-T // W)
    bounds = [(b * W, min((b + 1) * W, T)) for b in range(n_blocks)]

    e_c = jnp.asarray(emission_control)
    e_k = jnp.asarray(emission_case)
    keys = jnp.asarray(keys)

    def block_key(ks, b):
        return jax.vmap(lambda k: jax.random.fold_in(k, b))(ks)

    # --- jitted per-block programs (shapes: full W and the tail remainder) --
    def _filter_block(key, ec, ek, init, use_init, return_history):
        lw0 = parts0 = None
        if init is not None:
            lw0, parts0 = init
        return run_filter(
            key,
            params,
            ec,
            ek,
            M,
            multinomial_resampling=multinomial,
            weight_dtype=weight_dtype,
            phantom_regime=phantom_regime,
            init_state=None if init is None else (lw0, parts0),
            use_init=use_init,
            return_history=return_history,
        )

    @jax.jit
    def fwd_cold(ks, ec, ek):
        def one(k):
            r = _filter_block(k, ec, ek, None, None, False)
            return r.log_weights, r.particles

        return jax.vmap(one)(ks)

    @jax.jit
    def fwd_warm(ks, ec, ek, lw0, p0):
        def one(k, l0, q0):
            r = _filter_block(k, ec, ek, (l0, q0), jnp.asarray(True), False)
            return r.log_weights, r.particles

        return jax.vmap(one)(ks, lw0, p0)

    @jax.jit
    def rev_cold(ks, bks, ec, ek, term, use_term):
        def one(k, bk, tm):
            r = _filter_block(k, ec, ek, None, None, True)
            traj = backward_simulation_conditioned(
                bk, params, r.log_weights, r.particles, tm, use_term
            )
            return traj, r.log_normalizing_constant, r.degenerate_steps

        return jax.vmap(one)(ks, bks, term)

    @jax.jit
    def rev_warm(ks, bks, ec, ek, lw0, p0, term, use_term):
        def one(k, bk, l0, q0, tm):
            r = _filter_block(k, ec, ek, (l0, q0), jnp.asarray(True), True)
            traj = backward_simulation_conditioned(
                bk, params, r.log_weights, r.particles, tm, use_term
            )
            return traj, r.log_normalizing_constant, r.degenerate_steps

        return jax.vmap(one)(ks, bks, lw0, p0, term)

    # --- forward checkpoint sweep ------------------------------------------
    ckpts = [None] * n_blocks  # ckpts[b] = final (lw, particles) of block b
    state = None
    for b, (lo, hi) in enumerate(bounds):
        if n_blocks == 1:
            break  # single block: the reverse sweep cold-starts directly
        ks = block_key(keys, b)
        if b == 0:
            state = fwd_cold(ks, e_c[lo:hi], e_k[lo:hi])
        else:
            state = fwd_warm(ks, e_c[lo:hi], e_k[lo:hi], state[0], state[1])
        if b < n_blocks - 1:
            # Only the PREVIOUS block's final state is needed as a warm
            # start during the reverse sweep.
            ckpts[b] = state

    # --- reverse conditioned-backward sweep ---------------------------------
    S = keys.shape[0]
    traj_blocks = [None] * n_blocks
    log_z = np.zeros((S,), np.float64)
    degen = np.zeros((S,), np.int64)
    term = jnp.zeros((S, B, 5), jnp.int32)  # dummy for the last block
    use_term = jnp.asarray(False)
    for b in range(n_blocks - 1, -1, -1):
        lo, hi = bounds[b]
        ks = block_key(keys, b)
        bks = jax.vmap(lambda k: jax.random.fold_in(k, 1))(ks)
        if b == 0:
            traj, lz, dg = rev_cold(
                ks, bks, e_c[lo:hi], e_k[lo:hi], term, use_term
            )
        else:
            lw0, p0 = ckpts[b - 1]
            traj, lz, dg = rev_warm(
                ks, bks, e_c[lo:hi], e_k[lo:hi], lw0, p0, term, use_term
            )
        traj_blocks[b] = np.asarray(traj)  # (S, hi-lo, B, 5)
        log_z += np.asarray(lz, np.float64)
        degen += np.asarray(dg, np.int64)
        term = jnp.asarray(traj_blocks[b][:, 0])  # first-site states -> left
        use_term = jnp.asarray(True)

    traj_full = np.concatenate(traj_blocks, axis=1)  # (S, T, B, 5)
    return traj_full, log_z, degen
