"""Backward simulation over the stored filter history.

Mirrors backward_simulation (filter_and_smoother_algorithm.py:368-446): draw
B terminal particles from the final weights, then walk backwards sampling
ancestors from the backward kernel

    B_t(b, n)  propto  w_t^n * f(x_{t+1}^b | x_t^n)

(compute_log_backward_kernel_from_transition_matrix, smoothing_functions.py:
27-44). The reference's reverse tf.while_loop with boolean-masked dynamic
shapes becomes a reverse ``lax.scan`` over static (B, N) logits — dead
particle slots are excluded by their -inf weights instead of masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hygeia_tpu.two_group.model import State, TwoGroupParams, transition_log_prob

_NEG_INF = -jnp.inf


# NOTE on hazard lookups: round 1 precomputed a (T, N) "_hazard_history" for
# the whole particle history and threaded it through the scan. MEASURED ON
# CHIP (tools/bisect_backward.py, T=4096 x 8 units): per-step gather_rho at
# (1, N) inside the scan body is 15% FASTER (0.55 s vs 0.64 s) — the hoisted
# tables add two (T, N) f32 scan inputs whose per-step slicing costs more
# than the row-gather they save — and the hoist's 2 x T x N x 4 B footprint
# (2.1 GB at the production 110k-site segment) pushed the backward pass over
# the 16 GB HBM of a v5e chip. Hazards are therefore computed per step.


def _categorical_rows(key, logits):
    """One categorical draw per row of (B, N) logits.

    MEASURED ON CHIP (tools/bisect_backward.py, T=4096 x 8 units, B=25,
    N=2400): jax.random.categorical's Gumbel argmax runs the whole backward
    scan in 0.64 s where an inverse-CDF comparison-count (cumsum + count)
    took 1.8 s — the (B, N) cumsum serialises along the 2400-wide particle
    axis while Gumbel+max reduces in parallel; threefry bits at (B, N) per
    step are NOT the bottleneck at this shape. (The inverse-CDF trick DOES
    win for resampling-style draws of M values from one weight row — see
    ops/resampling._count_below — where the cumsum is reused across draws.
    This was the round-1 13.5k-vs-24.8k sites/s regression: VERDICT item 1.)
    """
    return jax.random.categorical(key, logits, axis=-1)


def backward_simulation(
    key,
    params: TwoGroupParams,
    log_weights,  # (T, N) unnormalised filter weights
    particles: State,  # pytree of five (T, N) arrays (FilterResult.particles)
    num_simulations: int,
):
    """Returns (T, B, 5) int32 sampled smoothing trajectories."""
    T, N = log_weights.shape
    B = num_simulations

    key, k_last = jax.random.split(key)
    last_lw = log_weights[T - 1]
    idx = jax.random.categorical(k_last, last_lw, shape=(B,))
    last_particle = State(*(f[T - 1][idx] for f in particles))  # fields (B,)

    # The scan consumes the FULL (T, N) history as xs with a terminal-step
    # mask rather than slicing off the last row: `log_weights[:T-1]` and the
    # five particle-field head slices each materialise a copy inside the jit
    # — ~6.3 GB extra at the production 110k-site segment, which pushed the
    # backward dispatch over a v5e's HBM even with the history donated.
    # Masking wastes one step's kernel evaluation out of T instead.
    def step(carry, inputs):
        nxt = carry  # State of (B,) — particle at time t+1
        lw_t, cur, k, is_last = inputs  # (N,), State of (N,), key, bool
        cur_b = State(*(f[None, :] for f in cur))  # (1, N)
        nxt_b = State(*(f[:, None] for f in nxt))  # (B, 1)
        # Hazards gathered per step at (1, N) — the fastest measured layout
        # (see module note above).
        trans = transition_log_prob(params, cur_b, nxt_b)  # (B, N)
        logits = jnp.where(
            jnp.isfinite(trans) & (lw_t[None, :] > _NEG_INF),
            lw_t[None, :].astype(trans.dtype) + trans,
            _NEG_INF,
        )
        sel = _categorical_rows(k, logits)  # (B,)
        picked = State(
            *(jnp.where(is_last, n, f[sel]) for n, f in zip(nxt, cur))
        )
        return picked, picked

    # Reverse over t = T-1 .. 0. At t = T-1 the carry is the terminal draw
    # and the step emits it unchanged; each earlier step samples time t from
    # the backward kernel against the particle chosen for t+1. Keys are
    # derived per row so the stream matches the semantic step index.
    keys = jax.random.split(key, T)
    is_last = jnp.arange(T) == T - 1
    _, trajectory = jax.lax.scan(
        step,
        last_particle,
        (log_weights, particles, keys, is_last),
        reverse=True,
        unroll=4,
    )
    # History fields are mixed-width (int8 regimes, int32 durations); the
    # packed trajectory is small, so widen uniformly.
    return jnp.stack(
        [f.astype(jnp.int32) for f in trajectory], axis=-1
    )  # (T, B, 5)


def backward_simulation_conditioned(
    key,
    params: TwoGroupParams,
    log_weights,  # (T, N) filter weights
    particles: State,  # pytree of five (T, N) arrays
    terminal_state,  # (B, 5) int32 — next-block first-site states
    use_terminal,  # traced bool: condition on terminal_state?
):
    """Backward simulation conditioned on the NEXT genome block's trajectory.

    Exact boundary-exchange smoothing (parallel/sharded.py): block b receives
    block b+1's sampled states at its first site (one site to the right of
    block b's last site) and samples its own last site from the backward
    kernel B(b, n) ∝ w_{T-1}^n f(terminal_b | x_{T-1}^n) instead of from the
    filtered weights — making trajectories continuous across block joins.
    When ``use_terminal`` is False (the genome's last block) the terminal is
    drawn from the final weights, reproducing ``backward_simulation``.

    Returns (T, B, 5) int32 trajectories.
    """
    T, N = log_weights.shape
    B = terminal_state.shape[0]
    # Carry dtypes must match the (mixed-width) history fields the scan picks
    # from (int8 regimes/flag, int32 durations; see filter._narrow).
    nxt0 = State(
        *(
            terminal_state[:, i].astype(f.dtype)
            for i, f in enumerate(particles)
        )
    )

    def step(carry, inputs):
        nxt = carry  # (B,) State at time t+1
        lw_t, cur, k, is_term = inputs
        cur_b = State(*(f[None, :] for f in cur))  # (1, N)
        nxt_b = State(*(f[:, None] for f in nxt))  # (B, 1)
        trans = transition_log_prob(params, cur_b, nxt_b)  # (B, N)
        logits_cond = jnp.where(
            jnp.isfinite(trans) & (lw_t[None, :] > _NEG_INF),
            lw_t[None, :].astype(trans.dtype) + trans,
            _NEG_INF,
        )
        # At the terminal step without conditioning, fall back to drawing
        # from the filtered weights (backward_simulation's terminal draw).
        logits_uncond = jnp.broadcast_to(lw_t[None, :].astype(trans.dtype), trans.shape)
        logits = jnp.where(is_term & ~use_terminal, logits_uncond, logits_cond)
        sel = _categorical_rows(k, logits)  # (B,)
        picked = State(*(f[sel] for f in cur))
        return picked, picked

    keys = jax.random.split(key, T)
    is_term = jnp.arange(T) == T - 1
    _, trajectory = jax.lax.scan(
        step,
        nxt0,
        (log_weights, particles, keys, is_term),
        reverse=True,
        unroll=4,
    )
    return jnp.stack(
        [f.astype(jnp.int32) for f in trajectory], axis=-1
    )  # (T, B, 5)


def smoothing_functionals(trajectory, n_regimes):
    """Split probabilities and regime marginals from backward trajectories.

    Mirrors test_function + reduce_mean (run_inference_two_groups.py:233-240,
    294-296): returns (split_probs (T,), regime_probs (T, 2R)) where columns
    0..R-1 are control regimes and R..2R-1 case regimes.
    """
    m = trajectory[..., 0]
    r_c = trajectory[..., 2]
    r_k = trajectory[..., 4]
    split = jnp.mean((m == 0).astype(jnp.float32), axis=1)
    ctrl = jnp.stack(
        [jnp.mean((r_c == i).astype(jnp.float32), axis=1) for i in range(n_regimes)],
        axis=-1,
    )
    case = jnp.stack(
        [jnp.mean((r_k == i).astype(jnp.float32), axis=1) for i in range(n_regimes)],
        axis=-1,
    )
    return split, jnp.concatenate([ctrl, case], axis=-1)
