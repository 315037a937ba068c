"""Within-chromosome blocked single-group inference: the theta stage's
sequential chain, parallelised over halo-buffered genome blocks.

Why: the combined theta chain (ESTIMATE_PARAMETERS_AND_REGIMES,
OnlineCombinedInference.h:48-118) is the warm pipeline's largest stage —
ONE sequential lax.scan leaves ~87% of the chip idle at this shape
(tools/bisect_engine: 8 vmapped units cost 2.3x one unit for 8x the work),
and the reference's answer is a whole-chromosome 80-minute container
(modules/single_group/2_estimate_parameters.nf:10-12). The TPU-native
answer: fill the chip with blocks of ONE chromosome.

Scheme (two device programs, both cached at module level per CLAUDE.md
rule 6b):

1. WARMUP — a sequential params-only chain over the first
   ``warmup_sites`` sites moves theta most of the way to convergence
   (the ADAM chain is inherently sequential; its convergence horizon is
   far shorter than a chromosome). Skipped when parameters are fixed.
2. BLOCKS — the whole chromosome is split into ``block_size``-site blocks,
   each extended LEFT by ``halo`` sites (block 0 starts cold at site 0,
   exactly like the sequential chain; the reference's asymmetric first
   window, run_inference_two_groups.py:199-218). All blocks run the FULL
   combined engine vmapped in one program — fresh filters whose halo
   absorbs the cold start (the filter forgets initial conditions
   geometrically), theta chains continued from the warmup's (theta, ADAM
   moments, iteration count). Every window holds exactly win real sites:
   the ragged tail is handled by anchoring the LAST window at the
   chromosome end (overlapping its predecessor) instead of the engine's
   t_limit masking, whose whole-carry freeze (a where() over psi and the
   (win, R) output buffer EVERY step) measured SLOWER than the sequential
   chain (0.88x, round 5) — big scan-carried buffers price the step in
   HBM passes (CLAUDE.md rule 13).

Outputs:
* regime probabilities: per-block smoothing estimates, halo rows dropped —
  these match the sequential chain within halo error
  (tests/test_blocked_engine.py).
* theta: the mean of the block-final thetas (parallel SGA chains on the
  same objective from a common warm start; averaging reduces the
  per-block noise). theta_trace rows are the per-block traces stitched
  in genome order with the final row set to the averaged theta (the row
  downstream theta_{chrom}.csv.gz is built from). Deviation from the
  reference's single-chain trace is documented in PARITY.md.

Determinism: block b draws from fold_in(key, 1_000_003 + b); the warmup
chain uses the caller's key directly, so its realisation is bit-identical
to the sequential chain's prefix.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hygeia_tpu.single_group.model import SingleGroupModel
from hygeia_tpu.single_group.engine import (
    EngineConfig,
    EngineResult,
    run_online_combined_inference,
)

# (model statics, cfg statics, variant) -> jitted program. Shapes (warmup
# length, window, n_blocks) ride jit's own shape cache; model/emission
# arrays ride as ARGUMENTS (rules 6b/6d).
_PROGRAMS = {}

_BLOCK_KEY_SALT = 1_000_003


def _programs(model: SingleGroupModel, config: EngineConfig):
    statics = (
        model.n_regimes,
        model.u,
        model.kappa_fixed,
        model.d_max,
        config,
    )
    if statics in _PROGRAMS:
        return _PROGRAMS[statics]
    n_regimes, u, kappa_fixed, d_max = statics[:4]

    def _model(alpha, beta, kappa0):
        return SingleGroupModel(
            n_regimes=n_regimes, u=u, kappa_fixed=kappa_fixed, d_max=d_max,
            alpha=alpha, beta=beta, kappa0=kappa0,
        )

    warm_cfg = config._replace(estimate_regimes=False)
    su = config.steps_per_update

    @jax.jit
    def warmup(key, alpha, beta, kappa0, theta_init, E):
        res = run_online_combined_inference(
            key, _model(alpha, beta, kappa0), theta_init, E, warm_cfg
        )
        n_upd = max(0, (E.shape[0] - 1) // su)
        upd_rows = res.theta_trace[jnp.arange(1, n_upd + 1) * su]
        return res.final_theta, res.final_opt_state, upd_rows

    @jax.jit
    def single(key, alpha, beta, kappa0, theta_init, E):
        return run_online_combined_inference(
            key, _model(alpha, beta, kappa0), theta_init, E, config
        )

    @jax.jit
    def blocks(keys, alpha, beta, kappa0, theta0, adam0, E_blocks):
        # No t_limit: its whole-carry freeze (tree_map of where over psi and
        # the (win, R) output buffer) priced every step in HBM passes and
        # made the vmapped blocks SLOWER than the sequential chain (measured
        # 0.88x, round 5). All windows are full-length real sites instead —
        # the ragged tail is handled by overlapping the last window.
        model = _model(alpha, beta, kappa0)

        def one(key, E):
            res = run_online_combined_inference(
                key, model, theta0, E, config, adam_init=adam0
            )
            # theta changes ONLY at update steps (t % su == 0): return the
            # update-step rows instead of the full (win, D) trace — the
            # trace pull rode the ~21 MB/s tunnel (70 MB at production
            # shape, ~3 s serial with compute; CLAUDE.md rule 6c). The host
            # expands back to the bit-identical full trace.
            win = E.shape[0]
            n_upd = max(0, (win - 1) // su)
            upd_rows = res.theta_trace[jnp.arange(1, n_upd + 1) * su]
            return (
                res.log_normalizing_constant,
                res.regime_probs,
                res.regime_valid,
                res.spill_count,
                res.final_theta,
                res.final_score,
                upd_rows,
            )

        return jax.vmap(one)(keys, E_blocks)

    progs = {"warmup": warmup, "single": single, "blocks": blocks}
    _PROGRAMS[statics] = progs
    return progs


def aot_compile_jobs(
    model: SingleGroupModel,
    config: EngineConfig,
    T: int,
    *,
    block_size: int = 49152,
    halo: int = 4096,
    warmup_sites: int = 65536,
):
    """Zero-arg callables AOT-compiling the blocked theta-stage program set
    (warmup + blocks) for a chromosome of T sites — program acquisition
    costs ~20 s each on this backend even on cache hits but parallelises
    across threads; the pipeline orchestrator runs these at start-up
    alongside the INFER prewarm (streaming.aot_compile_jobs)."""
    import jax

    progs = _programs(model, config)
    n_blocks = max(1, -(-T // block_size))
    win = block_size + halo
    sds = jax.ShapeDtypeStruct
    D = model.dim_theta
    R = model.n_regimes
    key_sd = sds((2,), jnp.uint32)
    a_sd = sds(model.alpha.shape, model.alpha.dtype)
    b_sd = sds(model.beta.shape, model.beta.dtype)
    k_sd = sds(model.kappa0.shape, model.kappa0.dtype)
    th_sd = sds((D,), jnp.float32)
    if n_blocks == 1 or T < win:
        return [
            lambda: progs["single"]
            .lower(key_sd, a_sd, b_sd, k_sd, th_sd, sds((T, R), jnp.float32))
            .compile()
        ]
    jobs = []
    if config.estimate_parameters:
        Tw = int(min(T, warmup_sites))
        jobs.append(
            lambda: progs["warmup"]
            .lower(key_sd, a_sd, b_sd, k_sd, th_sd, sds((Tw, R), jnp.float32))
            .compile()
        )
    adam_sd = (th_sd, th_sd, sds((), jnp.int32))
    jobs.append(
        lambda: progs["blocks"]
        .lower(
            sds((n_blocks, 2), jnp.uint32), a_sd, b_sd, k_sd, th_sd, adam_sd,
            sds((n_blocks, win, R), jnp.float32),
        )
        .compile()
    )
    return jobs


def run_online_combined_inference_blocked(
    key,
    model: SingleGroupModel,
    theta_init,
    emissions,  # (T, R) emission log-lik table, concrete (host) array
    config: EngineConfig,
    *,
    block_size: int = 65536,
    halo: int = 4096,
    warmup_sites: int = 65536,
) -> EngineResult:
    """Blocked drop-in for run_online_combined_inference at chromosome scale.

    Returns an EngineResult whose regime_probs/theta_trace are assembled on
    the host from the per-block device outputs (see the module docstring
    for the exact semantics of each field).
    """
    E = np.asarray(emissions, np.float32)
    T, R = E.shape
    n_blocks = max(1, -(-T // block_size))
    win = block_size + halo
    progs = _programs(model, config)
    if n_blocks == 1 or T < win:
        # One block degenerates to the sequential chain — run it directly
        # (through the cached jitted program, not an eager trace).
        return progs["single"](
            key, model.alpha, model.beta, model.kappa0,
            jnp.asarray(theta_init, jnp.float32), jnp.asarray(E),
        )
    D = model.dim_theta

    su = config.steps_per_update
    theta_init_np = np.asarray(theta_init, np.float32)

    def _expand_trace(upd, j_lo, j_hi, base):
        # Row j of a chain's trace = base theta before the first update,
        # then update row j//su - 1 (theta changes only at update steps).
        j = np.arange(j_lo, j_hi)
        rows = np.concatenate([np.asarray(base, np.float32)[None], upd], axis=0)
        return rows[np.minimum(j // su, len(upd))]

    # AOT-compile the blocks program CONCURRENTLY with the warmup chain's
    # execution: a fresh process otherwise pays its ~20 s compile-cache
    # fetch serially between the two (program acquisition parallelises;
    # best-effort).
    import threading

    def _prewarm_blocks():
        try:
            sds = jax.ShapeDtypeStruct
            D_ = model.dim_theta
            progs["blocks"].lower(
                sds((n_blocks, 2), jnp.uint32),
                sds(model.alpha.shape, model.alpha.dtype),
                sds(model.beta.shape, model.beta.dtype),
                sds(model.kappa0.shape, model.kappa0.dtype),
                sds((D_,), jnp.float32),
                (
                    sds((D_,), jnp.float32),
                    sds((D_,), jnp.float32),
                    sds((), jnp.int32),
                ),
                sds((n_blocks, win, R), jnp.float32),
            ).compile()
        except Exception:  # noqa: BLE001
            pass

    threading.Thread(target=_prewarm_blocks, daemon=True).start()

    # ---- 1. sequential theta warmup on the prefix -------------------------
    if config.estimate_parameters:
        Tw = int(min(T, warmup_sites))
        theta0, adam0, upd_w = progs["warmup"](
            key, model.alpha, model.beta, model.kappa0,
            jnp.asarray(theta_init, jnp.float32), jnp.asarray(E[:Tw]),
        )
        warm_trace = _expand_trace(np.asarray(upd_w), 0, Tw, theta_init_np)
    else:
        theta0 = jnp.asarray(theta_init, jnp.float32)
        adam0 = (
            jnp.zeros((D,), jnp.float32),
            jnp.zeros((D,), jnp.float32),
            jnp.zeros((), jnp.int32),
        )
        warm_trace = None

    # ---- 2. halo-buffered block windows -----------------------------------
    # Every window holds exactly `win` REAL sites (no padding, no t_limit —
    # whose whole-carry freeze measured slower than sequential). Block b
    # outputs [b*bs, (b+1)*bs) from window [b*bs - halo, b*bs - halo + win);
    # block 0 cold-starts at site 0 like the sequential chain, and the LAST
    # block's window is anchored at the chromosome end, overlapping its
    # predecessor (its output range is just the tail [lo, T)).
    E_blocks = np.zeros((n_blocks, win, R), np.float32)
    out_ranges = []  # (within-block start, global start, global end)
    for b in range(n_blocks):
        g_start = b * block_size
        g_end = min(T, g_start + block_size)
        if b == n_blocks - 1:
            s = T - win  # anchor the ragged tail at the end (overlap)
        else:
            s = max(0, g_start - halo)
        E_blocks[b] = E[s : s + win]
        out_ranges.append((g_start - s, g_start, g_end))

    keys = jax.vmap(lambda b: jax.random.fold_in(key, b))(
        jnp.arange(_BLOCK_KEY_SALT, _BLOCK_KEY_SALT + n_blocks, dtype=jnp.uint32)
    )
    res_b = progs["blocks"](
        keys, model.alpha, model.beta, model.kappa0, theta0, adam0,
        jnp.asarray(E_blocks),
    )

    # ---- 3. host assembly --------------------------------------------------
    log_z_b, probs_b, valid_b, spill_b, final_theta_b, score_b, upd_b = res_b
    probs_b = np.asarray(probs_b)  # (n_blocks, win, R)
    valid_b = np.asarray(valid_b)
    upd_b = np.asarray(upd_b)  # (n_blocks, n_upd, D) update-step theta rows
    theta0_np = np.asarray(theta0)
    probs = np.zeros((T, R), np.float32)
    valid = np.zeros((T,), bool)
    trace = np.zeros((T, D), np.float32)
    for b, (lo, g_start, g_end) in enumerate(out_ranges):
        n = g_end - g_start
        probs[g_start:g_end] = probs_b[b, lo : lo + n]
        valid[g_start:g_end] = valid_b[b, lo : lo + n]
        trace[g_start:g_end] = _expand_trace(upd_b[b], lo, lo + n, theta0_np)
    if warm_trace is not None:
        # The warmup chain's trace is the sequential-parity prefix.
        n = min(len(warm_trace), T)
        trace[:n] = warm_trace[:n]

    if config.estimate_parameters:
        final_theta = np.mean(np.asarray(final_theta_b), axis=0)
    else:
        final_theta = np.asarray(theta_init, np.float32)
    trace[-1] = final_theta  # theta_{chrom}.csv.gz reads the last row

    return EngineResult(
        regime_probs=probs,
        regime_valid=valid,
        theta_trace=trace,
        log_normalizing_constant=np.float64(
            np.sum(np.asarray(log_z_b))
        ),
        spill_count=np.sum(np.asarray(spill_b)),
        final_theta=final_theta,
        final_score=np.mean(np.asarray(score_b), axis=0),
        final_opt_state=None,
    )
