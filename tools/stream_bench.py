"""Warm-process streamed-production bench: packing + unit-residency scaling.

Measures streamed_inference at the production segment shape (T=110k, N=2400,
B=25) for a list of (units, block_size) configs, reporting COLD (includes
program acquisition — ~15 s/program of remote-compile-cache lookup per fresh
process, CLAUDE.md rule 6b) and WARM (second call; pure dispatch walls —
comparable to PERF.md's streaming table) totals plus the fwd/rev/pull split.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/stream_bench.py
Knobs: HYGEIA_STREAM_CONFIGS="8x16384,16x8192,32x4096" (units x block)
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from hygeia_tpu.ops.emissions import emission_log_prob_table
    from hygeia_tpu.two_group.model import make_params
    from hygeia_tpu.two_group.streaming import streamed_inference

    T = int(os.environ.get("HYGEIA_STREAM_T", 110_000))
    M, B, R = 50, 25, 6
    configs = [
        tuple(int(v) for v in c.split("x"))
        for c in os.environ.get(
            "HYGEIA_STREAM_CONFIGS", "8x16384,16x8192,32x4096"
        ).split(",")
    ]

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(R, R))
    np.fill_diagonal(logits, -np.inf)
    p = np.where(np.isfinite(logits), np.exp(logits), 0.0)
    p /= p.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore"):
        log_p = np.log(p)
    params = make_params(
        mu=np.array([0.95, 0.05, 0.8, 0.2, 0.5, 0.5]),
        sigma=np.array([0.05, 0.05, 0.1, 0.1, 0.1, 0.2886751]),
        p_softmax_control=log_p,
        omega_logit_control=np.full(R, 2.0),
        omega_case=0.8,
        kappa_control=np.full(R, 2.0),
        kappa_case=np.full(R, 2.0),
        merge_log_prob=np.log(0.1),
        split_prob=0.01,
        minimum_duration=3,
        d_max=T + 1,
    )
    n = rng.poisson(30, size=(T, 2)).astype(np.float32)
    y = np.minimum(rng.poisson(10, size=(T, 2)), n).astype(np.float32)
    E_c = emission_log_prob_table(y, n, params.alpha, params.beta)
    E_k = emission_log_prob_table(np.minimum(y + 1, n), n, params.alpha, params.beta)

    for S, W in configs:
        keys = jax.random.split(jax.random.PRNGKey(0), S)
        walls = []
        for rep in range(2):
            timings = {}
            t0 = time.perf_counter()
            traj, log_z, degen = streamed_inference(
                keys, params, E_c, E_k, M, B,
                block_size=W, timings=timings,
            )
            walls.append(time.perf_counter() - t0)
            del traj
        dev = jax.local_devices()[0]
        stats = dev.memory_stats() or {}
        print(
            json.dumps(
                {
                    "units": S,
                    "block": W,
                    "cold_s": round(walls[0], 1),
                    "warm_s": round(walls[1], 1),
                    "warm_sites_per_sec": round(S * T / walls[1], 1),
                    "fwd_s": round(sum(timings.get("fwd", [])), 1),
                    # Reverse dispatches ride an async chain: rev_enqueue_s
                    # is dispatch cost only; each "pull" wall includes the
                    # wait for that block's reverse compute, so reverse
                    # compute + transfer together = pull_s.
                    "rev_enqueue_s": round(
                        sum(timings.get("rev_enqueue", [])), 1
                    ),
                    "pull_s": round(sum(timings.get("pull", [])), 1),
                    "host_s": round(sum(timings.get("host", [])), 1),
                    "degen": int(np.sum(degen)),
                    "peak_hbm_gb": round(
                        stats.get("peak_bytes_in_use", 0) / 2**30, 2
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
