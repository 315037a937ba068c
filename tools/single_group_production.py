"""Single-group engine at production chromosome length on chip (VERDICT
round-3 item 5): ONE sequential T=1e6-site chromosome, N=250 particles,
both estimation modes, through the chunked engine.

The reference allots this workload an 80-min/chromosome CPU envelope
(/root/reference/modules/single_group/2_estimate_parameters.nf:10-12);
chr21-scale is ~4e5 CpGs, i.e. order 100 sites/s. This records our
sequential-chain number (no unit batching — the latency-bound worst case),
peak HBM and the smoothing spill count.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/single_group_production.py
Knobs: HYGEIA_SG_T (1e6), HYGEIA_SG_NP (250), HYGEIA_SG_CHUNK (65536),
       HYGEIA_SG_MODES (params,regimes).
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
    from hygeia_tpu.single_group.engine import (
        EngineConfig,
        run_online_combined_inference_chunked,
    )
    from hygeia_tpu.single_group.model import (
        make_model,
        parameters_to_theta,
    )

    T = int(os.environ.get("HYGEIA_SG_T", 1_000_000))
    NP_ = int(os.environ.get("HYGEIA_SG_NP", 250))
    CHUNK = int(os.environ.get("HYGEIA_SG_CHUNK", 65_536))
    modes = os.environ.get("HYGEIA_SG_MODES", "params,regimes").split(",")

    R = 6
    mu = np.array([0.95, 0.05, 0.8, 0.2, 0.5, 0.5])
    sigma = np.array([0.05, 0.05, 0.1, 0.1, 0.1, 0.2886751])
    model = make_model(mu, sigma, u=3, kappa=np.full(R, 2.0), d_max=4096)

    rng = np.random.default_rng(0)
    n = rng.poisson(25, size=(T, 2)).astype(np.float32)
    y = np.minimum(rng.poisson(9, size=(T, 2)), n).astype(np.float32)

    @jax.jit
    def table(y, n):
        return emission_log_prob_table(y, n, model.alpha, model.beta)

    E = jax.block_until_ready(table(jnp.asarray(y), jnp.asarray(n)))

    P0 = np.full((R, R), 1.0 / (R - 1))
    np.fill_diagonal(P0, 0.0)
    theta0 = jnp.asarray(parameters_to_theta(P0, np.full(R, 0.9)))

    for mode in modes:
        cfg = EngineConfig(
            n_particles_max=NP_,
            estimate_parameters=(mode == "params"),
            estimate_regimes=(mode == "regimes"),
            scan_unroll=int(os.environ.get("HYGEIA_SG_UNROLL", 1)),
        )
        print(f"mode={mode}: dispatching first chunk (compile)...", flush=True)
        t0 = time.perf_counter()
        res = run_online_combined_inference_chunked(
            jax.random.PRNGKey(0), model, theta0, E, cfg, chunk_size=CHUNK
        )
        jax.block_until_ready(res.log_normalizing_constant)
        wall = time.perf_counter() - t0
        dev = jax.local_devices()[0]
        stats = dev.memory_stats() or {}
        print(
            json.dumps(
                {
                    "mode": mode,
                    "T": T,
                    "n_particles": NP_,
                    "chunk": CHUNK,
                    "wall_s": round(wall, 1),
                    "sites_per_sec": round(T / wall, 1),
                    "spill_count": int(res.spill_count),
                    "log_z": float(res.log_normalizing_constant),
                    "peak_hbm_gb": round(
                        stats.get("peak_bytes_in_use", 0) / 2**30, 2
                    ),
                    "vs_ref_envelope_100": round(T / wall / 100.0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
