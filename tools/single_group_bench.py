"""Single-group engine throughput on chip.

The reference's single-group path is the C++ online combined-inference
engine (singleGroup.cpp:76-189): one CPU core streaming a chromosome at
N_max=250 particles with adaptive-lag smoothing and online ADAM. Its
resource envelope allots 80 min + 10/attempt for a chromosome
(modules/single_group/2_estimate_parameters.nf:10-12) — chr21 has ~4e5
CpGs, implying order 100 sites/s.

This measures our engine (one lax.scan; single_group/engine.py) at the same
configuration — N_max=250, epsilon=0.01, ADAM every 200 steps — vmapped over
UNITS independent chromosomes on one chip. Prints one JSON line.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from hygeia_tpu.ops.emissions import emission_log_prob_table
    from hygeia_tpu.single_group.engine import (
        EngineConfig,
        run_online_combined_inference,
    )
    from hygeia_tpu.single_group.model import make_model, parameters_to_theta

    T = int(os.environ.get("HYGEIA_BENCH_T", 4096))
    UNITS = int(os.environ.get("HYGEIA_BENCH_UNITS", 8))
    NP_ = int(os.environ.get("HYGEIA_BENCH_NP", 250))
    REPS = int(os.environ.get("REPS", 2))

    R = 6
    rng = np.random.default_rng(0)
    mu = np.array([0.99, 0.01, 0.80, 0.20, 0.50, 0.50])
    sigma = np.array([0.05, 0.05, 0.20, 0.20, 0.20, 0.2886751])
    kappa = np.full(R, 2.0)
    model = make_model(mu, sigma, 3, kappa, d_max=T + 2)
    P0 = np.full((R, R), 1.0 / (R - 1))
    np.fill_diagonal(P0, 0.0)
    theta0 = jnp.asarray(parameters_to_theta(P0, np.full(R, 0.9)), jnp.float32)
    cfg = EngineConfig(
        n_particles_max=NP_,
        epsilon=0.01,
        estimate_regimes=True,
        estimate_parameters=True,
        steps_per_update=200,
        scan_unroll=int(os.environ.get("HYGEIA_SG_UNROLL", 1)),
    )

    n = rng.poisson(30, size=(UNITS, T, 2)).astype(np.float32)
    y = np.minimum(rng.poisson(10, size=(UNITS, T, 2)), n).astype(np.float32)

    @jax.jit
    def run(keys, y, n):
        def one(key, y_u, n_u):
            E = emission_log_prob_table(y_u, n_u, model.alpha, model.beta)
            res = run_online_combined_inference(key, model, theta0, E, cfg)
            return res.log_normalizing_constant, res.final_theta

        return jax.vmap(one)(keys, jnp.asarray(y), jnp.asarray(n))

    keys = jax.random.split(jax.random.PRNGKey(0), UNITS)
    logz, th = jax.block_until_ready(run(keys, y, n))
    assert np.isfinite(np.asarray(logz)).all() and np.isfinite(np.asarray(th)).all()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(run(keys, y, n))
        ts.append(time.perf_counter() - t0)
    sec = float(np.median(ts))
    print(
        json.dumps(
            {
                "metric": "single_group_sites_per_sec",
                "value": round(UNITS * T / sec, 1),
                "unit": "sites/s",
                "sec": round(sec, 3),
                "T": T,
                "units": UNITS,
                "n_particles": NP_,
            }
        )
    )


if __name__ == "__main__":
    main()
