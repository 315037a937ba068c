"""Single-group engine per-step cost decomposition on the SEQUENTIAL chain.

The warm production pipeline's slowest stage is the single-group theta pass:
one latency-bound sequential chromosome chain at ~147 us/step (1 unit;
8 vmapped units pay ~157 us/step total, i.e. ~87% of the chain is idle
lanes). This tool decomposes the per-step cost using the engine's own
config axes plus unit-count scaling:

  full        estimate_parameters + estimate_regimes (the pipeline config)
  regimes     smoothing only (no phi recursion / ADAM)
  params      score recursion only (no psi smoothing)
  smc_only    neither (pure filter: resample/grow/weights)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/bisect_engine.py
Knobs: HYGEIA_BENCH_T (16384), HYGEIA_ENGINE_UNITS (csv, default "1,8"),
       HYGEIA_BENCH_NP (250), REPS (3).
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
        run_online_combined_inference,
    )
    from hygeia_tpu.single_group.model import make_model, parameters_to_theta

    T = int(os.environ.get("HYGEIA_BENCH_T", 16384))
    UNIT_LIST = [
        int(v) for v in os.environ.get("HYGEIA_ENGINE_UNITS", "1,8").split(",")
    ]
    NP_ = int(os.environ.get("HYGEIA_BENCH_NP", 250))
    REPS = int(os.environ.get("REPS", 3))
    # 1 = return the FULL result pytree. The original logZ-only return let
    # XLA dead-code-eliminate the whole smoothing output path, understating
    # "full"/"regimes" by >2x (round-5 finding); logZ-only numbers remain
    # available for the filter+params decomposition.
    FULL_OUT = int(os.environ.get("HYGEIA_ENGINE_FULL_OUTPUTS", 1))
    S_CAP = int(os.environ.get("HYGEIA_ENGINE_SCAP", 128))

    R = 6
    rng = np.random.default_rng(0)
    mu = np.array([0.99, 0.01, 0.80, 0.20, 0.50, 0.50])
    sigma = np.array([0.05, 0.05, 0.20, 0.20, 0.20, 0.2886751])
    d_max = int(os.environ.get("HYGEIA_ENGINE_DMAX", T + 2))
    model = make_model(mu, sigma, 3, np.full(R, 2.0), d_max=d_max)
    P0 = np.full((R, R), 1.0 / (R - 1))
    np.fill_diagonal(P0, 0.0)
    theta0 = jnp.asarray(parameters_to_theta(P0, np.full(R, 0.9)), jnp.float32)

    cases = {
        "full": dict(estimate_parameters=True, estimate_regimes=True),
        "regimes": dict(estimate_parameters=False, estimate_regimes=True),
        "params": dict(estimate_parameters=True, estimate_regimes=False),
        "smc_only": dict(estimate_parameters=False, estimate_regimes=False),
    }

    for units in UNIT_LIST:
        n = rng.poisson(30, size=(units, T, 2)).astype(np.float32)
        y = np.minimum(rng.poisson(10, size=(units, T, 2)), n).astype(np.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), units)
        for name, flags in cases.items():
            cfg = EngineConfig(
                n_particles_max=NP_, steps_per_update=200,
                smoothing_window=S_CAP, **flags,
            )

            @jax.jit
            def run(keys, y, n):
                def one(key, y_u, n_u):
                    E = emission_log_prob_table(y_u, n_u, model.alpha, model.beta)
                    res = run_online_combined_inference(key, model, theta0, E, cfg)
                    if FULL_OUT:
                        return (
                            res.log_normalizing_constant,
                            res.regime_probs,
                            res.theta_trace[-1],
                        )
                    return res.log_normalizing_constant

                return jax.vmap(one)(keys, jnp.asarray(y), jnp.asarray(n))

            t0 = time.perf_counter()
            jax.block_until_ready(run(keys, y, n))
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(run(keys, y, n))
                ts.append(time.perf_counter() - t0)
            sec = float(np.median(ts))
            print(
                json.dumps(
                    {
                        "units": units, "T": T, "d_max": d_max,
                        "case": name,
                        "sec": round(sec, 3),
                        "us_per_step": round(1e6 * sec / T, 1),
                        "sites_per_s": round(units * T / sec, 1),
                        "compile_s": round(compile_s, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
