"""Pallas fused-resampler A/B: the measured accept/reject for VERDICT
round-3 item 6.

Times the filter-only program (run_filter, history on) at the production
shape (M=50 -> N=2400, R=6, 8 x 4096 vmapped units) with the XLA optimal
resampler vs the fused Pallas kernel (ops/pallas_resampling), plus the
no_resample ablation as the floor. Prints one JSON line per case.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/bisect_pallas.py
Knobs: HYGEIA_BENCH_{T,UNITS,M}, REPS.
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
    from hygeia_tpu.two_group.filter import run_filter
    from hygeia_tpu.two_group.model import make_params

    T = int(os.environ.get("HYGEIA_BENCH_T", 4096))
    UNITS = int(os.environ.get("HYGEIA_BENCH_UNITS", 8))
    M = int(os.environ.get("HYGEIA_BENCH_M", 50))
    REPS = int(os.environ.get("REPS", 3))

    R = 6
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
    n = rng.poisson(20, size=(UNITS, T, 2)).astype(np.float32)
    y = np.minimum(rng.poisson(8, size=(UNITS, T, 2)), n).astype(np.float32)

    @jax.jit
    def tables(y, n):
        f = jax.vmap(
            lambda yy, nn: emission_log_prob_table(yy, nn, params.alpha, params.beta)
        )
        return f(y, n), f(jnp.minimum(y + 1, n), n)

    E_c, E_k = tables(jnp.asarray(y), jnp.asarray(n))
    keys = jax.random.split(jax.random.PRNGKey(0), UNITS)

    def jit_filter(pallas):
        @jax.jit
        def f(keys, E_c, E_k):
            def one(key, e_c, e_k):
                r = run_filter(key, params, e_c, e_k, M, pallas_resample=pallas)
                return r.log_normalizing_constant, r.degenerate_steps

            return jax.vmap(one)(keys, E_c, E_k)

        return f

    for name, pallas in (("xla_resampler", False), ("pallas_resampler", True)):
        fn = jit_filter(pallas)
        t0 = time.perf_counter()
        lz, dg = jax.block_until_ready(fn(keys, E_c, E_k))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(keys, E_c, E_k))
            ts.append(time.perf_counter() - t0)
        sec = float(np.median(ts))
        print(
            json.dumps(
                {
                    "case": name,
                    "sec": round(sec, 3),
                    "filter_sites_per_s": round(UNITS * T / sec, 1),
                    "compile_s": round(compile_s, 1),
                    "mean_log_z": round(float(np.mean(np.asarray(lz))), 3),
                    "degenerate": int(np.sum(np.asarray(dg))),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
