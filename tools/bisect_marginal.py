"""Marginal-path (adaptive-lag) on-chip cost model (VERDICT round-2 weak #5).

Measures run_marginal_filter at the production particle shape (M=50 ->
N=2400, R=6) and ablates its two candidate dominant costs:

  full            production marginal filter, smoothing_window=64
  window{8,16,32} psi buffer size scaling (the (S*F, N) x (N, N) einsum and
                  the variance reductions scale with S; the ring scatters and
                  the (N, N) backward-kernel tree do not)
  no_bwd_grid     _backward_logits (N x N transition tree) replaced by zeros
                  (B becomes uniform) — isolates the backward-kernel grid
  no_test_fns     _test_functions replaced by zeros — isolates the indicator
                  construction (expected ~free)

Prints one JSON line per ablation with wall sec and derived sites/s.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bisect_marginal.py
Knobs: HYGEIA_BENCH_{T,UNITS,M}, REPS, HYGEIA_ABLATIONS (csv filter).
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
    from hygeia_tpu.two_group import marginal as marg_mod
    from hygeia_tpu.two_group.model import make_params

    T = int(os.environ.get("HYGEIA_BENCH_T", 4096))
    UNITS = int(os.environ.get("HYGEIA_BENCH_UNITS", 8))
    M = int(os.environ.get("HYGEIA_BENCH_M", 50))
    REPS = int(os.environ.get("REPS", 2))

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

    def timeit(name, fn, *args):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        sec = float(np.median(ts))
        print(
            json.dumps(
                {
                    "ablation": name,
                    "sec": round(sec, 3),
                    "sites_per_s": round(UNITS * T / sec, 1),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )

    def jit_marginal(window, structured=True):
        @jax.jit
        def f(keys, E_c, E_k):
            def one(key, e_c, e_k):
                r = marg_mod.run_marginal_filter(
                    key, params, e_c, e_k, M, smoothing_window=window,
                    structured=structured,
                )
                return r.log_normalizing_constant, r.spill_count

            return jax.vmap(one)(keys, E_c, E_k)

        return f

    only = os.environ.get("HYGEIA_ABLATIONS")
    only = set(only.split(",")) if only else None

    def want(name):
        return only is None or name in only

    if want("full"):
        timeit("full", jit_marginal(64), keys, E_c, E_k)

    # Round-4 A/B: the generic (N, N)-grid psi update vs the structured
    # default (marginal._structured_psi_update).
    if want("generic"):
        timeit("generic", jit_marginal(64, structured=False), keys, E_c, E_k)

    for w in (8, 16, 32):
        if want(f"window{w}"):
            timeit(f"window{w}", jit_marginal(w), keys, E_c, E_k)

    if want("no_bwd_grid"):
        orig = marg_mod._backward_logits

        def fake_logits(params_, prev, nxt, lw, **kw):
            return jnp.zeros((nxt.m.shape[0], prev.m.shape[0]), jnp.float32)

        marg_mod._backward_logits = fake_logits
        try:
            timeit("no_bwd_grid", jit_marginal(64), keys, E_c, E_k)
        finally:
            marg_mod._backward_logits = orig

    if want("no_test_fns"):
        orig = marg_mod._test_functions

        def fake_tf(state, n_regimes):
            return jnp.zeros((1 + 2 * n_regimes, state.m.shape[0]), jnp.float32)

        marg_mod._test_functions = fake_tf
        try:
            timeit("no_test_fns", jit_marginal(64), keys, E_c, E_k)
        finally:
            marg_mod._test_functions = orig


if __name__ == "__main__":
    main()
