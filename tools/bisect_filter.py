"""Filter-pass ablation: where do the 0.70 s at T=4096 x 8 units go?

Ablations (each structurally identical scan, one component nulled):
  full          production run_filter (reference point)
  no_history    same steps, but no (T, N) weight/particle history outputs
  no_resample   parents = top-M slots of an iota (no top_k / cumsum / draws)
  no_transition transition tree replaced by zeros (keeps emissions/weights)
  no_obs        emission one-hot select replaced by zeros

The deltas attribute step time to history writes, the optimal-resampling
block, the transition branch tree, and the emission lookup.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.scipy.special import logsumexp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from hygeia_tpu.ops.emissions import emission_log_prob_table
    from hygeia_tpu.ops import resampling as res_mod
    from hygeia_tpu.two_group import model as model_mod
    from hygeia_tpu.two_group import filter as filter_mod
    from hygeia_tpu.two_group.filter import run_filter, run_filter_final
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
        print(
            json.dumps(
                {
                    "ablation": name,
                    "sec": round(float(np.median(ts)), 3),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )

    def jit_filter():
        @jax.jit
        def f(keys, E_c, E_k):
            def one(key, e_c, e_k):
                r = run_filter(key, params, e_c, e_k, M)
                return r.log_normalizing_constant

            return jax.vmap(one)(keys, E_c, E_k)

        return f

    only = os.environ.get("HYGEIA_ABLATIONS")
    only = set(only.split(",")) if only else None

    def want(name):
        return only is None or name in only

    if want("full"):
        timeit("full", jit_filter(), keys, E_c, E_k)

    if want("no_history"):

        @jax.jit
        def f_nohist(keys, E_c, E_k):
            def one(key, e_c, e_k):
                lw, _ = run_filter_final(key, params, e_c, e_k, M)
                return logsumexp(lw)

            return jax.vmap(one)(keys, E_c, E_k)

        timeit("no_history", f_nohist, keys, E_c, E_k)

    if want("no_resample"):
        orig_opt = res_mod.optimal_finite_state_resampling

        def fake_resampling(key, log_norm, m, **kw):
            out = orig_opt(key, log_norm, m, **kw)
            idx = jnp.arange(m, dtype=jnp.int32)
            return out._replace(
                parent_indices=idx,
                top_m_indices=idx,
                log_c=jnp.zeros((), jnp.float32),
                use_unbiased=jnp.asarray(False),
            )

        # Patch at the filter module's import site.
        filter_mod.optimal_finite_state_resampling = fake_resampling
        try:
            timeit("no_resample", jit_filter(), keys, E_c, E_k)
        finally:
            filter_mod.optimal_finite_state_resampling = orig_opt

    if want("no_transition"):
        orig_t = model_mod.transition_log_prob

        def fake_trans(params_, prev, nxt, **kw):
            shape = jnp.broadcast_shapes(prev.m.shape, nxt.m.shape)
            return jnp.zeros(shape, params_.rho_case.dtype)

        filter_mod.transition_log_prob = fake_trans
        try:
            timeit("no_transition", jit_filter(), keys, E_c, E_k)
        finally:
            filter_mod.transition_log_prob = orig_t

    if want("no_paired_transition"):
        orig_pt = filter_mod.paired_transition_log_prob

        def fake_paired(params_, anc, children):
            shape = children.m.shape
            return jnp.zeros(shape, params_.rho_case.dtype)

        filter_mod.paired_transition_log_prob = fake_paired
        try:
            timeit("no_paired_transition", jit_filter(), keys, E_c, E_k)
        finally:
            filter_mod.paired_transition_log_prob = orig_pt

    if want("no_shift_lse"):
        # Null the per-step renormalisation logsumexp (semantics-breaking;
        # ablation only — measures the reduce's share of the serial chain).
        orig_lse = filter_mod.logsumexp

        def fake_lse(x, **kw):
            return jnp.zeros((), x.dtype)

        filter_mod.logsumexp = fake_lse
        try:
            timeit("no_shift_lse", jit_filter(), keys, E_c, E_k)
        finally:
            filter_mod.logsumexp = orig_lse

    for k_unroll in (4, 16, 32):
        if want(f"unroll{k_unroll}"):

            @jax.jit
            def f_unroll(keys, E_c, E_k, _k=k_unroll):
                def one(key, e_c, e_k):
                    r = run_filter(key, params, e_c, e_k, M, unroll=_k)
                    return r.log_normalizing_constant

                return jax.vmap(one)(keys, E_c, E_k)

            timeit(f"unroll{k_unroll}", f_unroll, keys, E_c, E_k)


if __name__ == "__main__":
    main()
