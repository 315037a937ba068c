"""Regression bisect: time filter and backward passes separately on the TPU,
plus variants isolating the round-1 final-snapshot changes (VERDICT item 1).

Programs (each its own jit; compile cache enabled so re-runs are cheap):
  P1 filter@HEAD           the production filter (unroll=8)
  P2 backward@HEAD         hazard-history hoist + one-hot lookup + inv-CDF
  P3 filter unroll=1       is the scan-unroll change a win or a loss?
  P4 backward legacy       per-step gather_rho + row-gather log_p lookup +
                           jax.random.categorical, no unroll (the 87b25fb
                           structure that measured 24.8k end-to-end)

Env knobs: HYGEIA_BENCH_T (default 4096), HYGEIA_BENCH_UNITS (8), REPS (2),
HYGEIA_BISECT_ONLY (comma list of program names to run, e.g. "p1,p2").
Prints one JSON line per program as results arrive.
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
    from hygeia_tpu.ops.hazard import gather_rho
    from hygeia_tpu.two_group import model as model_mod
    from hygeia_tpu.two_group.model import make_params, State, transition_log_prob
    from hygeia_tpu.two_group.filter import run_filter
    from hygeia_tpu.two_group.backward import backward_simulation

    T = int(os.environ.get("HYGEIA_BENCH_T", 4096))
    UNITS = int(os.environ.get("HYGEIA_BENCH_UNITS", 8))
    M = int(os.environ.get("HYGEIA_BENCH_M", 50))
    B = int(os.environ.get("HYGEIA_BENCH_B", 25))
    REPS = int(os.environ.get("REPS", 2))
    only = os.environ.get("HYGEIA_BISECT_ONLY")
    only = set(only.split(",")) if only else None

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
    bkeys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)

    def report(name, seconds, extra=None):
        out = {
            "program": name,
            "sec": round(seconds, 3),
            "sites_per_sec": round(UNITS * T / seconds, 1),
        }
        if extra:
            out.update(extra)
        print(json.dumps(out), flush=True)

    def timeit(name, fn, *args):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        report(name, float(np.median(ts)), {"compile_s": round(compile_s, 1)})
        return out

    # ---- P1: filter @ HEAD -------------------------------------------------
    def filt(unroll):
        @jax.jit
        def f(keys, E_c, E_k):
            def one(key, e_c, e_k):
                res = run_filter(key, params, e_c, e_k, M, unroll=unroll)
                return res.log_normalizing_constant, res.log_weights, res.particles

            return jax.vmap(one)(keys, E_c, E_k)

        return f

    lw_v = parts_v = None
    if only is None or "p1" in only:
        logz, lw_v, parts_v = timeit("p1_filter_head", filt(8), keys, E_c, E_k)

    # ---- P2: backward @ HEAD -----------------------------------------------
    if (only is None or "p2" in only) and lw_v is not None:

        @jax.jit
        def bwd_head(bkeys, lw, parts):
            def one(k, lw_i, p_i):
                return backward_simulation(k, params, lw_i, p_i, B)

            return jax.vmap(one)(bkeys, lw, parts)

        timeit("p2_backward_head", bwd_head, bkeys, lw_v, parts_v)

    # ---- P3: filter unroll=1 ------------------------------------------------
    if only is None or "p3" in only:
        timeit("p3_filter_unroll1", filt(1), keys, E_c, E_k)

    # ---- P4: backward legacy (87b25fb structure) ----------------------------
    if (only is None or "p4" in only) and lw_v is not None:

        def legacy_lookup(log_p_tab, r_prev, r_nxt, R):
            # 87b25fb: row gather at prev indices + select-reduce over next.
            regs = jnp.arange(R)
            oh_r = r_nxt[..., None] == regs
            rows = log_p_tab[r_prev]  # (prev..., R) gather
            return jnp.max(jnp.where(oh_r, rows, -jnp.inf), axis=-1)

        def backward_legacy(key, lw, particles):
            Tn, N = lw.shape
            key, k_last = jax.random.split(key)
            idx = jax.random.categorical(k_last, lw[Tn - 1], shape=(B,))
            last = State(*(f[Tn - 1][idx] for f in particles))

            orig = model_mod._lookup_log_p

            def step(carry, inputs):
                nxt = carry
                lw_t, cur, k = inputs
                cur_b = State(*(f[None, :] for f in cur))
                nxt_b = State(*(f[:, None] for f in nxt))
                model_mod._lookup_log_p = legacy_lookup
                try:
                    trans = transition_log_prob(params, cur_b, nxt_b)
                finally:
                    model_mod._lookup_log_p = orig
                logits = jnp.where(
                    jnp.isfinite(trans) & (lw_t[None, :] > -jnp.inf),
                    lw_t[None, :].astype(trans.dtype) + trans,
                    -jnp.inf,
                )
                sel = jax.random.categorical(k, logits, axis=-1)
                picked = State(*(f[sel] for f in cur))
                return picked, picked

            keys_b = jax.random.split(key, Tn - 1)
            head = State(*(f[: Tn - 1] for f in particles))
            _, traj = jax.lax.scan(
                step, last, (lw[: Tn - 1], head, keys_b), reverse=True
            )
            return traj

        @jax.jit
        def bwd_legacy(bkeys, lw, parts):
            return jax.vmap(lambda k, l, p: backward_legacy(k, l, p))(bkeys, lw, parts)

        timeit("p4_backward_legacy", bwd_legacy, bkeys, lw_v, parts_v)


if __name__ == "__main__":
    main()
