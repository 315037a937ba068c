"""Second-stage bisect: which backward-pass change caused the 2.6x regression?

Variant axes (all combinations of interest):
  hoist      precomputed _hazard_history threaded through the scan vs
             per-step gather_rho at (1, N)
  lookup     'einsum' (_lookup_log_p one-hot sandwich, HIGHEST precision),
             'einsum_default' (same, default precision),
             'rowgather' (87b25fb row gather + select-reduce)
  cat        'invcdf' (_categorical_rows) vs 'gumbel' (jax.random.categorical)
  unroll     scan unroll factor

Prints one JSON line per variant.
"""

import itertools
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
    from hygeia_tpu.two_group.backward import _categorical_rows

    def _hazard_history(params, particles, chunk=32):
        # The round-1 hoist (removed from backward.py after this bisect
        # showed it 15% slower + 2.1 GB heavier): (T, N) lookups up front.
        T, N = particles.d_c.shape
        n_ch = -(-T // chunk)
        pad = n_ch * chunk - T

        def pad_rs(x):
            return jnp.pad(x, ((0, pad), (0, 0))).reshape(n_ch, chunk, N)

        d_c, r_c = pad_rs(particles.d_c), pad_rs(particles.r_c)
        d_k, r_k = pad_rs(particles.d_k), pad_rs(particles.r_k)

        def one(args):
            dc, rc, dk, rk = args
            return (
                gather_rho(params.rho_control, dc, rc),
                gather_rho(params.rho_case, dk, rk),
            )

        rho_c, rho_k = jax.lax.map(one, (d_c, r_c, d_k, r_k))
        return rho_c.reshape(-1, N)[:T], rho_k.reshape(-1, N)[:T]

    T = int(os.environ.get("HYGEIA_BENCH_T", 4096))
    UNITS = int(os.environ.get("HYGEIA_BENCH_UNITS", 8))
    M = int(os.environ.get("HYGEIA_BENCH_M", 50))
    B = int(os.environ.get("HYGEIA_BENCH_B", 25))
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
    bkeys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)

    @jax.jit
    def filt(keys, E_c, E_k):
        def one(key, e_c, e_k):
            res = run_filter(key, params, e_c, e_k, M)
            return res.log_weights, res.particles

        return jax.vmap(one)(keys, E_c, E_k)

    lw_v, parts_v = jax.block_until_ready(filt(keys, E_c, E_k))

    def lookup_rowgather(log_p_tab, r_prev, r_nxt, R):
        regs = jnp.arange(R)
        oh_r = r_nxt[..., None] == regs
        rows = log_p_tab[r_prev]
        return jnp.max(jnp.where(oh_r, rows, -jnp.inf), axis=-1)

    def lookup_einsum_default(log_p_tab, r_prev, r_nxt, R):
        regs = jnp.arange(R)
        safe = jnp.where(jnp.isfinite(log_p_tab), log_p_tab, -1e30)
        oh_prev = (r_prev[..., None] == regs).astype(safe.dtype)
        oh_nxt = (r_nxt[..., None] == regs).astype(safe.dtype)
        tmp = jnp.einsum("...j,ij->...i", oh_nxt, safe)
        val = jnp.sum(oh_prev * tmp, axis=-1)
        dead = jnp.sum(oh_prev, axis=-1) * jnp.sum(oh_nxt, axis=-1) == 0
        return jnp.where((val <= -1e29) | dead, -jnp.inf, val)

    LOOKUPS = {
        "einsum": model_mod._lookup_log_p,
        "einsum_default": lookup_einsum_default,
        "rowgather": lookup_rowgather,
    }

    def make_backward(hoist, lookup, cat, unroll):
        lookup_fn = LOOKUPS[lookup]

        def backward(key, lw, particles):
            Tn, N = lw.shape
            key, k_last = jax.random.split(key)
            idx = jax.random.categorical(k_last, lw[Tn - 1], shape=(B,))
            last = State(*(f[Tn - 1][idx] for f in particles))
            head = State(*(f[: Tn - 1] for f in particles))
            if hoist:
                rc_h, rk_h = _hazard_history(params, head)
                xs_rho = (rc_h, rk_h)
            else:
                xs_rho = ()

            orig = model_mod._lookup_log_p

            def step(carry, inputs):
                nxt = carry
                if hoist:
                    lw_t, cur, rc_t, rk_t, k = inputs
                    rho_kw = dict(rho_c=rc_t[None, :], rho_k=rk_t[None, :])
                else:
                    lw_t, cur, k = inputs
                    rho_kw = {}
                cur_b = State(*(f[None, :] for f in cur))
                nxt_b = State(*(f[:, None] for f in nxt))
                model_mod._lookup_log_p = lookup_fn
                try:
                    trans = transition_log_prob(params, cur_b, nxt_b, **rho_kw)
                finally:
                    model_mod._lookup_log_p = orig
                logits = jnp.where(
                    jnp.isfinite(trans) & (lw_t[None, :] > -jnp.inf),
                    lw_t[None, :].astype(trans.dtype) + trans,
                    -jnp.inf,
                )
                if cat == "invcdf":
                    sel = _categorical_rows(k, logits)
                else:
                    sel = jax.random.categorical(k, logits, axis=-1)
                picked = State(*(f[sel] for f in cur))
                return picked, picked

            keys_b = jax.random.split(key, Tn - 1)
            _, traj = jax.lax.scan(
                step,
                last,
                (lw[: Tn - 1], head) + xs_rho + (keys_b,),
                reverse=True,
                unroll=unroll,
            )
            return traj

        @jax.jit
        def bwd(bkeys, lw, parts):
            return jax.vmap(lambda k, l, p: backward(k, l, p))(bkeys, lw, parts)

        return bwd

    spec = os.environ.get(
        "HYGEIA_VARIANTS",
        # hoist-lookup-cat-unroll
        "1:einsum:invcdf:4,0:rowgather:gumbel:1,"
        "1:rowgather:gumbel:1,0:einsum:invcdf:4,"
        "1:einsum:gumbel:4,1:rowgather:invcdf:4,"
        "0:rowgather:gumbel:4,1:einsum_default:invcdf:4",
    )
    for v in spec.split(","):
        h, lk, ct, ur = v.split(":")
        name = f"hoist={h} lookup={lk} cat={ct} unroll={ur}"
        fn = make_backward(int(h), lk, ct, int(ur))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(bkeys, lw_v, parts_v))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(bkeys, lw_v, parts_v))
            ts.append(time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "variant": name,
                    "sec": round(float(np.median(ts)), 3),
                    "sites_per_sec": round(UNITS * T / float(np.median(ts)), 1),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
