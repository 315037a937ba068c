"""Backward-pass ablation round 2: after the Gumbel/no-hoist fixes the
backward step costs ~134 us vs the filter's ~76 — what remains?

  b_full       shipped backward_simulation
  b_notrans    transition tree replaced by zeros (keeps weights+categorical)
  b_nocat      categorical replaced by argmax (keeps transition)
  b_nogather   picked = nxt (no 5-field gather by sel)
  b_unroll1    shipped but scan unroll=1
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
    from hygeia_tpu.two_group import model as model_mod
    from hygeia_tpu.two_group.model import make_params, State, transition_log_prob
    from hygeia_tpu.two_group.filter import run_filter

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

    def make_backward(notrans=False, nocat=False, nogather=False, unroll=4):
        def backward(key, lw, particles):
            Tn, N = lw.shape
            key, k_last = jax.random.split(key)
            idx = jax.random.categorical(k_last, lw[Tn - 1], shape=(B,))
            last = State(*(f[Tn - 1][idx] for f in particles))

            def step(carry, inputs):
                nxt = carry
                lw_t, cur, k, is_last = inputs
                cur_b = State(*(f[None, :] for f in cur))
                nxt_b = State(*(f[:, None] for f in nxt))
                if notrans:
                    trans = jnp.zeros((B, N), jnp.float32)
                else:
                    trans = transition_log_prob(params, cur_b, nxt_b)
                logits = jnp.where(
                    jnp.isfinite(trans) & (lw_t[None, :] > -jnp.inf),
                    lw_t[None, :].astype(trans.dtype) + trans,
                    -jnp.inf,
                )
                if nocat:
                    sel = jnp.argmax(logits, axis=-1)
                else:
                    sel = jax.random.categorical(k, logits, axis=-1)
                if nogather:
                    picked = nxt
                else:
                    picked = State(
                        *(jnp.where(is_last, nn, f[sel]) for nn, f in zip(nxt, cur))
                    )
                return picked, picked

            ks = jax.random.split(key, Tn)
            is_last = jnp.arange(Tn) == Tn - 1
            _, traj = jax.lax.scan(
                step, last, (lw, particles, ks, is_last), reverse=True, unroll=unroll
            )
            return jax.tree.map(lambda f: f.astype(jnp.int32), traj)

        @jax.jit
        def bwd(bkeys, lw, parts):
            return jax.vmap(lambda k, l, p: backward(k, l, p))(bkeys, lw, parts)

        return bwd

    variants = {
        "b_full": make_backward(),
        "b_notrans": make_backward(notrans=True),
        "b_nocat": make_backward(nocat=True),
        "b_nogather": make_backward(nogather=True),
        "b_unroll1": make_backward(unroll=1),
        "b_unroll8": make_backward(unroll=8),
    }
    only = os.environ.get("HYGEIA_BVARIANTS")
    only = set(only.split(",")) if only else None
    for name, fn in variants.items():
        if only is not None and name not in only:
            continue
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
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
