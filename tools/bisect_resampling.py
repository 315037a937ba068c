"""Resampling micro-bench: the optimal-finite-state block is 64% of filter
step time (tools/bisect_filter.py). Time isolated variants of its suspects:

  r_full       current ops.resampling.optimal_finite_state_resampling
  r_noscatter  boolean masks built from comparisons instead of .at[].set
               scatters (scatters serialise on TPU)
  r_mmprefix   (N,) cumsums via blocked lower-triangular matmuls on the MXU
               instead of XLA's prefix lowering
  r_combo      both
  r_topk_only  just top_k + logsumexp (lower bound for the selection part)

Each variant runs inside a lax.scan of T steps vmapped over UNITS rows so
per-step costs dominate, like the real filter.
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

    from hygeia_tpu.ops.resampling import (
        optimal_finite_state_resampling,
        multinomial_resampling,
        _normalise,
        _count_below,
        slots_mask,
    )

    N = int(os.environ.get("HYGEIA_BENCH_N", 2400))
    M = int(os.environ.get("HYGEIA_BENCH_M", 50))
    T = int(os.environ.get("HYGEIA_BENCH_T", 4096))
    UNITS = int(os.environ.get("HYGEIA_BENCH_UNITS", 8))
    REPS = int(os.environ.get("REPS", 2))
    _NEG_INF = -jnp.inf

    L = 128  # prefix block size

    def cumsum_mm(x):
        """(N,) inclusive prefix sum via blocked lower-triangular matmuls."""
        n = x.shape[0]
        nb = -(-n // L)
        xp = jnp.pad(x, (0, nb * L - n)).reshape(nb, L)
        tril = jnp.tril(jnp.ones((L, L), x.dtype))
        within = xp @ tril.T  # (nb, L) prefix within each block
        block_tot = within[:, -1]
        offs = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(block_tot)[:-1]])
        return (within + offs[:, None]).reshape(-1)[:n]

    def make_optimal(noscatter, mmprefix, selector="topk"):
        cs = cumsum_mm if mmprefix else jnp.cumsum

        def select(log_norm, kk):
            if selector == "topk":
                return jax.lax.top_k(log_norm, kk)
            if selector == "approx":
                v, i = jax.lax.approx_max_k(log_norm, kk, recall_target=1.0)
                return v, i.astype(jnp.int32)
            if selector == "sort":
                n = log_norm.shape[0]
                v, i = jax.lax.sort((-log_norm, jnp.arange(n)), num_keys=1)
                return -v[:kk], i[:kk].astype(jnp.int32)
            raise ValueError(selector)

        def f(key, log_weights, m):
            n = log_weights.shape[0]
            dtype = log_weights.dtype
            log_norm, log_z = _normalise(log_weights)
            kk = min(m + 1, n)
            top_lw, top_idx = select(log_norm, kk)
            top_q = jnp.exp(top_lw)
            if noscatter:
                iota = jnp.arange(n)
                hits = iota[None, :] == top_idx[:, None]  # (kk, N)
                top_mask = jnp.any(hits, axis=0)
            else:
                top_mask = jnp.zeros((n,), bool).at[top_idx].set(True)
            tail = jnp.sum(jnp.where(top_mask, 0.0, jnp.exp(log_norm)))
            suffix = jnp.cumsum(top_q[::-1])[::-1] + tail
            k_range = jnp.arange(kk, dtype=dtype)
            log_c_k = jnp.log(jnp.maximum(m - k_range, 0.0)) - jnp.log(suffix)
            below = log_c_k + top_lw <= 0.0
            prev_lw = jnp.concatenate([jnp.array([jnp.inf], dtype), top_lw[:-1]])
            above_prev = log_c_k + prev_lw >= 0.0
            ok = below & above_prev & (k_range <= m)
            any_ok = jnp.any(ok)
            k_star = jnp.where(any_ok, jnp.argmax(ok), n)
            log_c = jnp.where(any_ok, log_c_k[jnp.clip(k_star, 0, kk - 1)], _NEG_INF)
            slots = jnp.arange(m)
            kept_parents = top_idx[jnp.clip(slots, 0, kk - 1)]
            if noscatter:
                keep_slot = slots_mask(kk, k_star)
                kept_mask = jnp.any(hits & keep_slot[:, None], axis=0)
            else:
                kept_mask = jnp.zeros((n,), bool).at[top_idx].set(
                    slots_mask(kk, k_star)
                )
            resid_lw = jnp.where(kept_mask, _NEG_INF, log_norm)
            resid_norm, _ = _normalise(resid_lw)
            key_sys, key_mult = jax.random.split(key)
            l = jnp.maximum(m - k_star, 1)
            u = jax.random.uniform(key_sys, (), dtype=jnp.float32)
            q_resid = cs(jnp.exp(resid_norm))
            t = (jnp.arange(m, dtype=jnp.float32) + u) / l.astype(jnp.float32) * q_resid[-1]
            sys_idx = jnp.clip(slots - k_star, 0, m - 1)
            resampled_parents = jnp.clip(_count_below(q_resid, t[sys_idx]), 0, n - 1)
            parents = jnp.where(slots < k_star, kept_parents, resampled_parents)
            new_w = jnp.where(slots < k_star, log_weights[parents], log_z - log_c)
            bad = ~jnp.isfinite(log_c)
            # multinomial fallback, same cumsum implementation
            qn = cs(jnp.exp(log_norm))
            um = jax.random.uniform(key_mult, (m,), dtype=jnp.float32)
            mult_parents = jnp.clip(
                _count_below(qn, um * qn[-1], strict_side_left=False), 0, n - 1
            )
            parents = jnp.where(bad, mult_parents, parents).astype(jnp.int32)
            new_w = jnp.where(bad, log_z - jnp.log(float(m)), new_w)
            return parents, new_w

        return f

    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.normal(size=(UNITS, N)).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), UNITS)

    def scan_of(res_fn):
        def unit(key, lw):
            def step(carry, k):
                lw = carry
                parents, new_w = res_fn(k, lw, M)
                # feed outputs back so nothing is dead code
                lw2 = lw.at[parents].add(0.001 * new_w.astype(lw.dtype))
                return lw2, ()

            ks = jax.random.split(key, T)
            out, _ = jax.lax.scan(step, lw, ks)
            return out

        return jax.jit(lambda: jax.vmap(unit)(keys, w0))

    def full_res(key, lw, m):
        r = optimal_finite_state_resampling(key, lw, m)
        return r.parent_indices, r.new_log_weights

    variants = {
        "r_full": full_res,
        "r_noscatter": make_optimal(True, False),
        "r_mmprefix": make_optimal(False, True),
        "r_combo": make_optimal(True, True),
        "r_combo_approx": make_optimal(True, True, "approx"),
        "r_combo_sort": make_optimal(True, True, "sort"),
    }

    def topk_only(key, lw, m):
        log_norm, log_z = _normalise(lw)
        top_lw, top_idx = jax.lax.top_k(log_norm, m + 1)
        return top_idx[:m].astype(jnp.int32), top_lw[:m]

    variants["r_topk_only"] = topk_only

    only = os.environ.get("HYGEIA_RVARIANTS")
    only = set(only.split(",")) if only else None
    for name, fn in variants.items():
        if only is not None and name not in only:
            continue
        g = scan_of(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(g())
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(g())
            ts.append(time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "variant": name,
                    "sec": round(float(np.median(ts)), 3),
                    "us_per_step": round(1e6 * float(np.median(ts)) / T, 1),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
