"""Exact two-stage top-k vs lax.top_k at the filter's (N=2400, kk=51) shape.

PERF.md round 3: the top_k(2400, 51) + logsumexp pair is ~39 us of the
~125 us filter+backward step pair — the single largest remaining term.
approx_max_k(recall=1.0) reorders ties (residual-resampled particles share
identical weights Z/c, so tie plateaus are REAL here), which changes
realisations and breaks the bit-parity oracles. The two-stage split below is
EXACT including tie order:

  top-kk of x == top-kk of (concat of per-contiguous-block top-kk)

because (a) every globally-selected occurrence of a value v is within its
block's top-kk (a block with j elements > v leaves v at most kk - j global
slots), and (b) candidate positions order ties by (block asc, in-block index
asc) = global index asc, matching lax.top_k's lowest-index-first rule.
Contiguity of the blocks is what makes (b) true.

Variants (floor = logsumexp + selection only, inside a T-step scan):
  topk_floor      lax.top_k(2400, 51)
  t2_<bs>         two-stage with block size <bs> (600/300/150/100)
  approx_floor    lax.approx_max_k recall 1.0 (tie order NOT preserved)

CHECK=1 (CPU ok): exhaustive equality vs lax.top_k incl. tie blocks/-inf.
"""

import json
import os
import time

import numpy as np


def two_stage_top_k(x, kk, block):
    import jax
    import jax.numpy as jnp

    n = x.shape[0]
    nb = n // block
    assert nb * block == n and block >= kk
    xb = x.reshape(nb, block)
    v, i = jax.lax.top_k(xb, kk)  # (nb, kk)
    offs = (jnp.arange(nb, dtype=jnp.int32) * block)[:, None]
    cand_v = v.reshape(-1)
    cand_i = (i.astype(jnp.int32) + offs).reshape(-1)
    fv, fp = jax.lax.top_k(cand_v, kk)
    return fv, cand_i[fp]


def main():
    import jax
    import jax.numpy as jnp
    from jax.scipy.special import logsumexp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    N = int(os.environ.get("HYGEIA_BENCH_N", 2400))
    M = int(os.environ.get("HYGEIA_BENCH_M", 50))
    KK = M + 1
    T = int(os.environ.get("HYGEIA_BENCH_T", 4096))
    UNITS = int(os.environ.get("HYGEIA_BENCH_UNITS", 8))
    REPS = int(os.environ.get("REPS", 2))

    if os.environ.get("CHECK"):
        rng = np.random.default_rng(0)
        bad = 0
        for trial in range(300):
            x = rng.normal(size=N).astype(np.float32)
            if trial % 3 == 0:
                x[rng.integers(0, N, size=400)] = x[0]  # heavy tie block
            if trial % 5 == 0:
                x[rng.integers(0, N, size=1000)] = -np.inf  # dead slots
            if trial % 7 == 0:
                x[:] = x[0]  # all tied
            xs = jnp.asarray(x)
            v1, i1 = jax.lax.top_k(xs, KK)
            for block in (600, 300, 150, 100):
                v2, i2 = two_stage_top_k(xs, KK, block)
                if not (
                    np.array_equal(np.asarray(v1), np.asarray(v2))
                    and np.array_equal(np.asarray(i1), np.asarray(i2))
                ):
                    bad += 1
                    print("MISMATCH", trial, block)
        print(json.dumps({"check": "two_stage_vs_topk", "mismatches": bad}), flush=True)
        if os.environ.get("CHECK") == "only":
            return

    def floor_of(select):
        def f(key, lw):
            log_norm = lw - logsumexp(lw)
            top_lw, top_idx = select(log_norm)
            return top_idx[:M].astype(jnp.int32), top_lw[:M]

        return f

    variants = {
        "topk_floor": floor_of(lambda x: jax.lax.top_k(x, KK)),
        "approx_floor": floor_of(
            lambda x: jax.lax.approx_max_k(x, KK, recall_target=1.0)
        ),
    }
    for bs in (600, 300, 150, 100):
        if N % bs == 0 and bs >= KK:
            variants[f"t2_{bs}"] = floor_of(
                lambda x, bs=bs: two_stage_top_k(x, KK, bs)
            )

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(UNITS, N)).astype(np.float32)
    w0 = jnp.asarray(w0 - jax.scipy.special.logsumexp(w0, axis=1, keepdims=True))
    keys = jax.random.split(jax.random.PRNGKey(0), UNITS)

    def scan_of(fn):
        def unit(key, lw):
            def step(carry, k):
                lw = carry
                parents, top_lw = fn(k, lw)
                lw2 = lw + 0.001 * jnp.tanh(jnp.sum(top_lw) / M)
                hits = jnp.arange(N)[None, :] == parents[:, None]
                lw2 = lw2 + 0.001 * jnp.sum(hits, axis=0)
                return lw2 - logsumexp(lw2), ()

            ks = jax.random.split(key, T)
            out, _ = jax.lax.scan(step, lw, ks)
            return out

        return jax.jit(lambda: jax.vmap(unit)(keys, w0))

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
