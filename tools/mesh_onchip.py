"""On-chip shard_map sanity row (VERDICT round-3 item 7).

The meshed INFER path (parallel/sharded.py) is correctness-tested on the
virtual CPU mesh; this measures it on the real chip with a 1x1 device mesh —
the largest mesh one chip allows — against a mesh-free baseline running the
IDENTICAL per-block work (filter + backward, vmapped over blocks x seeds),
so the delta is the shard_map + collective machinery overhead, bounding the
"~same compute cost" claim in sharded.py's docstring. Both halo and
exchange boundary schemes are timed.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/mesh_onchip.py
Knobs: HYGEIA_MESH_T (32768), HYGEIA_MESH_SEG (16384), HYGEIA_MESH_BUF (2048),
       HYGEIA_MESH_SEEDS (2), HYGEIA_BENCH_M (50), REPS (2).
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

    from jax.sharding import Mesh
    from hygeia_tpu.ops.emissions import emission_log_prob_table
    from hygeia_tpu.parallel.sharded import (
        make_block_windows,
        sharded_two_group_inference,
    )
    from hygeia_tpu.two_group.backward import backward_simulation
    from hygeia_tpu.two_group.filter import run_filter
    from hygeia_tpu.two_group.model import make_params

    T = int(os.environ.get("HYGEIA_MESH_T", 32768))
    SEG = int(os.environ.get("HYGEIA_MESH_SEG", 16384))
    BUF = int(os.environ.get("HYGEIA_MESH_BUF", 2048))
    n_seeds = int(os.environ.get("HYGEIA_MESH_SEEDS", 2))
    M = int(os.environ.get("HYGEIA_BENCH_M", 50))
    B = 25
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
        d_max=SEG + 2 * BUF + 1,
    )
    n = rng.poisson(30, size=(T, 2)).astype(np.float32)
    y = np.minimum(rng.poisson(10, size=(T, 2)), n).astype(np.float32)
    yk = np.minimum(y + 1, n)
    seeds = list(range(n_seeds))

    def timeit(name, fn, extra=None):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        sec = float(np.median(ts))
        row = {
            "case": name,
            "sec": round(sec, 3),
            "unit_sites_per_s": round(T * n_seeds / sec, 1),
            "compile_s": round(compile_s, 1),
        }
        row.update(extra or {})
        print(json.dumps(row), flush=True)
        return sec

    # --- mesh-free baseline: same block windows, vmapped blocks x seeds ----
    n_blocks = max(1, -(-T // SEG))
    blocks = [
        make_block_windows(a, SEG, BUF, n_blocks)
        for a in (y, n, yk, n)
    ]
    keys = jax.vmap(
        lambda b: jax.vmap(
            lambda s: jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(0), b), s
            )
        )(jnp.asarray(seeds, jnp.uint32))
    )(jnp.arange(n_blocks, dtype=jnp.uint32))

    @jax.jit
    def baseline(mc, tc, mk, tk, keys):
        def tab(yy, nn):
            return emission_log_prob_table(yy, nn, params.alpha, params.beta)

        def one(key, e_c, e_k):
            res = run_filter(key, params, e_c, e_k, M)
            traj = backward_simulation(
                jax.random.fold_in(key, 1), params, res.log_weights,
                res.particles, B,
            )
            return traj, res.log_normalizing_constant

        def per_block(mc1, tc1, mk1, tk1, ks):
            e_c, e_k = tab(mc1, tc1), tab(mk1, tk1)
            return jax.vmap(lambda k: one(k, e_c, e_k))(ks)

        return jax.vmap(per_block)(mc, tc, mk, tk, keys)

    base_s = timeit(
        "baseline_vmap",
        lambda: baseline(*[jnp.asarray(b) for b in blocks], keys),
    )

    devs = np.array(jax.devices()[:1]).reshape(1, 1)
    mesh = Mesh(devs, ("genome", "seed"))

    for boundary in ("halo", "exchange"):
        def run(boundary=boundary):
            return sharded_two_group_inference(
                mesh, params, y, n, yk, n,
                segment_size=SEG, buffer_size=BUF,
                num_resampled_ancestors=M, num_samples_backward=B,
                seeds=seeds, boundary=boundary,
            )

        sec = timeit(
            f"mesh1x1_{boundary}", run,
            extra={"overhead_vs_baseline": None},
        )
        print(
            json.dumps(
                {
                    "case": f"mesh1x1_{boundary}_overhead",
                    "pct_vs_baseline": round(100.0 * (sec - base_s) / base_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
