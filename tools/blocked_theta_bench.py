"""On-chip wall time of the single-group theta stage: sequential chain vs
the round-5 blocked path (single_group/blocked.py) at the production shape
(T=400k, R=6, N=250, combined params+regimes).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/blocked_theta_bench.py
Env: HYGEIA_BT_T (400000), HYGEIA_BT_BLOCK (65536), HYGEIA_BT_HALO (4096),
     HYGEIA_BT_WARM (65536), HYGEIA_BT_SEQ (1 = also run sequential)
"""

import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp

from hygeia_tpu.ops.emissions import emission_log_prob_table
from hygeia_tpu.single_group.model import make_model, parameters_to_theta
from hygeia_tpu.single_group.engine import EngineConfig
from hygeia_tpu.single_group.blocked import (
    run_online_combined_inference_blocked,
    _programs,
)
from hygeia_tpu.single_group.simulate import simulate

T = int(os.environ.get("HYGEIA_BT_T", 400_000))
BLOCK = int(os.environ.get("HYGEIA_BT_BLOCK", 65536))
HALO = int(os.environ.get("HYGEIA_BT_HALO", 4096))
WARM = int(os.environ.get("HYGEIA_BT_WARM", 65536))
RUN_SEQ = int(os.environ.get("HYGEIA_BT_SEQ", 1))

R = 6
MU = np.array([0.95, 0.05, 0.80, 0.20, 0.50, 0.50])
SIGMA = np.array([0.05, 0.05, 0.1, 0.1, 0.1, 0.2886751])

model = make_model(MU, SIGMA, 3, np.full(R, 2.0), d_max=4096)
P0 = np.full((R, R), 1.0 / (R - 1))
np.fill_diagonal(P0, 0.0)
theta_true = parameters_to_theta(P0, np.full(R, 0.9))

print(f"simulating T={T} ...", flush=True)
n_tot = np.asarray(
    np.random.default_rng(0).poisson(30.0, size=(T, 2)), np.float32
)
sim = simulate(jax.random.PRNGKey(1), model, theta_true, n_tot)
E = np.asarray(
    emission_log_prob_table(np.asarray(sim.n_methylated), n_tot, model.alpha, model.beta)
)
print("emissions ready", flush=True)

cfg = EngineConfig(
    n_particles_max=250,
    estimate_regimes=True,
    estimate_parameters=True,
    steps_per_update=200,
    learning_rate_exponent=0.1,
    learning_rate_factor=0.01,
)
theta_init = np.asarray(
    jax.random.normal(jax.random.PRNGKey(0), (model.dim_theta,))
)

key = jax.random.PRNGKey(0)

# --- blocked (compile + warm) -------------------------------------------
t0 = time.time()
res_b = run_online_combined_inference_blocked(
    key, model, theta_init, E, cfg, block_size=BLOCK, halo=HALO, warmup_sites=WARM
)
cold = time.time() - t0
t0 = time.time()
res_b = run_online_combined_inference_blocked(
    key, model, theta_init, E, cfg, block_size=BLOCK, halo=HALO, warmup_sites=WARM
)
warm = time.time() - t0
print(
    f"blocked: block={BLOCK} halo={HALO} warmup={WARM}: "
    f"cold {cold:.1f}s warm {warm:.1f}s = {T/warm:,.0f} sites/s "
    f"(spills {int(res_b.spill_count)})",
    flush=True,
)

# --- sequential ----------------------------------------------------------
if RUN_SEQ:
    progs = _programs(model, cfg)
    Ej = jnp.asarray(E)
    args = (key, model.alpha, model.beta, model.kappa0,
            jnp.asarray(theta_init, jnp.float32), Ej)
    t0 = time.time()
    r = progs["single"](*args)
    jax.block_until_ready(r.final_theta)
    cold_s = time.time() - t0
    t0 = time.time()
    r = progs["single"](*args)
    jax.block_until_ready(r.final_theta)
    warm_s = time.time() - t0
    print(
        f"sequential: cold {cold_s:.1f}s warm {warm_s:.1f}s = "
        f"{T/warm_s:,.0f} sites/s",
        flush=True,
    )
    print(f"speedup (warm): {warm_s/warm:.2f}x", flush=True)
