"""Generative simulation of the single-group model (simulate_data verb).

Mirrors Model::simulateData (Model.h:62-80) with the single-group transition
and BetaBinomial emissions (singleGroup.h:485-557)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hygeia_tpu.single_group.model import SingleGroupModel, build_tables


class SingleGroupSimulation(NamedTuple):
    d: jnp.ndarray  # (T,) sojourn times
    r: jnp.ndarray  # (T,) regimes
    n_methylated: jnp.ndarray  # (T, S)


def simulate(key, model: SingleGroupModel, theta, n_total_reads):
    """Roll (d, r) forward and sample methylated read counts.

    n_total_reads: (T, S). Initial state: d=1, r ~ Uniform(R)
    (sampleFromInitialDistribution, singleGroup.h:486-496).
    """
    tables = build_tables(model, jnp.asarray(theta))
    T = n_total_reads.shape[0]
    R = model.n_regimes

    key, k0 = jax.random.split(key)
    r0 = jax.random.randint(k0, (), 0, R)
    d0 = jnp.ones((), jnp.int32)

    def step(carry, k):
        d, r = carry
        k1, k2 = jax.random.split(k)
        d_idx = jnp.clip(d - 1, 0, model.d_max - 1)
        rho = tables.rho[r, d_idx]
        jump = jax.random.uniform(k1) <= rho
        new_r = jax.random.categorical(k2, tables.log_P[r]).astype(jnp.int32)
        d2 = jnp.where(jump, 1, d + 1).astype(jnp.int32)
        r2 = jnp.where(jump, new_r, r)
        return (d2, r2), (d2, r2)

    keys = jax.random.split(key, T - 1)
    _, (ds, rs) = jax.lax.scan(step, (d0, r0), keys)
    d_all = jnp.concatenate([d0[None], ds])
    r_all = jnp.concatenate([r0[None], rs])

    k_obs = jax.random.fold_in(key, 1)
    ka, kb = jax.random.split(k_obs)
    n = jnp.asarray(n_total_reads, jnp.float32)
    p = jax.random.beta(
        ka, model.alpha[r_all][:, None], model.beta[r_all][:, None], shape=n.shape
    )
    y = jax.random.binomial(kb, n, p).astype(jnp.int32)
    return SingleGroupSimulation(d=d_all, r=r_all, n_methylated=y)
