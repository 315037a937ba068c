"""Sharded two-group inference: halo-buffered genome blocks over a device
mesh, seeds data-parallel, everything inside one pjit'd program.

This is the TPU-native replacement for the reference's (segment x seed)
Nextflow task fan-out (main.nf:44-75, run_inference_two_groups.py:194-218):

* the chromosome is split into ``n_blocks`` windows of ``segment_size`` sites
  with ``buffer_size`` halo on BOTH sides (the chromosome is zero-padded at
  its edges, so every window has identical static shape; zero-read halo sites
  have log-likelihood 0 and are inert — this generalises the reference's
  asymmetric first/last windows),
* ``shard_map`` places blocks along the mesh "genome" axis and seeds along
  "seed"; each shard runs the full filter + backward simulation for its
  (block, seed) pairs via ``vmap``,
* halos are trimmed on-device; outputs come back with per-block leading axes
  to be reshaped into the chromosome.

No collectives are needed in the halo scheme (the halo absorbs boundary
error, exactly like the reference); an exact boundary-exchange variant would
``ppermute`` final filter states between neighbouring blocks along "genome".
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from hygeia_tpu.ops.emissions import emission_log_prob_table
from hygeia_tpu.two_group.model import TwoGroupParams
from hygeia_tpu.two_group.filter import run_filter
from hygeia_tpu.two_group.backward import backward_simulation


def make_block_windows(arr, segment_size, buffer_size, n_blocks):
    """(T, S) -> (n_blocks, segment_size + 2*buffer_size, S) with zero-padded
    edges; block b covers sites [b*S - B, (b+1)*S + B) of the padded genome."""
    T, S = arr.shape
    total = n_blocks * segment_size
    padded = np.zeros((total + 2 * buffer_size, S), arr.dtype)
    padded[buffer_size : buffer_size + T] = arr[:total]
    win = segment_size + 2 * buffer_size
    out = np.stack(
        [padded[b * segment_size : b * segment_size + win] for b in range(n_blocks)]
    )
    return out


def sharded_two_group_inference(
    mesh,
    params: TwoGroupParams,
    n_meth_control,
    n_total_control,
    n_meth_case,
    n_total_case,
    *,
    segment_size,
    buffer_size,
    num_resampled_ancestors,
    num_samples_backward,
    seeds,
    base_key=0,
    weight_dtype=jnp.float32,
):
    """Run the whole chromosome across the mesh.

    Returns (trajectories, log_z):
      trajectories: (n_blocks * segment_size, n_seeds * B, 5) int16-valued
        backward-simulation states, halo-trimmed and genome-ordered
        (padding rows beyond the true T are zeros-of-the-prior; slice [:T]).
      log_z: (n_blocks, n_seeds) per-block log-normalising constants.
    """
    n_genome = mesh.shape["genome"]
    n_seed_mesh = mesh.shape["seed"]
    n_seeds = len(seeds)
    T = n_meth_control.shape[0]
    n_blocks = max(1, -(-T // segment_size))
    # Round blocks up to a multiple of the mesh's genome axis.
    n_blocks = -(-n_blocks // n_genome) * n_genome
    if n_seeds % n_seed_mesh:
        raise ValueError("len(seeds) must be a multiple of the seed mesh axis")

    blocks = [
        make_block_windows(np.asarray(a, np.float32), segment_size, buffer_size, n_blocks)
        for a in (n_meth_control, n_total_control, n_meth_case, n_total_case)
    ]
    keys = jax.vmap(
        lambda b: jax.vmap(
            lambda s: jax.random.fold_in(jax.random.fold_in(jax.random.PRNGKey(base_key), b), s)
        )(jnp.asarray(seeds, jnp.uint32))
    )(jnp.arange(n_blocks, dtype=jnp.uint32))  # (n_blocks, n_seeds, 2)

    B = num_samples_backward
    win = segment_size + 2 * buffer_size

    def run_one(key, e_c, e_k):
        res = run_filter(
            key,
            params,
            e_c,
            e_k,
            num_resampled_ancestors,
            weight_dtype=weight_dtype,
        )
        traj = backward_simulation(
            jax.random.fold_in(key, 1),
            params,
            res.log_weights,
            res.particles,
            B,
        )
        trimmed = traj[buffer_size : buffer_size + segment_size]
        return trimmed.astype(jnp.int16), res.log_normalizing_constant

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P("genome"),  # per-block emission tables
            P("genome"),
            P("genome", "seed"),  # keys
        ),
        out_specs=(P("genome", "seed"), P("genome", "seed")),
        # The filter scan mixes varying (key-derived) and replicated carry
        # components; skip the varying-manual-axes check rather than pcast
        # inside engine code shared with unsharded paths.
        check_vma=False,
    )
    def run_shard(e_c_blocks, e_k_blocks, key_blocks):
        # e_*_blocks: (blocks_per_dev, win, R); key_blocks: (bpd, spd, 2)
        def per_block(e_c, e_k, ks):
            return jax.vmap(lambda k: run_one(k, e_c, e_k))(ks)

        return jax.vmap(per_block)(e_c_blocks, e_k_blocks, key_blocks)

    # Emission tables per block (host->device once; computed under jit).
    @jax.jit
    def tables(mc, tc, mk, tk):
        f = jax.vmap(
            lambda m, t: emission_log_prob_table(m, t, params.alpha, params.beta)
        )
        return f(mc, tc), f(mk, tk)

    e_c, e_k = tables(*[jnp.asarray(b) for b in blocks])
    traj, log_z = jax.jit(run_shard)(e_c, e_k, keys)
    # (n_blocks, n_seeds, seg, B, 5) -> (n_blocks*seg, n_seeds*B, 5)
    traj = np.asarray(traj)
    nb, ns, seg, b, _ = traj.shape
    traj = traj.transpose(0, 2, 1, 3, 4).reshape(nb * seg, ns * b, 5)
    return traj, np.asarray(log_z)
