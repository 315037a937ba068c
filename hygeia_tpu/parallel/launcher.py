"""Multi-host launch helper.

The reference scales out with AWS Batch + Nextflow file staging
(aws.config, run.sh); the TPU-native equivalent is a SPMD multi-host JAX
program: every host runs the same pipeline entry, `jax.distributed`
connects the hosts, and the global (genome x seed) mesh spans all chips.
Data stays sharded; only host 0 writes aggregate outputs.

Usage on each host of a pod slice (or via your cluster runner):

    from hygeia_tpu.parallel.launcher import initialize_distributed
    initialize_distributed()          # no-op on single-host
    mesh = make_mesh(...)             # spans all global devices

On Cloud TPU the coordinator address/process count are discovered from the
environment automatically; they can also be passed explicitly for other
fabrics (e.g. a SLURM cluster with DCN between hosts).
"""

from __future__ import annotations

import os


def initialize_distributed(
    coordinator_address=None, num_processes=None, process_id=None
):
    """Initialise jax.distributed when running multi-host; returns the
    (process_index, process_count) pair. Safe to call on a single host."""
    import jax

    explicit = coordinator_address is not None
    env_hint = any(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if explicit or (env_hint and os.environ.get("HYGEIA_DISTRIBUTED", "1") == "1"):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except (RuntimeError, ValueError):
            # Already initialised, or single-host with TPU hints set.
            pass
    return jax.process_index(), jax.process_count()


def is_primary_host():
    import jax

    return jax.process_index() == 0
