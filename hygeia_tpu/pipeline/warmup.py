"""`hygeia warmup` — precompile the production-shape program set.

The reference container pays no compile tax: any fresh task hits
steady-state throughput immediately (modules/two_group/4_infer.nf:44-49).
Here, every distinct program shape costs a remote compile (5-40 min when
the service is congested) the FIRST time ever, and a trace +
compile-cache fetch in every fresh process. This verb runs the real
two-group pipeline on synthetic counts of the exact production shape into
a throwaway directory, so the persistent compilation cache
(JAX_COMPILATION_CACHE_DIR) ends up holding every program a production
`hygeia run` of that shape will request:

* exactness by construction — the same code paths build the same program
  set; no hand-maintained list of shapes to drift out of sync;
* count values are random (program shapes depend only on T, the segment
  geometry, particle counts and seed counts — not on data);
* run it once per cache volume (machine, Docker volume, CI artifact);
  afterwards a first-ever production run costs what a cold run costs.
  The cache is per-platform: warm on the accelerator you deploy on.

Ship the cache in an image by running this verb during image build on a
builder with the target accelerator, or mount a shared cache volume.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import numpy as np


def warmup_two_group(
    *,
    n_sites,
    samples_per_group=2,
    chroms=1,
    cache_dir=None,
    keep_dir=None,
    **run_kwargs,
):
    """Run the full two-group pipeline on synthetic counts of shape
    (n_sites, samples_per_group) so every device program lands in the
    persistent compile cache. run_kwargs are forwarded to run_two_group
    (segment_size, streaming_blocks, inference_seeds, ...).

    Returns the wall seconds spent (the one-time cost being amortised).
    """
    import jax

    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from hygeia_tpu.pipeline.orchestrator import run_two_group
    from hygeia_tpu.utils import io as hio

    root = keep_dir or tempfile.mkdtemp(prefix="hygeia_warmup_")
    pre = os.path.join(root, "pre")
    os.makedirs(pre, exist_ok=True)
    rng = np.random.default_rng(0)
    names = [f"w{i}" for i in range(int(chroms))]
    t0 = time.time()
    for cname in names:
        n_c = rng.poisson(30, size=(n_sites, samples_per_group)).astype(np.int32)
        n_k = rng.poisson(30, size=(n_sites, samples_per_group)).astype(np.int32)
        y_c = rng.binomial(n_c, 0.5).astype(np.int32)
        y_k = rng.binomial(n_k, 0.5).astype(np.int32)
        hio.write_count_matrix(
            os.path.join(pre, f"positions_{cname}.txt.gz"),
            np.arange(1, n_sites + 1, dtype=np.int64) * 37,
        )
        hio.write_count_matrix(
            os.path.join(pre, f"n_total_reads_control_{cname}.txt.gz"), n_c
        )
        hio.write_count_matrix(
            os.path.join(pre, f"n_total_reads_case_{cname}.txt.gz"), n_k
        )
        hio.write_count_matrix(
            os.path.join(pre, f"n_methylated_reads_control_{cname}.txt.gz"), y_c
        )
        hio.write_count_matrix(
            os.path.join(pre, f"n_methylated_reads_case_{cname}.txt.gz"), y_k
        )
    run_two_group(
        output_dir=os.path.join(root, "out"),
        chroms=names,
        preprocessed_dir=pre,
        resume=False,
        **run_kwargs,
    )
    wall = time.time() - t0
    if not keep_dir:
        shutil.rmtree(root, ignore_errors=True)
    return wall
