"""Full-production-shape on-chip run (VERDICT round-1 item 3).

One real (chrom, batch) INFER work unit at the reference's production shape
(run_inference_two_groups.py:194-218 window semantics): segment_size=100000
CpG sites with 5000-site halo buffers on BOTH sides (batch=1 of a 215k-site
chromosome -> a 110k-site device scan returning 100k trimmed sites), M=50 ->
N=2400 particles, B=25 backward samples, R=6, 2 samples/group, 2 seeds
vmapped through `infer_segment` — the exact path `hygeia infer` runs.

The per-seed filter history is ~6.3 GB (T*N*(4B weights + 5*4B particle
fields)), so the HBM-budget seed-chunking path (runner.py) must engage:
2 seeds -> 2 device dispatches. Reports per-pass wall times from the
runner's own timing files, end-to-end sites/s, peak HBM, and the
degenerate-step counters (must be 0).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/production_run.py
"""

import ast
import json
import os
import time
from pathlib import Path

import numpy as np

T_TOTAL = 215_000
SEG, BUF = 100_000, 5_000
BATCH = 1  # both halos engaged
M, B, R = 50, 25, 6
SEEDS = [int(s) for s in os.environ.get("HYGEIA_PROD_SEEDS", "0,1").split(",")]
# Streaming block size (0 = monolithic fused path). The streamed path keeps
# several seeds resident per dispatch — residency is throughput here.
STREAM_W = int(os.environ.get("HYGEIA_PROD_STREAM", 0))


def build_fixture(root: Path):
    from hygeia_tpu.single_group.model import parameters_to_theta
    from hygeia_tpu.utils import io as hio

    data, sg = root / "data", root / "sg"
    data.mkdir(parents=True, exist_ok=True)
    sg.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    P = rng.dirichlet(np.ones(R - 1), size=R)
    Pfull = np.zeros((R, R))
    for r in range(R):
        Pfull[r, [c for c in range(R) if c != r]] = P[r]
    hio.write_theta(
        sg / "theta_prod.csv.gz", parameters_to_theta(Pfull, np.full(R, 0.9))
    )
    n_c = rng.poisson(30, size=(T_TOTAL, 2)).astype(np.float32)
    n_k = rng.poisson(30, size=(T_TOTAL, 2)).astype(np.float32)
    y_c = np.minimum(rng.poisson(10, size=(T_TOTAL, 2)), n_c)
    y_k = np.minimum(rng.poisson(10, size=(T_TOTAL, 2)), n_k)
    hio.write_count_matrix(data / "positions_prod.txt.gz", np.arange(1, T_TOTAL + 1) * 13)
    hio.write_count_matrix(data / "n_total_reads_control_prod.txt.gz", n_c)
    hio.write_count_matrix(data / "n_total_reads_case_prod.txt.gz", n_k)
    hio.write_count_matrix(data / "n_methylated_reads_control_prod.txt.gz", y_c)
    hio.write_count_matrix(data / "n_methylated_reads_case_prod.txt.gz", y_k)
    return data, sg


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from hygeia_tpu.two_group.runner import infer_segment

    root = Path(os.environ.get("HYGEIA_PROD_DIR", "/tmp/hygeia_prod"))
    t0 = time.time()
    if (root / "data" / "positions_prod.txt.gz").exists():
        data, sg = root / "data", root / "sg"
        print("fixture reused", flush=True)
    else:
        data, sg = build_fixture(root)
        print(f"fixture built in {time.time() - t0:.1f}s", flush=True)

    results = root / ("results_stream" if STREAM_W else "results")
    t0 = time.time()
    infer_segment(
        data_dir=str(data),
        single_group_dir=str(sg),
        results_dir=str(results),
        chrom="prod",
        batch=BATCH,
        seed=SEEDS,
        segment_size=SEG,
        buffer_size=BUF,
        num_resampled_particles=(M,),
        num_samples_backward=B,
        streaming_blocks=STREAM_W or None,
    )
    wall = time.time() - t0
    dev = jax.local_devices()[0]
    stats = dev.memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0)

    N = M * (2 * R + R * R)
    out = results / f"chrom_prod_{BATCH}"
    times_f, times_b = {}, {}
    for s in SEEDS:
        times_f[s] = ast.literal_eval((out / f"optimal_time_{s}.txt").read_text())
        times_b[s] = ast.literal_eval(
            (out / f"optimal_time_backward_{s}.txt").read_text()
        )
    device_s = sum(times_f[s][N] + times_b[s][N] for s in SEEDS)
    n_sites_device = (SEG + 2 * BUF) * len(SEEDS)  # computed sites incl. halos
    n_sites_out = SEG * len(SEEDS)  # returned sites
    print(
        json.dumps(
            {
                "metric": "production_segment_sites_per_sec",
                "computed_sites_per_sec_device": round(n_sites_device / device_s, 1),
                "returned_sites_per_sec_device": round(n_sites_out / device_s, 1),
                "wall_s_total_incl_io_compile": round(wall, 1),
                "filter_s_per_seed": {s: round(times_f[s][N], 2) for s in SEEDS},
                "backward_s_per_seed": {s: round(times_b[s][N], 2) for s in SEEDS},
                "peak_hbm_gb": round(peak / 2**30, 2),
                "T_device": SEG + 2 * BUF,
                "N": N,
                "B": B,
                "seeds": len(SEEDS),
                "streaming_blocks": STREAM_W,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
