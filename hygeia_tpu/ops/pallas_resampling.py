"""Pallas fused optimal-finite-state resampler (VERDICT round-3 item 6).

PERF.md's roofline analysis puts the two-group filter step on a ~69 us
dependent-op chain (8 vmapped units); the optimal resampler's serial
sub-chain (logsumexp -> top_k(N, M+1) -> c-threshold scan -> residual CDF)
is ~31% of it and consists of many small VPU/reduce ops with XLA fusion
boundaries between them. This kernel fuses the WHOLE resampler into one
Pallas program so every intermediate lives in VMEM/registers:

  * exact descending top-(M+1) by M+1 rounds of (max, min-index, mask) over
    the (NB, 128) weight grid — same tie order as lax.top_k (lowest index
    first);
  * Fearnhead c-threshold candidate scan on (SLOTS, 1) sublane vectors,
    suffix masses by an MXU upper-triangular matmul;
  * residual systematic + multinomial-fallback selection by comparison
    counts against an MXU blocked-triangular prefix sum (ops/resampling's
    scatter-free machinery, in-kernel);
  * the C++ post-resampling weight semantics (resample.h:350-364) emitted
    from the already-resident top values — no gather.

Semantics mirror ops/resampling.optimal_finite_state_resampling under the
normalized=True contract (the filter renormalises carried weights every
step); uniforms are drawn OUTSIDE and passed in, so the JAX key stream stays
identical in shape (but realisations differ from the XLA path at f32
rounding boundaries — the kernel is opt-in via filter's pallas_resample
flag / HYGEIA_PALLAS_RESAMPLE=1, never silently swapped).

Layout: N padded to a multiple of 128 and viewed (NB, 128); per-slot vectors
ride (SLOTS=128, 1) sublanes so slot-indexed arithmetic is 2D iota math,
never a transpose. Requires M + 1 <= 128 (production M = 50).

Correctness: tests/test_pallas_resampling.py checks parents/log_c/weights
against the XLA implementation on shared uniforms (interpret mode on CPU,
compiled on TPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_SLOTS = 128  # sublane count for per-slot vectors; M + 1 must fit
_NEG = -1e30  # -inf stand-in inside the kernel (f32 algebra)
_BIG_I = 2**30


def _kernel(lw_ref, u_ref, um_ref, parents_ref, neww_ref, topidx_ref, meta_ref, m_scalar):
    """One fused resampler. Refs:
    lw:      (NB, 128) f32, -1e30 padded, normalized (logsumexp == 0)
    u:       (1, 1) f32 systematic uniform
    um:      (SLOTS, 1) f32 multinomial-fallback uniforms
    parents: (SLOTS, 1) i32 out       neww: (SLOTS, 1) f32 out
    topidx:  (SLOTS, 1) i32 out       meta: (1, 1+1) f32 out [log_c, bad]
    """
    from jax.lax import broadcasted_iota

    m = m_scalar  # static python int
    kk = m + 1
    lw = lw_ref[:]
    nb = lw.shape[0]
    n = nb * 128
    gi = (
        broadcasted_iota(jnp.int32, lw.shape, 0) * 128
        + broadcasted_iota(jnp.int32, lw.shape, 1)
    )  # global element index
    slot = broadcasted_iota(jnp.int32, (_SLOTS, 1), 0)
    slot_f = slot.astype(jnp.float32)

    # --- exact top-(M+1): value + first index per round --------------------
    def round_(k, carry):
        work, top_lw, top_idx = carry
        mval = jnp.max(work)
        midx = jnp.min(jnp.where(work == mval, gi, _BIG_I))
        sel = (slot == k).astype(jnp.float32)
        top_lw = top_lw + sel * mval
        top_idx = top_idx + (slot == k).astype(jnp.int32) * midx
        work = jnp.where(gi == midx, _NEG, work)
        return work, top_lw, top_idx

    work0 = lw
    top_lw0 = jnp.zeros((_SLOTS, 1), jnp.float32)
    top_idx0 = jnp.zeros((_SLOTS, 1), jnp.int32)
    work, top_lw, top_idx = jax.lax.fori_loop(
        0, kk, round_, (work0, top_lw0, top_idx0)
    )
    live_slot = slot < kk
    top_lw = jnp.where(live_slot, top_lw, _NEG)
    top_q = jnp.where(live_slot, jnp.exp(top_lw), 0.0)

    # --- c-threshold candidate scan ----------------------------------------
    # tail mass: everything outside the top-kk set (they are -1e30 in work).
    tail = jnp.sum(jnp.where(work > _NEG * 0.5, jnp.exp(work), 0.0))
    # suffix_k = tail + sum_{j >= k} top_q[j]: upper-tri matmul on sublanes.
    triu = (
        broadcasted_iota(jnp.int32, (_SLOTS, _SLOTS), 1)
        >= broadcasted_iota(jnp.int32, (_SLOTS, _SLOTS), 0)
    ).astype(jnp.float32)
    suffix = (
        jax.lax.dot_general(
            triu, top_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + tail
    )  # (SLOTS, 1)
    log_c_k = jnp.log(jnp.maximum(m - slot_f, 0.0)) - jnp.log(suffix)
    below = log_c_k + top_lw <= 0.0
    # prev_lw[k] = top_lw[k-1] with +inf at k = 0 — a sublane shift done as
    # a matmul against a one-off-diagonal matrix (no lane<->sublane reshape).
    shift = (
        broadcasted_iota(jnp.int32, (_SLOTS, _SLOTS), 1)
        == broadcasted_iota(jnp.int32, (_SLOTS, _SLOTS), 0) - 1
    ).astype(jnp.float32)
    prev_lw = jax.lax.dot_general(
        shift, top_lw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    prev_lw = jnp.where(slot == 0, jnp.float32(jnp.inf), prev_lw)
    ok = below & (log_c_k + prev_lw >= 0.0) & (slot <= m) & live_slot
    any_ok = jnp.any(ok)
    k_star = jnp.min(jnp.where(ok, slot, _BIG_I))
    k_star = jnp.where(any_ok, k_star, n)
    log_c = jnp.where(
        any_ok,
        jnp.sum(jnp.where(slot == jnp.minimum(k_star, kk - 1), log_c_k, 0.0)),
        _NEG,
    )
    bad = ~any_ok  # multinomial-fallback flag (log_c non-finite)

    # --- residual weights: exp(lw) minus the first k_star top entries ------
    # work has ALL kk top entries removed; add back those with k >= k_star.
    resid = jnp.where(work > _NEG * 0.5, jnp.exp(work), 0.0)
    for k in range(kk):  # static unroll: Mosaic lacks dynamic_slice on values
        idx_k = jnp.sum(jnp.where(slot == k, top_idx, 0), dtype=jnp.int32)
        q_k = jnp.sum(jnp.where(slot == k, top_q, 0.0))
        resid = resid + jnp.where((k >= k_star) & (gi == idx_k), q_k, 0.0)

    # --- prefix sums (blocked tril on the MXU) ------------------------------
    tril128 = (
        broadcasted_iota(jnp.int32, (128, 128), 1)
        <= broadcasted_iota(jnp.int32, (128, 128), 0)
    ).astype(jnp.float32)

    def prefix(x):  # (NB, 128) -> inclusive global prefix, same shape
        within = jax.lax.dot_general(
            x, tril128, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # within[r, l] = sum_{j <= l} x[r, j]
        row_tot = within[:, 127:128]  # (NB, 1)
        tril_nb = (
            broadcasted_iota(jnp.int32, (nb, nb), 1)
            < broadcasted_iota(jnp.int32, (nb, nb), 0)
        ).astype(jnp.float32)
        offs = jax.lax.dot_general(
            tril_nb, row_tot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # exclusive row offsets
        return within + offs

    q_resid = prefix(resid)
    q_tot = jnp.sum(resid)

    # --- residual systematic grid + comparison-count selection -------------
    u = u_ref[0, 0]
    l_den = jnp.maximum(m - k_star, 1).astype(jnp.float32)
    grid_idx = jnp.clip(slot - k_star, 0, m - 1).astype(jnp.float32)
    t_sys = (grid_idx + u) / l_den * q_tot  # (SLOTS, 1)

    def count_below(q, t, strict_left=True):
        # counts[s] = #{elements i: q_i < t_s} (or <=). Static python loop
        # over the nb row blocks with STATIC slices (Mosaic has no
        # dynamic_slice on values); each round is a (SLOTS, 128) compare.
        acc = jnp.zeros((_SLOTS, 1), jnp.int32)
        for r in range(nb):
            q_row = q[r : r + 1, :]  # (1, 128) static slice
            cmp = (
                (q_row < t) if strict_left else (q_row <= t)
            ).astype(jnp.int32)
            acc = acc + jnp.sum(cmp, axis=1, keepdims=True, dtype=jnp.int32)
        return acc

    sys_parents = jnp.clip(count_below(q_resid, t_sys), 0, n - 1)
    kept_parents = top_idx
    parents = jnp.where(slot < k_star, kept_parents, sys_parents)

    # --- multinomial fallback ------------------------------------------------
    q_all = prefix(jnp.where(lw > _NEG * 0.5, jnp.exp(lw), 0.0))
    qa_tot = jnp.sum(jnp.where(lw > _NEG * 0.5, jnp.exp(lw), 0.0))
    t_mult = um_ref[:] * qa_tot
    mult_parents = jnp.clip(
        count_below(q_all, t_mult, strict_left=False), 0, n - 1
    )
    parents = jnp.where(bad, mult_parents, parents)

    # --- post-resampling weights (resample.h:350-364) ------------------------
    log_m = jnp.log(jnp.float32(m))
    new_w = jnp.where(slot < k_star, top_lw, -log_c)
    new_w = jnp.where(bad, -log_m, new_w)

    parents_ref[:] = parents.astype(jnp.int32)
    neww_ref[:] = new_w
    topidx_ref[:] = top_idx.astype(jnp.int32)
    # Vector store (Mosaic cannot store scalars to VMEM): lane 0 = log_c,
    # lane 1 = the fallback flag.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 2), 1)
    meta_ref[:] = jnp.where(
        col == 0, jnp.where(bad, 0.0, log_c), bad.astype(jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("num_offspring", "interpret"))
def optimal_finite_state_resampling_pallas(
    key, log_norm_weights, num_offspring, *, interpret=False
):
    """Drop-in for ops/resampling.optimal_finite_state_resampling under the
    normalized=True contract, computed by one fused Pallas kernel.

    Same key-split discipline as the XLA path (sys key + mult key), so the
    filter's key stream is unchanged; selections can differ at f32 rounding
    boundaries (documented opt-in path).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from hygeia_tpu.ops.resampling import ResampleResult

    m = int(num_offspring)
    if m + 1 > _SLOTS:
        raise ValueError(f"pallas resampler needs M + 1 <= {_SLOTS}")
    n = log_norm_weights.shape[0]
    nb = -(-n // 128)
    lw = jnp.where(
        jnp.isfinite(log_norm_weights), log_norm_weights, _NEG
    ).astype(jnp.float32)
    lw = jnp.pad(lw, (0, nb * 128 - n), constant_values=_NEG).reshape(nb, 128)

    key_sys, key_mult = jax.random.split(key)
    u = jax.random.uniform(key_sys, (1, 1), dtype=jnp.float32)
    um = jax.random.uniform(key_mult, (_SLOTS, 1), dtype=jnp.float32)

    parents, new_w, top_idx, meta = pl.pallas_call(
        functools.partial(_kernel, m_scalar=m),
        out_shape=(
            jax.ShapeDtypeStruct((_SLOTS, 1), jnp.int32),
            jax.ShapeDtypeStruct((_SLOTS, 1), jnp.float32),
            jax.ShapeDtypeStruct((_SLOTS, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(lw, u, um)

    log_c = meta[0, 0]
    bad = meta[0, 1] > 0.5
    dtype = log_norm_weights.dtype
    return ResampleResult(
        parent_indices=jnp.clip(parents[:m, 0], 0, n - 1),
        log_c=jnp.where(bad, jnp.asarray(0.0, jnp.float32), log_c).astype(dtype),
        use_unbiased=bad,
        new_log_weights=new_w[:m, 0].astype(dtype),
        top_m_indices=jnp.clip(top_idx[:m, 0], 0, n - 1),
    )
