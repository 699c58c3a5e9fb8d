"""Batched-lambda transposed-layout VPU kernels: ONE streamed read of A
serves ALL lambda-path points simultaneously (round 4).

Why: the fused VPU sweep (ops/bcd_sweep_vpu.py) is HBM-bandwidth-bound —
~2 VPU MACs per A element at ~500-640 GB/s.  A warm-started lambda path
re-reads A once per sweep PER PATH POINT.  Batching L iterates against the
same A block turns the sweep into ~2L MACs per element at the SAME one
HBM read: for L ~ 10 the VPU has the spare throughput (v5e VPU peak is
far above 2 flops/byte at 800 GB/s), so a whole 10-point path costs about
as many A-reads as ONE point.  The trade: batched points solve COLD (no
warm starts — every lambda iterates from 0 until its own certificate),
so total sweeps = max over points, not sum; the win is that those sweeps
are shared.

Layout (mirrors the proven single-lambda kernels — same Mosaic rules):
  * A_t (n_blocks, B, m): per-step (1, B, m) block, lane dim = m;
  * X (n_blocks, L, B): per-step (1, L, B) — L iterate ROWS per block
    (sublane dim = L, lane dim = B; no 1-lane operands anywhere);
  * R (L, m): resident accumulator rows, one per lambda;
  * per-lambda thresholds lam1s live in SMEM scalars; per-row (L, 1)
    threshold columns are built in-kernel from SMEM (a (L, 1) VMEM input
    would be a pathological 1-lane operand at the call boundary);
  * phase 1/2 are the same lane-chunked broadcast-multiply-reduces as the
    single-lambda kernel, statically unrolled over the L rows.

HARDWARE VALIDATION PENDING (PARITY.md risk ledger rule): these kernels
reuse only patterns the round-2/3 kernels validated on the chip (chunked
(B,c)x(1,c) reduces, identity-dot transposes, one-hot group matmuls at
HIGHEST, static sublane row slicing of a resident (L, m) block — the last
one is new at L > 1), but Mosaic has hardware-only rejections interpret
mode cannot catch; run tests/test_batched_path.py's parity case on the
chip before trusting production numbers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convex_optimization_tpu.ops.bcd_sweep_vpu import (
    _LANE_CHUNK,
    _VMEM_BUDGET_BYTES,
    _chunks,
    _t_col_to_row,
    _t_row_to_col,
)

MAX_BATCH = 16  # VPU stays under ~2L flops/byte headroom; VMEM model below


def fits_vmem_vpu_batch(m: int, block: int, L: int,
                        dtype=jnp.float32, masked: bool = False) -> bool:
    """VMEM model: double-buffered (B, m) A block, (L, m) residual rows
    in + out (sublane-padded to 8), the (B, chunk) product temporaries
    (charge 2), the small (L, B) per-step vectors (charge 4: x in/out,
    v, dx), and — with ``masked`` — one resident (1, m) row-mask
    (sublane-padded to 8)."""
    if block <= 0 or L <= 0:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    L8 = max(8, -(-L // 8) * 8)
    a_bytes = 2 * block * m * itemsize
    r_bytes = 2 * L8 * m * itemsize
    if masked:
        r_bytes += 8 * m * itemsize
    tmp = 2 * block * min(m, _LANE_CHUNK) * itemsize
    small = 4 * L8 * max(block, 128) * itemsize
    return a_bytes + r_bytes + tmp + small <= _VMEM_BUDGET_BYTES


def eligible_vpu_batch(m: int, n: int, block: int, L: int,
                       dtype=jnp.float32, masked: bool = False) -> bool:
    return (jnp.dtype(dtype) == jnp.float32
            and 1 <= L <= MAX_BATCH
            and block % 8 == 0 and block >= 8
            and n % block == 0
            and m % 8 == 0
            and fits_vmem_vpu_batch(m, block, L, dtype, masked))


def _tl_col(scalars_ref, t, L, offset):
    """(L, 1) per-row scalar column from SMEM values scaled by t."""
    rows = [jnp.full((1, 1), t * scalars_ref[offset + l], jnp.float32)
            for l in range(L)]
    return jnp.concatenate(rows, axis=0) if L > 1 else rows[0]


def _batch_kernel(kind: str, gsize: int, B: int, m: int, L: int,
                  masked: bool, *refs):
    """One Gauss-Seidel sweep step for block j, all L lambdas at once.
    scalars = [lam2, lam1_0, ..., lam1_{L-1}].

    With ``masked``, a resident (1, m) row mask gates the phase-2 residual
    update: r_l += rm * (A_j^T dx_l).  This is EXACTLY the sweep of the
    row-masked problem (A_f = rm ⊙ A, b_f = rm ⊙ b) as long as the
    residual rows come in masked — phase 1 then needs no change because
    (rm ⊙ A_j) r = A_j (rm ⊙ r) = A_j r for an already-masked r, and
    rm ∈ {0,1} makes the masked update bit-identical to sweeping a masked
    COPY of A (0 or the very same f32 sum).  One (1, m) multiply per
    chunk in VMEM replaces k full-size masked copies of A (K-fold CV)."""
    if masked:
        # the row mask arrives in ANY/HBM and is DMA'd into VMEM scratch
        # ONCE at the first grid step: bound as a second constant-map VMEM
        # input (alongside the r_init/r_out pair) it crashed the TPU
        # worker at production grid sizes (nb=1250; fine at nb=4 — the r5
        # CV-headline crash, isolated by scripts/probe_cv_stages.py) and
        # is the exact constant-vector pattern CLAUDE.md prescribes
        # pl.ANY + manual DMA for (see matvec_pallas._atr_kernel).
        (scalars_ref, steps_ref, w_ref, A_ref, x_ref, mask_ref, rm_hbm,
         r_init_ref, x_out_ref, r_ref, rm_ref, rm_sem) = refs
    else:
        (scalars_ref, steps_ref, w_ref, A_ref, x_ref, mask_ref,
         r_init_ref, x_out_ref, r_ref) = refs
        rm_ref = None
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        r_ref[:] = r_init_ref[:]
        if masked:
            dma = pltpu.make_async_copy(rm_hbm, rm_ref, rm_sem)
            dma.start()
            dma.wait()

    # ---- phase 1: g_l = sum_lanes(A_t[j] * r_l), one row per lambda ----
    g_rows = []
    for l in range(L):
        g_col = jnp.zeros((B, 1), jnp.float32)
        for c0, c1 in _chunks(m):
            a = A_ref[0, :, c0:c1]                  # (B, c) — shared read
            rr = r_ref[l:l + 1, c0:c1]              # (1, c)
            g_col = g_col + jnp.sum(a * rr, axis=1, keepdims=True)
        g_rows.append(_t_col_to_row(g_col, B))      # (1, B)
    g = jnp.concatenate(g_rows, axis=0) if L > 1 else g_rows[0]   # (L, B)

    # ---- prox, (L, B) rows with per-row thresholds ----
    xj = x_ref[0]                                   # (L, B)
    lam2 = scalars_ref[0]
    t = steps_ref[j]
    v = xj - t * (g + lam2 * xj)
    tl = _tl_col(scalars_ref, t, L, 1)              # (L, 1)
    if kind == "l1":
        x_new = jnp.sign(v) * jnp.maximum(jnp.abs(v) - tl, 0.0)
    elif kind == "nonneg_l1":
        x_new = jnp.maximum(v - tl, 0.0)
    elif kind == "group_l2":
        gpb = B // gsize
        lane_g = jax.lax.broadcasted_iota(jnp.int32, (B, gpb), 0) // gsize
        gcol = jax.lax.broadcasted_iota(jnp.int32, (B, gpb), 1)
        M = (lane_g == gcol).astype(jnp.float32)
        gn2 = jax.lax.dot_general(
            v * v, M, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)    # (L, gpb)
        gn = jnp.sqrt(gn2)
        wj = w_ref[0]                               # (1, gpb), broadcasts
        scale_g = jnp.maximum(0.0, 1.0 - tl * wj / jnp.maximum(gn, 1e-30))
        scale = jax.lax.dot_general(
            scale_g, M, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)    # (L, B)
        x_new = v * scale
    else:
        raise ValueError(f"unknown penalty kind {kind!r}")

    x_new = jnp.where(mask_ref[0] > 0, x_new, 0.0)  # (1, B) mask broadcasts
    dx = x_new - xj                                 # (L, B)
    x_out_ref[0] = x_new

    # ---- phase 2: r_l += sum_sublanes(A_t[j] * dx_l), SAME block ----
    for l in range(L):
        dx_col = _t_row_to_col(dx[l:l + 1], B)      # (B, 1)
        for c0, c1 in _chunks(m):
            a = A_ref[0, :, c0:c1]
            upd = jnp.sum(a * dx_col, axis=0, keepdims=True)
            if masked:
                upd = rm_ref[:, c0:c1] * upd        # (1, c) row-mask gate
            r_ref[l:l + 1, c0:c1] += upd


def batch_sweep_vpu(A_t, X, R, steps, lam1s, lam2, *, kind: str,
                    gsize: int = 1, weights=None, mask=None,
                    row_mask=None, interpret: bool | None = None):
    """One batched Gauss-Seidel sweep.  X (n_blocks, L, B), R (L, m);
    returns (X, R) updated.  steps (n_blocks,) shared across lambdas
    (block Lipschitz is lambda-independent); lam1s (L,).

    ``row_mask`` ((m,), 0/1) sweeps the ROW-MASKED problem (rm ⊙ A,
    rm ⊙ b) without materializing a masked copy of A: callers must pass
    residual rows that are already masked (R = rm ⊙ (A x - b)); the
    kernel gates its incremental residual updates with the mask so they
    stay that way.  K-fold CV rides this: fold data is one (m,) vector,
    A is shared by every fold."""
    n_blocks, B, m = A_t.shape
    L = X.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if kind == "group_l2":
        w = weights.reshape(n_blocks, 1, B // gsize)
    else:
        w = jnp.zeros((n_blocks, 1, 1), A_t.dtype)
    if mask is None:
        mask = jnp.ones((n_blocks, 1, B), A_t.dtype)

    scalars = jnp.concatenate([
        jnp.asarray([lam2], A_t.dtype),
        jnp.asarray(lam1s, A_t.dtype).reshape(-1)])

    masked = row_mask is not None
    kernel = functools.partial(_batch_kernel, kind, gsize, B, m, L, masked)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),               # scalars
        pl.BlockSpec(memory_space=pltpu.SMEM),               # steps
        pl.BlockSpec((1, 1, w.shape[2]), lambda j: (j, 0, 0),
                     memory_space=pltpu.VMEM),               # weights
        pl.BlockSpec((1, B, m), lambda j: (j, 0, 0),
                     memory_space=pltpu.VMEM),               # A_t stream
        pl.BlockSpec((1, L, B), lambda j: (j, 0, 0),
                     memory_space=pltpu.VMEM),               # X_j
        pl.BlockSpec((1, 1, B), lambda j: (j, 0, 0),
                     memory_space=pltpu.VMEM),               # mask_j
    ]
    operands = [scalars, steps, w, A_t, X, mask]
    if masked:
        # ANY/HBM + in-kernel DMA staging — NOT a constant-map VMEM input
        # (that pattern, combined with the r_init/r_out constant-map pair,
        # crashed the worker at production grid sizes; kernel docstring)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # row mask
        operands.append(jnp.asarray(row_mask, A_t.dtype).reshape(1, m))
    in_specs.append(pl.BlockSpec((L, m), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM))   # R init
    operands.append(R)
    scratch_shapes = ([pltpu.VMEM((1, m), A_t.dtype),
                       pltpu.SemaphoreType.DMA] if masked else [])

    x_out, r_out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, L, B), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),               # X out
            pl.BlockSpec((L, m), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),               # R out
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, L, B), A_t.dtype),
            jax.ShapeDtypeStruct((L, m), A_t.dtype),
        ],
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n_blocks * B * L,
            bytes_accessed=m * n_blocks * B * 4 + 8 * n_blocks * B * L * 4
            + 8 * m * L * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return x_out, r_out


def _ax_batch_kernel(m, n_blocks, L, A_ref, x_ref, b_ref, r_ref, acc):
    """R_l = sum_j A_j x_{j,l} - b: batched residual refresh.  VMEM-scratch
    accumulator + final flush (see matvec_pallas._ax_kernel's note)."""
    j = pl.program_id(0)

    B = x_ref.shape[2]

    @pl.when(j == 0)
    def _init():
        acc[:] = -jnp.broadcast_to(b_ref[:], acc.shape)

    for l in range(L):
        xj = _t_row_to_col(x_ref[0, l:l + 1], B)    # (B, 1)
        for c0, c1 in _chunks(m):
            a = A_ref[0, :, c0:c1]
            acc[l:l + 1, c0:c1] += jnp.sum(a * xj, axis=0, keepdims=True)

    @pl.when(j == n_blocks - 1)
    def _flush():
        r_ref[:] = acc[:]


def ax_minus_b_batch_t(A_t, X, b, *, interpret: bool | None = None):
    """R = A X - b rows: X (n_blocks, L, B) -> R (L, m), one pass over A."""
    n_blocks, B, m = A_t.shape
    L = X.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_ax_batch_kernel, m, n_blocks, L),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, B, m), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, B), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, m), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, m), A_t.dtype),
        scratch_shapes=[pltpu.VMEM((L, m), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n_blocks * B * L,
            bytes_accessed=m * n_blocks * B * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A_t, X, b.reshape(1, m))


def _atr_batch_kernel(m, L, scalars_ref, A_ref, r_hbm, x_ref, z_ref,
                      r_vmem, sem):
    """Z_{j,l} = -(A_j^T r_l) - lam2 x_{j,l}: batched dual witness.  R is
    DMA'd into VMEM once (constant-map VMEM input would re-fetch per grid
    step — matvec_pallas._atr_kernel's note)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _stage():
        dma = pltpu.make_async_copy(r_hbm, r_vmem, sem)
        dma.start()
        dma.wait()

    lam2 = scalars_ref[0]
    B = z_ref.shape[2]
    rows = []
    for l in range(L):
        g = jnp.zeros((B, 1), jnp.float32)
        for c0, c1 in _chunks(m):
            a = A_ref[0, :, c0:c1]
            rr = r_vmem[l:l + 1, c0:c1]
            g = g + jnp.sum(a * rr, axis=1, keepdims=True)
        rows.append(-_t_col_to_row(g, B))
    z = jnp.concatenate(rows, axis=0) if L > 1 else rows[0]
    z_ref[0] = z - lam2 * x_ref[0]


def neg_at_r_batch_t(A_t, R, X, lam2, *, interpret: bool | None = None):
    """Z = -(A^T R) - lam2 X batched: R (L, m), X (n_blocks, L, B) ->
    Z (n_blocks, L, B), one pass over A."""
    n_blocks, B, m = A_t.shape
    L = X.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scalars = jnp.asarray([lam2], A_t.dtype)
    return pl.pallas_call(
        functools.partial(_atr_batch_kernel, m, L),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, m), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),    # R: staged once by DMA
            pl.BlockSpec((1, L, B), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, B), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, L, B), A_t.dtype),
        scratch_shapes=[
            pltpu.VMEM((L, m), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n_blocks * B * L,
            bytes_accessed=m * n_blocks * B * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, A_t, R, X)
