"""Fused Pallas (Mosaic-TPU) block-coordinate sweep — the TPU-native
equivalent of the reference's CUDA backend (SURVEY.md C4 and section 2.1's
native-component ledger).

One ``pallas_call`` executes a FULL Gauss-Seidel sweep over all column
blocks.  The grid iterates blocks j = 0..n_blocks-1 (sequential on a TPU
core, which is exactly the Gauss-Seidel dependency), and per step:

    g_j   = A_j^T r            (MXU, A_j resident in VMEM)
    x_j'  = prox_{t_j g}(x_j - t_j (g_j + lam2 x_j))   (VPU)
    r    += A_j (x_j' - x_j)   (MXU, SAME VMEM-resident A_j)
    x_j   = x_j'

Why this beats the XLA-fused scan (ops/bcd_sweep_ref.py): the sweep is
HBM-bandwidth-bound on A, and the scan reads each A_j twice per step (once
per matvec).  Here A_j is DMA'd HBM->VMEM once and used for BOTH matvecs —
one full pass over A per sweep instead of two — while Pallas's automatic
pipelining prefetches A_{j+1} during block j's compute, and the residual
lives in VMEM for the whole sweep (it is an output block whose index map is
constant, so Mosaic keeps it on-chip and writes it back once at the end).

Constraint: double-buffered A_j must fit VMEM (2 * m * B * 4 bytes plus
residual/iterate overhead).  ``fits_vmem`` reports this; the BCD driver
falls back to the jnp oracle sweep otherwise (large-m support via an
m-tiled two-phase kernel is tracked in ops/ as follow-up work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convex_optimization_tpu.core.problem import Problem

# VMEM budget for the kernel's working set (v5e has ~16 MB more is risky
# once pipelining buffers and the residual are counted).
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem(m: int, block: int, dtype=jnp.float32) -> bool:
    """True if the resident-A_j kernel's working set fits the VMEM budget."""
    itemsize = jnp.dtype(dtype).itemsize
    a_bytes = 2 * m * block * itemsize          # double-buffered A_j
    r_bytes = 3 * 8 * m * itemsize              # (1, m) arrays pad to 8 rows
    return a_bytes + r_bytes <= _VMEM_BUDGET_BYTES


def _sweep_kernel(kind: str, gsize: int,
                  lam1_ref, lam2_ref, step_ref, w_ref, A_ref, x_ref,
                  mask_ref, r_init_ref, x_out_ref, r_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        r_ref[:] = r_init_ref[:]

    Aj = A_ref[:]                     # (m, B), resident in VMEM
    xj = x_ref[:]                     # (1, B)
    r = r_ref[:]                      # (1, m)

    # g_j = A_j^T r  -> (1, B): contract the m axis on the MXU
    g = jax.lax.dot_general(
        r, Aj, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    g = g + lam2_ref[0, 0] * xj

    t = step_ref[0, 0]
    v = xj - t * g
    tl = t * lam1_ref[0, 0]
    if kind == "l1":
        x_new = jnp.sign(v) * jnp.maximum(jnp.abs(v) - tl, 0.0)
    elif kind == "nonneg_l1":
        x_new = jnp.maximum(v - tl, 0.0)
    elif kind == "group_l2":
        B = v.shape[1]
        vg = v.reshape(B // gsize, gsize)
        gn = jnp.sqrt(jnp.sum(vg * vg, axis=1, keepdims=True))
        w = w_ref[:].reshape(B // gsize, 1)
        scale = jnp.maximum(0.0, 1.0 - tl * w / jnp.maximum(gn, 1e-30))
        x_new = (vg * scale).reshape(1, B)
    else:
        raise ValueError(f"unknown penalty kind {kind!r}")

    x_new = jnp.where(mask_ref[:] > 0, x_new, xj)
    dx = x_new - xj

    # r += A_j dx  -> (1, m): contract the B axis, SAME resident A_j
    dr = jax.lax.dot_general(
        dx, Aj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    r_ref[:] = r + dr
    x_out_ref[:] = x_new


def bcd_sweep_pallas(
    problem: Problem,
    x: jax.Array,
    r: jax.Array,
    block_L: jax.Array,
    *,
    step_scale: float = 1.0,
    keep_mask: jax.Array | None = None,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One fused Gauss-Seidel sweep (cyclic order).  Returns (x, r).

    Drop-in for ops.bcd_sweep_ref.bcd_sweep_ref with block_order = arange
    (parity tested in tests/test_pallas_sweep.py; the jnp sweep is the
    oracle).  Falls back to the oracle when the working set cannot fit VMEM
    or the dtype is not float32.
    """
    A, lam2, penalty = problem.A, problem.lam2, problem.penalty
    m, n = A.shape
    n_blocks = block_L.shape[0]
    if n % n_blocks != 0:
        raise ValueError(f"n={n} not divisible by n_blocks={n_blocks}")
    B = n // n_blocks

    if A.dtype != jnp.float32 or not fits_vmem(m, B, A.dtype):
        from convex_optimization_tpu.ops.bcd_sweep_ref import bcd_sweep_ref

        order = jnp.arange(n_blocks, dtype=jnp.int32)
        return bcd_sweep_ref(problem, x, r, block_L, order,
                             step_scale=step_scale, keep_mask=keep_mask)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kind = penalty.kind
    gsize = 1
    if kind == "group_l2":
        gsize = n // penalty.ngroups
        if B % gsize != 0:
            raise ValueError(
                f"block size {B} must contain whole groups (gsize={gsize})")
        w = penalty._gweights(A.dtype).reshape(n_blocks, B // gsize)
    else:
        w = jnp.zeros((n_blocks, 1), A.dtype)  # unused dummy

    lam1 = jnp.asarray(problem.penalty.lam1, A.dtype).reshape(1, 1)
    lam2_arr = jnp.asarray(lam2, A.dtype).reshape(1, 1)
    steps = (step_scale / (block_L + lam2)).astype(A.dtype).reshape(n_blocks, 1)
    mask = (jnp.ones((n,), A.dtype) if keep_mask is None
            else keep_mask.astype(A.dtype)).reshape(n_blocks, B)

    kernel = functools.partial(_sweep_kernel, kind, gsize)
    grid = (n_blocks,)
    x_out, r_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda j: (j, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, w.shape[1]), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, B), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, B), A.dtype),
            jax.ShapeDtypeStruct((1, m), A.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n,                     # two matvecs over all of A
            bytes_accessed=m * n * 4 + 8 * n * 4 + 8 * m * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lam1, lam2_arr, steps, w, A, x.reshape(n_blocks, B), mask,
      r.reshape(1, m))
    return x_out.reshape(n), r_out.reshape(m)
