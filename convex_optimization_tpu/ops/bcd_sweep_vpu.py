"""Transposed-layout VPU fused sweep — round-2 rework of the fused
Gauss-Seidel kernel (SURVEY.md C4; the TPU-native equivalent of the
reference's CUDA backend).

Why a third kernel: the MXU-based kernels (ops/bcd_sweep_pallas[_tiled].py)
express both matvecs as (1, m)x(m, B) ``dot_general``s, which on the MXU
(a) waste all but one operand row of the systolic array and (b) must run at
``Precision.HIGHEST`` — a 6-pass f32 emulation whose Mosaic scratch costs
2.66x the A stream in VMEM.  Measured consequences (BASELINE.md round 1):
the resident kernel's VMEM gate caps m <= ~5.5k, and the m-tiled variant is
MXU-6-pass-bound at ~83 GB/s while plain XLA FISTA streams at ~717 GB/s.

This kernel stores each column block TRANSPOSED — A_t[j] is (B, m): B
sublanes x m lanes — which turns both matvecs into pure-f32 VPU
broadcast-multiply-reduce ops (exact f32 arithmetic, no MXU, no HIGHEST
scratch):

    phase 1:  g    = sum_lanes   (A_t[j] * r)         # (B,m)*(1,m) -> (B,1)
    prox:     x_j' = prox_{t_j}(x_j - t_j (g + lam2 x_j))        # (B,1) VPU
    phase 2:  r   += sum_sublanes(A_t[j] * dx)        # (B,m)*(B,1) -> (1,m)

The (B, m) block is VMEM-resident (Pallas double-buffers the stream), so A
is read from HBM ONCE per sweep, and the per-element cost is ~2 VPU MACs —
HBM-bandwidth-bound, not MXU-pass-bound.  Without the 2.66x HIGHEST charge
the residency gate now covers the 10k x 100k headline (B=128: 10.2 MB
double-buffered at m=10k).

Layout notes (Mosaic block rules: trailing dim divisible by 128 OR equal to
the array dim):
  * A_t: (n_blocks, B, m) — per-step block (1, B, m); trailing dim = m =
    array dim, so any m % 8 == 0 works (10000 included);
  * x / mask / x_out: (n_blocks, B) ROW-oriented with per-step (1, B)
    blocks — 1-lane-wide (.., B, 1) operands forced a pathological XLA
    relayout at every pallas_call boundary (measured ~8 ms per reshape and
    far worse inside solver loops).  The (B, 1) column orientation the
    lane/sublane reductions need exists only inside the kernel, via exact
    identity-dot transposes (Mosaic cannot reshape across sublanes/lanes);
  * r: (1, m) full-array block, resident accumulator across all grid steps;
  * the multiply-reduce is chunked over lanes (static python loop) to bound
    the (B, chunk) product temporaries.

Precision: plain f32 VPU multiplies with tree-ish reductions — the same
error class as the jnp oracle (O(log m * eps)), strictly better than the
HIGHEST 6-pass dots' class.  Parity is tested against the oracle like the
other kernels (tests/test_pallas_sweep_vpu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convex_optimization_tpu.core.problem import Problem

_VMEM_BUDGET_BYTES = int(15 * 1024 * 1024)
_LANE_CHUNK = 1024  # lane-chunk for the multiply-reduce temporaries

# Single HBM-budget constant for the whole repo (VERDICT r3 task 9): a v5e
# chip has 16 GiB HBM; 13 GiB is the measured safe headroom once the runtime
# and compile scratch take their share (3 full-size copies of a 4 GB A OOM'd,
# 2 + the compact slabs did not — BASELINE.md round 2/3).  Re-measure HERE.
HBM_BUDGET_BYTES = 13 * 1024 ** 3


def fits_hbm(m: int, n: int, dtype=jnp.float32, copies: float = 2.0) -> bool:
    """True when ``copies`` full-size (m, n) buffers of ``dtype`` fit the
    HBM budget.  ``copies`` counts persistent full-size buffers: A itself,
    the hoisted transposed A_t, a zero-padded duplicate when the kernel
    block needs padding, or fractional slack for compact working-set slabs
    (e.g. 2.5 = A + A_t + up-to-half-width gathered slab)."""
    return copies * m * n * jnp.dtype(dtype).itemsize <= HBM_BUDGET_BYTES


def fits_vmem_vpu(m: int, block: int, dtype=jnp.float32) -> bool:
    """VMEM model: double-buffered (B, m) A block, two (1, m) residual rows
    (8-sublane pad), the (B, chunk) product temporaries (charge 2), and the
    tiny per-step (B, 1) vectors."""
    if block <= 0:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    a_bytes = 2 * block * m * itemsize
    r_bytes = 2 * 8 * m * itemsize
    tmp = 2 * block * min(m, _LANE_CHUNK) * itemsize
    small = 8 * block * 128 * itemsize  # (B,1) pads to 128 lanes; x/mask/out
    return a_bytes + r_bytes + tmp + small <= _VMEM_BUDGET_BYTES


def eligible_vpu(m: int, n: int, block: int, dtype=jnp.float32) -> bool:
    """Lowering + VMEM gate: f32, whole blocks, sublane-aligned B, m % 8."""
    return (jnp.dtype(dtype) == jnp.float32
            and block % 8 == 0
            and block >= 8
            and n % block == 0
            and m % 8 == 0
            and fits_vmem_vpu(m, block, dtype))


def pick_padded_block_size_vpu(m: int, n: int, target: int = 128,
                               multiple_of: int = 1,
                               dtype=jnp.float32,
                               ) -> tuple[int, int] | None:
    """(block, pad) such that the kernel is eligible on n+pad columns (pad
    appended as zero columns by the caller); None if nothing fits.  B sits
    on SUBLANES here, so it only needs 8-alignment (plus group alignment),
    not the MXU kernels' 128.

    A pad-free block size is STRONGLY preferred when one exists: padding
    materializes a second full-size copy of A on device (jnp.pad) next to
    the original and the transposed layout — at the 10k x 100k headline
    that third 4 GB buffer OOMs a 16 GB v5e chip (measured round 2).
    n = 100000 divides at B = 80, so the headline runs pad-free."""
    import math

    step = 8 * multiple_of // math.gcd(8, multiple_of)
    best = best_nopad = None
    b = step
    while b <= max(target, step):
        n_pad = -(-n // b) * b
        if eligible_vpu(m, n_pad, b, dtype):
            best = (b, n_pad - n)
            if n_pad == n:
                best_nopad = (b, 0)
        b += step
    return best_nopad or best


def to_tblock_major(A: jax.Array, n_blocks: int) -> jax.Array:
    """(m, n) -> (n_blocks, B, m): each column block stored transposed and
    contiguous (one-time device relayout; hoist it out of solve loops)."""
    m, n = A.shape
    return A.reshape(m, n_blocks, n // n_blocks).transpose(1, 2, 0)


def _chunks(m: int):
    return [(c0, min(c0 + _LANE_CHUNK, m)) for c0 in range(0, m, _LANE_CHUNK)]


def _t_col_to_row(v_col, B):
    """(B, 1) -> (1, B) via an identity dot (EXACT at HIGHEST: the 3-term
    split of x times the exact split of 1.0 reconstructs x in f32).  Mosaic
    cannot reshape across sublanes/lanes, and tiny MXU passes are ~free."""
    eye = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
           ).astype(jnp.float32)
    return jax.lax.dot_general(
        v_col, eye, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _t_row_to_col(v_row, B):
    """(1, B) -> (B, 1) via an identity dot (see _t_col_to_row)."""
    eye = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
           ).astype(jnp.float32)
    return jax.lax.dot_general(
        eye, v_row, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _kernel(kind: str, gsize: int, B: int, m: int,
            scalars_ref, steps_ref, w_ref, A_ref, x_ref, mask_ref,
            r_init_ref, x_out_ref, r_ref):
    # Vector operands are ROW-oriented ((n_blocks, B) arrays, (1, B)
    # per-step blocks): an (n_blocks, B, 1) operand layout forces XLA to
    # relayout 1-lane-wide tiles at every pallas_call boundary — measured
    # ~8 ms per reshape and pathologically worse inside solver loops.  The
    # (B, 1) column orientation the reductions need exists only INSIDE the
    # kernel, entered/left via the exact identity-dot transposes above.
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        r_ref[:] = r_init_ref[:]

    # ---- phase 1: g = sum_lanes(A_t[j] * r) -> (B, 1), chunked ----
    g_col = jnp.zeros((B, 1), jnp.float32)
    for c0, c1 in _chunks(m):
        a = A_ref[0, :, c0:c1]            # (B, c)
        rr = r_ref[:, c0:c1]              # (1, c)
        g_col = g_col + jnp.sum(a * rr, axis=1, keepdims=True)

    # ---- prox in (1, B) row orientation ----
    g = _t_col_to_row(g_col, B)           # (1, B)
    xj = x_ref[0]                         # (1, B)
    lam1 = scalars_ref[0]
    lam2 = scalars_ref[1]
    g = g + lam2 * xj
    t = steps_ref[j]
    v = xj - t * g
    tl = t * lam1
    if kind == "l1":
        x_new = jnp.sign(v) * jnp.maximum(jnp.abs(v) - tl, 0.0)
    elif kind == "nonneg_l1":
        x_new = jnp.maximum(v - tl, 0.0)
    elif kind == "group_l2":
        # groups are contiguous runs of gsize lanes; Mosaic cannot reshape
        # across lanes, so group sums go through tiny one-hot matmuls
        # (exact at HIGHEST):  gn2 = (v*v) M,  scale = scale_g M^T
        gpb = B // gsize
        lane_g = jax.lax.broadcasted_iota(jnp.int32, (B, gpb), 0) // gsize
        gcol = jax.lax.broadcasted_iota(jnp.int32, (B, gpb), 1)
        M = (lane_g == gcol).astype(jnp.float32)
        gn2 = jax.lax.dot_general(
            v * v, M, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)            # (1, gpb)
        gn = jnp.sqrt(gn2)
        wj = w_ref[0]                                       # (1, gpb)
        scale_g = jnp.maximum(0.0, 1.0 - tl * wj / jnp.maximum(gn, 1e-30))
        scale = jax.lax.dot_general(
            scale_g, M, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)            # (1, B)
        x_new = v * scale
    else:
        raise ValueError(f"unknown penalty kind {kind!r}")

    # masked coords go to 0 (screened => certified zero); the residual
    # update below absorbs the change exactly
    x_new = jnp.where(mask_ref[0] > 0, x_new, 0.0)
    dx_row = x_new - xj
    x_out_ref[0] = x_new
    dx = _t_row_to_col(dx_row, B)         # (B, 1)

    # ---- phase 2: r += sum_sublanes(A_t[j] * dx), SAME resident block ----
    for c0, c1 in _chunks(m):
        a = A_ref[0, :, c0:c1]            # (B, c)
        r_ref[:, c0:c1] += jnp.sum(a * dx, axis=0, keepdims=True)


def bcd_sweep_vpu(
    problem: Problem,
    x: jax.Array,
    r: jax.Array,
    block_L: jax.Array,
    *,
    step_scale: float = 1.0,
    keep_mask: jax.Array | None = None,
    interpret: bool | None = None,
    A_t: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One fused Gauss-Seidel sweep (cyclic order), transposed VPU layout.
    Returns (x, r).  Drop-in for ops.bcd_sweep_ref.bcd_sweep_ref with
    block_order = arange; falls back to the oracle when not eligible.

    Pass ``A_t = to_tblock_major(problem.A, n_blocks)`` when sweeping in a
    loop so the one-time relayout is hoisted out (solvers/bcd.py does).
    """
    A, lam2, penalty = problem.A, problem.lam2, problem.penalty
    # problem.m/n, NOT A.shape: compact working-set problems carry a tiny
    # audit stand-in for A with a static shape_override (core/problem.py)
    m, n = problem.m, problem.n
    n_blocks = block_L.shape[0]
    if n % n_blocks != 0:
        raise ValueError(f"n={n} not divisible by n_blocks={n_blocks}")
    B = n // n_blocks

    if not eligible_vpu(m, n, B, A.dtype):
        from convex_optimization_tpu.ops.bcd_sweep_ref import bcd_sweep_ref

        order = jnp.arange(n_blocks, dtype=jnp.int32)
        return bcd_sweep_ref(problem, x, r, block_L, order,
                             step_scale=step_scale, keep_mask=keep_mask)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if A_t is None:
        A_t = to_tblock_major(A, n_blocks)

    kind = penalty.kind
    gsize = 1
    if kind == "group_l2":
        gsize = n // penalty.ngroups
        if B % gsize != 0:
            raise ValueError(
                f"block size {B} must contain whole groups (gsize={gsize})")
        w = penalty._gweights(A.dtype).reshape(n_blocks, 1, B // gsize)
    else:
        w = jnp.zeros((n_blocks, 1, 1), A.dtype)  # unused dummy

    scalars = jnp.stack([jnp.asarray(problem.penalty.lam1, A.dtype),
                         jnp.asarray(lam2, A.dtype)])
    steps = (step_scale / (block_L + lam2)).astype(A.dtype)     # (n_blocks,)
    mask = (jnp.ones((n,), A.dtype) if keep_mask is None
            else keep_mask.astype(A.dtype)).reshape(n_blocks, 1, B)

    kernel = functools.partial(_kernel, kind, gsize, B, m)
    x_out, r_out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),               # steps
            pl.BlockSpec((1, 1, w.shape[2]), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),               # weights
            pl.BlockSpec((1, B, m), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),               # A_t stream
            pl.BlockSpec((1, 1, B), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),               # x_j
            pl.BlockSpec((1, 1, B), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),               # mask_j
            pl.BlockSpec((1, m), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),               # r init
        ],
        out_specs=[
            pl.BlockSpec((1, 1, B), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),               # x out
            pl.BlockSpec((1, m), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),               # r out
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, 1, B), A.dtype),
            jax.ShapeDtypeStruct((1, m), A.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n,                  # 2 VPU MAC phases over A
            bytes_accessed=m * n * 4 + 8 * n * 4 + 8 * m * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, steps, w, A_t, x.reshape(n_blocks, 1, B), mask,
      r.reshape(1, m))
    return x_out.reshape(n), r_out.reshape(m)
