"""m-tiled fused Pallas sweep: Gauss-Seidel BCD for matrices whose (m, B)
column block does NOT fit VMEM (SURVEY.md C4 at production sizes — e.g. the
10k x 100k headline config and the 50k x 1M sharded config's per-chip slab).

Same algorithm as ops/bcd_sweep_pallas.py, but A stays in HBM and each
column block j is processed in (MT, B) row tiles with explicit
double-buffered DMA:

    phase 1: for each row tile t:  g_j += A[t]^T r[t]      (streamed)
    prox:    x_j' = prox(x_j - t_j (g_j + lam2 x_j)); dx = x_j' - x_j
    phase 2: for each row tile t:  r[t] += A[t] dx          (streamed again)

Two HBM reads of A per sweep (the resident-A kernel needs one; exact
first-order methods like FISTA also need two) — the win over the XLA scan
path is the same 10x launch/slice overhead removal, and the win over FISTA
is Gauss-Seidel's convergence per sweep and its lower f32 noise floor.

The residual r lives in VMEM scratch for the whole sweep ((1, m) f32, 8-row
pad: 320 KB at m = 10k — small), as do x/mask in the compact (n_blocks, B)
layout.  Only A is streamed, at full HIGHEST precision (see the resident
kernel's precision note for why cheaper paths fail).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convex_optimization_tpu.core.problem import Problem

_VMEM_BUDGET_BYTES = int(15 * 1024 * 1024)


def pick_m_tile(m: int, block: int, n: int = 0,
                dtype=jnp.float32) -> int | None:
    """Largest row-tile MT (multiple of 8, dividing m) whose working set
    fits: 2 double-buffered (MT, B) tiles charged 2.66x for the HIGHEST
    dots, plus the resident vectors."""
    itemsize = jnp.dtype(dtype).itemsize
    n_blocks = max(n // block, 1) if block else 1
    pad_rows = -(-n_blocks // 8) * 8
    fixed = (2 * 8 * m * itemsize            # r scratch + r_init
             + 3 * pad_rows * block * itemsize)
    best = None
    for mt in range(8, m + 1, 8):
        if m % mt:
            continue
        a = 2.66 * 2 * mt * block * itemsize
        if a + fixed <= _VMEM_BUDGET_BYTES:
            best = mt
        else:
            break
    return best


def eligible_tiled(m: int, n: int, block: int, dtype=jnp.float32) -> bool:
    return (jnp.dtype(dtype) == jnp.float32
            and block % 128 == 0
            and n % block == 0
            and m % 8 == 0
            and pick_m_tile(m, block, n, dtype) is not None)


def to_block_major(A: jax.Array, n_blocks: int) -> jax.Array:
    """(m, n) -> (n_blocks, m, B) with each column block contiguous (a
    one-time device copy; makes every DMA tile a single contiguous region).
    """
    m, n = A.shape
    return jnp.swapaxes(A.reshape(m, n_blocks, n // n_blocks), 0, 1)


def pick_padded_block_size_tiled(m: int, n: int, target: int = 256,
                                 multiple_of: int = 1
                                 ) -> tuple[int, int] | None:
    """(block, pad) for the m-tiled kernel (see the resident kernel's
    pick_padded_block_size); None if no aligned block size works."""
    import math

    step = 128 * multiple_of // math.gcd(128, multiple_of)
    best = None
    b = step
    while b <= max(target, step):
        n_pad = -(-n // b) * b
        if eligible_tiled(m, n_pad, b):
            best = (b, n_pad - n)
        b += step
    return best


def _kernel(kind: str, gsize: int, B: int, MT: int, n_tiles: int,
            scalars_ref, steps_ref, w_ref, A_hbm, x_ref, mask_ref,
            r_init_ref, x_out_ref, r_ref,
            tile_buf, g_ref, sems):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        r_ref[:] = r_init_ref[:]
        x_out_ref[:] = x_ref[:]

    def tile_dma(slot, t):
        # A is block-major (n_blocks, m, B): the (MT, B) tile is one
        # CONTIGUOUS region — a strided row-major slice measured 7x slower
        # (512-byte descriptors)
        return pltpu.make_async_copy(
            A_hbm.at[j, pl.ds(t * MT, MT), :],
            tile_buf.at[slot],
            sems.at[slot],
        )

    # ---- phase 1: g_j = A_j^T r, streamed over row tiles ----
    g_ref[:] = jnp.zeros_like(g_ref)
    tile_dma(0, 0).start()

    def p1(t, _):
        slot = t % 2
        @pl.when(t + 1 < n_tiles)
        def _():
            tile_dma((t + 1) % 2, t + 1).start()
        tile_dma(slot, t).wait()
        r_t = r_ref[:, pl.ds(t * MT, MT)]
        g_ref[:] += jax.lax.dot_general(
            r_t, tile_buf[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 0

    jax.lax.fori_loop(0, n_tiles, p1, 0)

    # ---- prox ----
    xj = x_out_ref[pl.ds(j, 1), :]
    lam1 = scalars_ref[0]
    lam2 = scalars_ref[1]
    g = g_ref[:] + lam2 * xj
    t_step = steps_ref[j]
    v = xj - t_step * g
    tl = t_step * lam1
    if kind == "l1":
        x_new = jnp.sign(v) * jnp.maximum(jnp.abs(v) - tl, 0.0)
    elif kind == "nonneg_l1":
        x_new = jnp.maximum(v - tl, 0.0)
    elif kind == "group_l2":
        # Mosaic cannot reshape (1, B) across sublanes; compute group norms
        # with tiny one-hot matmuls instead (B x gpb indicator M):
        #   gn2 = (v*v) @ M ; per-lane scale = scale_g @ M^T
        gpb = B // gsize
        lane_g = jax.lax.broadcasted_iota(jnp.int32, (B, gpb), 0) // gsize
        gcol = jax.lax.broadcasted_iota(jnp.int32, (B, gpb), 1)
        M = (lane_g == gcol).astype(jnp.float32)
        gn2 = jax.lax.dot_general(
            v * v, M, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (1, gpb)
        gn = jnp.sqrt(gn2)
        w = w_ref[pl.ds(j, 1), :]                          # (1, gpb)
        scale_g = jnp.maximum(0.0, 1.0 - tl * w / jnp.maximum(gn, 1e-30))
        scale = jax.lax.dot_general(
            scale_g, M, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (1, B)
        x_new = v * scale
    else:
        raise ValueError(f"unknown penalty kind {kind!r}")
    # masked coords go to 0 (screened => certified zero); the
    # residual update below absorbs the change exactly
    x_new = jnp.where(mask_ref[pl.ds(j, 1), :] > 0, x_new, 0.0)
    dx = x_new - xj
    x_out_ref[pl.ds(j, 1), :] = x_new

    # ---- phase 2: r += A_j dx, streamed again ----
    tile_dma(0, 0).start()

    def p2(t, _):
        slot = t % 2
        @pl.when(t + 1 < n_tiles)
        def _():
            tile_dma((t + 1) % 2, t + 1).start()
        tile_dma(slot, t).wait()
        dr_t = jax.lax.dot_general(
            dx, tile_buf[slot], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        r_ref[:, pl.ds(t * MT, MT)] += dr_t
        return 0

    jax.lax.fori_loop(0, n_tiles, p2, 0)


def bcd_sweep_pallas_tiled(
    problem: Problem,
    x: jax.Array,
    r: jax.Array,
    block_L: jax.Array,
    *,
    step_scale: float = 1.0,
    keep_mask: jax.Array | None = None,
    interpret: bool | None = None,
    A_blocks: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One fused m-tiled Gauss-Seidel sweep (cyclic order).  Returns (x, r).

    Falls back to the jnp oracle when not ``eligible_tiled``.  Pass
    ``A_blocks = to_block_major(problem.A, n_blocks)`` when sweeping in a
    loop so the one-time relayout is hoisted out (solvers/bcd.py does)."""
    A, lam2, penalty = problem.A, problem.lam2, problem.penalty
    # problem.m/n, NOT A.shape: compact working-set problems carry a tiny
    # audit stand-in for A with a static shape_override (core/problem.py)
    m, n = problem.m, problem.n
    n_blocks = block_L.shape[0]
    if n % n_blocks != 0:
        raise ValueError(f"n={n} not divisible by n_blocks={n_blocks}")
    B = n // n_blocks

    if not eligible_tiled(m, n, B, A.dtype):
        from convex_optimization_tpu.ops.bcd_sweep_ref import bcd_sweep_ref

        order = jnp.arange(n_blocks, dtype=jnp.int32)
        return bcd_sweep_ref(problem, x, r, block_L, order,
                             step_scale=step_scale, keep_mask=keep_mask)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    MT = pick_m_tile(m, B, n, A.dtype)
    n_tiles = m // MT
    if A_blocks is None:
        A_blocks = to_block_major(A, n_blocks)

    kind = penalty.kind
    gsize = 1
    if kind == "group_l2":
        gsize = n // penalty.ngroups
        if B % gsize != 0:
            raise ValueError(
                f"block size {B} must contain whole groups (gsize={gsize})")
        w = penalty._gweights(A.dtype).reshape(n_blocks, B // gsize)
    else:
        w = jnp.zeros((n_blocks, 1), A.dtype)

    scalars = jnp.stack([jnp.asarray(problem.penalty.lam1, A.dtype),
                         jnp.asarray(lam2, A.dtype)])
    steps = (step_scale / (block_L + lam2)).astype(A.dtype)
    mask = (jnp.ones((n,), A.dtype) if keep_mask is None
            else keep_mask.astype(A.dtype)).reshape(n_blocks, B)

    kernel = functools.partial(_kernel, kind, gsize, B, MT, n_tiles)
    full = lambda j: (0, 0)
    x_out, r_out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),                # steps
            pl.BlockSpec((n_blocks, w.shape[1]), full,
                         memory_space=pltpu.VMEM),                # weights
            pl.BlockSpec(memory_space=pl.ANY),                    # A in HBM
            pl.BlockSpec((n_blocks, B), full,
                         memory_space=pltpu.VMEM),                # x
            pl.BlockSpec((n_blocks, B), full,
                         memory_space=pltpu.VMEM),                # mask
            pl.BlockSpec((1, m), full, memory_space=pltpu.VMEM),  # r init
        ],
        out_specs=[
            pl.BlockSpec((n_blocks, B), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, B), A.dtype),
            jax.ShapeDtypeStruct((1, m), A.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, MT, B), jnp.float32),   # double-buffered A tiles
            pltpu.VMEM((1, B), jnp.float32),       # gradient accumulator
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n,
            bytes_accessed=2 * m * n * 4 + 8 * n * 4 + 8 * m * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, steps, w, A_blocks, x.reshape(n_blocks, B), mask,
      r.reshape(1, m))
    return x_out.reshape(n), r_out.reshape(m)
