"""Pallas matvec + block-power kernels over the transposed block-major
layout (ops/bcd_sweep_vpu.py's ``A_t``: (n_blocks, B, m)).

Why these exist — COMPILE time, not just run time.  Measured on the axon
relay (round 2): any jitted program containing a full-size XLA dot over the
4 GB design matrix compiles in MINUTES (the round-1 FISTA solve program:
425 s; the round-2 BCD solve program with XLA refresh/witness matvecs:
357 s), and relay compiles are never cached across processes.  The same
programs expressed as Pallas kernels over A_t compile in seconds.  Routing
the solver's residual refresh, dual witness, and per-block Lipschitz
estimation through these kernels removes every full-size XLA dot from the
BCD solve program.

Run-time is a wash or better: each kernel is one streamed pass over A at
the VPU sweep kernel's measured ~530-640 GB/s, and the in-kernel block
power iteration does ALL its iterations on the VMEM-resident block — ONE
pass over A total, where the batched-einsum version reads A twice per
iteration (96 passes at 48 iterations).

Same layout rules as the sweep kernel: per-step (1, B, m) A blocks (lane
dim = full m), vector operands ROW-oriented ((n_blocks, B) arrays — see
the sweep kernel's relayout note), lane-chunked multiply-reduce, column
orientation entered via exact identity-dot transposes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convex_optimization_tpu.ops.bcd_sweep_vpu import (
    _chunks,
    _t_col_to_row,
    _t_row_to_col,
)


def _ax_kernel(m, n_blocks, scalars_ref, A_ref, x_ref, b_ref, r_ref, acc):
    """r = sum_j A_j x_j - b.  The accumulator lives in VMEM SCRATCH and the
    output is written once at the last step: accumulating directly into a
    constant-index-map output while a constant-map input (b) is also bound
    serializes a ~40 us HBM read-modify-write round trip per grid step
    (measured 52 ms vs 4.6 ms for the scratch variant at 10k x 100k)."""
    j = pl.program_id(0)

    B = x_ref.shape[2]

    @pl.when(j == 0)
    def _init():
        acc[:] = -b_ref[:]

    xj = _t_row_to_col(x_ref[0], B)            # (1, B) -> (B, 1)
    for c0, c1 in _chunks(m):
        a = A_ref[0, :, c0:c1]                 # (B, c)
        acc[:, c0:c1] += jnp.sum(a * xj, axis=0, keepdims=True)

    @pl.when(j == n_blocks - 1)
    def _flush():
        r_ref[:] = acc[:]


def _atr_kernel(m, scalars_ref, A_ref, r_hbm, x_ref, z_ref, r_vmem, sem):
    """z_j = -(A_j^T r) - lam2 x_j per block (the dual witness).

    r arrives in ANY/HBM memory and is DMA'd into VMEM scratch ONCE at the
    first step — bound as a constant-index-map VMEM input it would be
    re-fetched per grid step (1250 serialized 40 KB reads: measured 52 ms
    for what is an 8 ms pass over A)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _stage():
        dma = pltpu.make_async_copy(r_hbm, r_vmem, sem)
        dma.start()
        dma.wait()

    lam2 = scalars_ref[0]
    B = z_ref.shape[2]
    g = jnp.zeros((B, 1), jnp.float32)
    for c0, c1 in _chunks(m):
        a = A_ref[0, :, c0:c1]
        rr = r_vmem[:, c0:c1]
        g = g + jnp.sum(a * rr, axis=1, keepdims=True)
    z_ref[0] = -_t_col_to_row(g, B) - lam2 * x_ref[0]


def _power_kernel(m, B, iters, safety, A_ref, out_ref, u_ref):
    """Per-block power iteration, entirely on the VMEM-resident block."""
    # deterministic start: ones + a small sublane tilt (orthogonality to
    # the top singular vector has measure zero; the tilt breaks symmetry).
    # Mosaic's iota is integer-only — generate int32 and cast.
    v = 1.0 + 0.01 * jax.lax.broadcasted_iota(
        jnp.int32, (B, 1), 0).astype(jnp.float32) / max(B, 1)

    def matvec_pair(v):
        # u = A_j v  (1, m);  w = A_j^T u  (B, 1) — both chunked
        for c0, c1 in _chunks(m):
            a = A_ref[0, :, c0:c1]
            u_ref[:, c0:c1] = jnp.sum(a * v, axis=0, keepdims=True)
        w = jnp.zeros((B, 1), jnp.float32)
        for c0, c1 in _chunks(m):
            a = A_ref[0, :, c0:c1]
            uu = u_ref[:, c0:c1]
            w = w + jnp.sum(a * uu, axis=1, keepdims=True)
        return w

    def body(_, v):
        w = matvec_pair(v)
        return w / jnp.maximum(jnp.sqrt(jnp.sum(w * w)), 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v)
    # final Rayleigh quotient: ||A v||^2 / ||v||^2 with v unit-normalized
    for c0, c1 in _chunks(m):
        a = A_ref[0, :, c0:c1]
        u_ref[:, c0:c1] = jnp.sum(a * v, axis=0, keepdims=True)
    num = jnp.zeros((), jnp.float32)
    for c0, c1 in _chunks(m):
        uu = u_ref[:, c0:c1]
        num = num + jnp.sum(uu * uu)
    den = jnp.maximum(jnp.sum(v * v), 1e-30)
    # 2-D store: Mosaic rejects scalar stores to VMEM
    out_ref[0] = jnp.reshape(safety * num / den, (1, 1))


def ax_minus_b_t(A_t: jax.Array, x: jax.Array, b: jax.Array,
                 *, interpret: bool | None = None) -> jax.Array:
    """r = A x - b via one streamed pass over A_t.  x is (n,), r is (m,)."""
    n_blocks, B, m = A_t.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scalars = jnp.zeros((1,), A_t.dtype)    # placeholder (uniform calling)
    r = pl.pallas_call(
        functools.partial(_ax_kernel, m, n_blocks),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, m), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m), A_t.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, m), jnp.float32),   # accumulator (see kernel)
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n_blocks * B,
            bytes_accessed=m * n_blocks * B * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, A_t, x.reshape(n_blocks, 1, B), b.reshape(1, m))
    return r.reshape(m)


def neg_at_r_t(A_t: jax.Array, r: jax.Array, x: jax.Array, lam2,
               *, interpret: bool | None = None) -> jax.Array:
    """Dual witness z = -(A^T r) - lam2 x via one streamed pass."""
    n_blocks, B, m = A_t.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scalars = jnp.asarray([lam2], A_t.dtype)
    z = pl.pallas_call(
        functools.partial(_atr_kernel, m),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, m), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # r: staged once (kernel)
            pl.BlockSpec((1, 1, B), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, B), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 1, B), A_t.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, m), jnp.float32),     # staged r
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n_blocks * B,
            bytes_accessed=m * n_blocks * B * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, A_t, r.reshape(1, m), x.reshape(n_blocks, 1, B))
    return z.reshape(n_blocks * B)


def spectral_norm_sq_t(A_t: jax.Array, *, iters: int = 48,
                       safety: float = 1.02,
                       interpret: bool | None = None) -> jax.Array:
    """||A||_2^2 via power iteration expressed over the matvec KERNELS —
    the jitted program contains no XLA dot, so it compiles in seconds on
    the relay where ops.power_iter.spectral_norm_sq (whole-matrix einsums)
    costs minutes.  Matches its semantics (same safety margin)."""
    n_blocks, B, m = A_t.shape
    n = n_blocks * B
    zeros_m = jnp.zeros((m,), A_t.dtype)
    zeros_n = jnp.zeros((n,), A_t.dtype)

    # deterministic unit start (power iteration converges from any vector
    # not orthogonal to the top right-singular vector — measure zero)
    v0 = jnp.sin(jnp.arange(1, n + 1, dtype=A_t.dtype))
    v0 = v0 / jnp.linalg.norm(v0)

    def body(_, v):
        u = ax_minus_b_t(A_t, v, zeros_m, interpret=interpret)      # A v
        w = -neg_at_r_t(A_t, u, zeros_n, 0.0, interpret=interpret)  # A^T u
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v0)
    u = ax_minus_b_t(A_t, v, zeros_m, interpret=interpret)
    return safety * jnp.vdot(u, u) / jnp.maximum(jnp.vdot(v, v), 1e-30)


def block_power_t(A_t: jax.Array, *, iters: int = 48, safety: float = 1.02,
                  interpret: bool | None = None) -> jax.Array:
    """Per-block ||A_j||_2^2 (matches ops.power_iter.block_spectral_norms_sq)
    with every iteration on the VMEM-resident block: ONE pass over A."""
    n_blocks, B, m = A_t.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_power_kernel, m, B, iters, safety),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, B, m), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # (1, 1, 1) blocks of a (n_blocks, 1, 1) array: trailing dims equal
        # to the array dims, which is what Mosaic's real-TPU block rule
        # accepts (a (1, 1) block of (n_blocks, 1) is REJECTED on hardware
        # — interpret mode does not catch this, round-2 measured)
        out_specs=pl.BlockSpec((1, 1, 1), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 1, 1), A_t.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, m), jnp.float32),    # u = A_j v
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * (iters + 1) * 2 * m * n_blocks * B,
            bytes_accessed=m * n_blocks * B * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A_t)
    return out.reshape(n_blocks)
