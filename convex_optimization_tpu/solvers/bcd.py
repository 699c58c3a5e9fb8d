"""Block-coordinate descent driver (SURVEY.md C2): jitted while_loop over
Gauss-Seidel sweeps, with the sweep itself either the pure-jnp oracle
(ops/bcd_sweep_ref.py) or the fused Pallas kernel (ops/bcd_sweep_pallas.py).

The reference dispatches one CPU/GPU kernel per block from Python with
host-side step logic (SURVEY.md section 3.3); here a whole sweep — all
blocks, prox included — is one traced program (one Pallas kernel launch on
TPU), and ``gap_every`` sweeps run between duality-gap checks, all inside a
single while_loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from convex_optimization_tpu.core.problem import Problem
from convex_optimization_tpu.ops.bcd_sweep_ref import bcd_sweep_ref
from convex_optimization_tpu.solvers.common import SolveState, SolverConfig
from convex_optimization_tpu.solvers.fista import _check_and_record, init_state


def pick_block_size(n: int, target: int = 256, *, multiple_of: int = 1) -> int:
    """Largest divisor of n that is <= target and a multiple of `multiple_of`
    (group size alignment); falls back to the smallest valid divisor."""
    best = None
    d = multiple_of
    while d <= n:
        if n % d == 0:
            if d <= target:
                best = d
            elif best is None:
                best = d
                break
            else:
                break
        d += multiple_of
    if best is None:
        raise ValueError(f"no block size for n={n}, multiple_of={multiple_of}")
    return best


@partial(jax.jit, static_argnames=("cfg",))
def bcd(problem: Problem, block_L: jax.Array, state: SolveState,
        cfg: SolverConfig, col_norms: jax.Array | None = None,
        A_t: jax.Array | None = None) -> SolveState:
    """Run block-CD sweeps until rel. duality gap <= cfg.tol or max_iters
    (counted in sweeps).  block_L holds per-block ||A_j||_2^2 (no lam2).

    Pass ``A_t = to_tblock_major(problem.A, n_blocks)`` (api.solve does)
    to hoist the one-time relayout out of this program AND route the
    residual refresh + dual witness through the Pallas matvec kernels —
    the compiled solve program then contains NO full-size XLA dot, which
    is what keeps its relay compile in seconds instead of minutes
    (ops/matvec_pallas.py).
    """
    if col_norms is None and cfg.screen_every > 0:
        col_norms = problem.col_norms()
    n_blocks = block_L.shape[0]
    order = jnp.arange(n_blocks, dtype=jnp.int32)

    if cfg.use_pallas:
        from convex_optimization_tpu.ops.bcd_sweep_pallas import (
            bcd_sweep_pallas,
            eligible,
        )
        from convex_optimization_tpu.ops.bcd_sweep_pallas_tiled import (
            bcd_sweep_pallas_tiled,
            eligible_tiled,
        )
        from convex_optimization_tpu.ops.bcd_sweep_vpu import (
            bcd_sweep_vpu,
            eligible_vpu,
            to_tblock_major,
        )

        B = problem.n // n_blocks
        if eligible_vpu(problem.m, problem.n, B, problem.dtype):
            # transposed-layout VPU kernel: 1 HBM read of A per sweep at
            # near-HBM speed, no MXU-HIGHEST scratch — preferred wherever
            # its (B, m) block fits VMEM (covers the 10k x 100k headline).
            if A_t is None:
                A_t = to_tblock_major(problem.A, n_blocks)

            def sweep_fn(st: SolveState):
                return bcd_sweep_vpu(
                    problem, st.x, st.r, block_L,
                    step_scale=cfg.step_scale, keep_mask=st.keep_mask,
                    A_t=A_t,
                )
        elif eligible(problem.m, problem.n, B, problem.dtype):
            def sweep_fn(st: SolveState):  # A_j resident: 1 HBM read/sweep
                return bcd_sweep_pallas(
                    problem, st.x, st.r, block_L,
                    step_scale=cfg.step_scale, keep_mask=st.keep_mask,
                )
        elif eligible_tiled(problem.m, problem.n, B, problem.dtype):
            from convex_optimization_tpu.ops.bcd_sweep_pallas_tiled import (
                to_block_major,
            )

            # one-time block-major relayout, hoisted out of the while_loop
            # (contiguous DMA tiles; strided tiles measured 7x slower)
            A_blocks = to_block_major(problem.A, n_blocks)

            def sweep_fn(st: SolveState):  # streamed tiles: 2 reads/sweep
                return bcd_sweep_pallas_tiled(
                    problem, st.x, st.r, block_L,
                    step_scale=cfg.step_scale, keep_mask=st.keep_mask,
                    A_blocks=A_blocks,
                )
        else:
            def sweep_fn(st: SolveState):  # falls back to the jnp oracle
                return bcd_sweep_pallas(
                    problem, st.x, st.r, block_L,
                    step_scale=cfg.step_scale, keep_mask=st.keep_mask,
                )
    else:
        def sweep_fn(st: SolveState):
            return bcd_sweep_ref(
                problem, st.x, st.r, block_L, order,
                step_scale=cfg.step_scale, keep_mask=st.keep_mask,
            )

    def refresh_and_check(s: SolveState) -> SolveState:
        # exact residual refresh once per check: the sweeps maintain r
        # incrementally (n_blocks rank-B updates per sweep), so rounding
        # drift accumulates across sweeps; one extra pass over A every
        # gap_every sweeps pins it back to machine precision
        if A_t is not None:
            # Pallas refresh + witness: no XLA dot in the compiled program
            from convex_optimization_tpu.ops.matvec_pallas import (
                ax_minus_b_t,
                neg_at_r_t,
            )

            r_fresh = ax_minus_b_t(A_t, s.x, problem.b)
            z = neg_at_r_t(A_t, r_fresh, s.x, problem.lam2)
            return _check_and_record(problem, s._replace(r=r_fresh), cfg,
                                     col_norms, z=z)
        s = s._replace(r=problem.residual(s.x))
        return _check_and_record(problem, s, cfg, col_norms)

    def body(s: SolveState) -> SolveState:
        def one(_, st):
            x, r = sweep_fn(st)
            return st._replace(x=x, r=r, k=st.k + 1)

        s = lax.fori_loop(0, cfg.gap_every, one, s)
        return refresh_and_check(s)

    def cond(s: SolveState) -> jax.Array:
        go = (s.k < cfg.max_iters) & (s.rel_gap > cfg.tol)
        if cfg.stall_checks > 0:
            go = go & (s.stall < cfg.stall_checks)
        return go

    state = refresh_and_check(state)
    return lax.while_loop(cond, body, state)


__all__ = ["bcd", "pick_block_size", "init_state"]
