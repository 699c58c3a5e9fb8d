"""Batched-lambda path solver: all path points iterate SIMULTANEOUSLY
against one streamed read of A per sweep (round 4; kernels in
ops/bcd_sweep_vpu_batch.py).

The sequential warm-started path (solvers/lambda_path.py) pays one
HBM pass of A per sweep per point; its total cost is
sum_k sweeps(lam_k) passes.  This solver runs cyclic Gauss-Seidel block
prox on an (L, n) batch of iterates — every lambda in the grid at once,
each with its own threshold — so the total cost is max_k sweeps(lam_k)
passes: the deep points' sweeps carry every other point for free.
Points start cold, but an IN-JIT CASCADE WARM START recovers most of the
sequential path's warm-start benefit: at every gap check, each point
adopts its larger-lambda neighbor's iterate whenever that iterate is
primal-better at its own lambda (evaluated for free from the already-
reduced parts; GS prox descent is monotone from any start, so adoption
is always sound).  Certification semantics match lambda_path: per-point
f32 duality-gap certificates with best-iterate tracking and stall
detection at the f32 floor.

Every program in the solve is kernel-routed (batched sweep, batched exact
refresh, batched witness, in-kernel block power iteration): no full-size
XLA dot anywhere, so the whole thing compiles in seconds on the relay
(CLAUDE.md round-2/3 rules).

Usage: ``batched_lambda_path(problem, cfg, path_len=10)`` — a drop-in for
``lambda_path`` returning the same PathResult shape (per-point solutions,
gaps, iteration counts).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from convex_optimization_tpu.core.problem import Problem
from convex_optimization_tpu.core.objective import gap_from_parts, lambda_max
from convex_optimization_tpu.solvers.common import SolverConfig
from convex_optimization_tpu.solvers.lambda_path import PathResult
from convex_optimization_tpu.ops.bcd_sweep_vpu import (
    pick_padded_block_size_vpu,
    to_tblock_major,
)
from convex_optimization_tpu.ops.bcd_sweep_vpu_batch import (
    MAX_BATCH,
    ax_minus_b_batch_t,
    batch_sweep_vpu,
    eligible_vpu_batch,
    neg_at_r_batch_t,
)
from convex_optimization_tpu.ops.matvec_pallas import block_power_t


class _BatchState(NamedTuple):
    X: jax.Array            # (n_blocks, L, B) iterates
    R: jax.Array            # (L, m) residuals
    X_best: jax.Array       # (n_blocks, L, B) best-certified iterates
    best_gap: jax.Array     # (L,)
    best_rel: jax.Array     # (L,)
    best_primal: jax.Array  # (L,)
    iters_done: jax.Array   # (L,) sweep count when each point was best
    since_best: jax.Array   # (L,) gap checks without a new best
    k: jax.Array            # () total sweeps run


def _penalty_parts(kind: str, gsize: int, weights, X, Z):
    """Per-lambda base penalty value and base dual norm (lam1 factored
    out): value_l = lam1_l * base_val_l, dual_norm_l = base_dual_l / lam1_l.
    X, Z are (n_blocks, L, B)."""
    if kind == "l1":
        base_val = jnp.sum(jnp.abs(X), axis=(0, 2))
        base_dual = jnp.max(jnp.abs(Z), axis=(0, 2))
    elif kind == "nonneg_l1":
        base_val = jnp.sum(X, axis=(0, 2))           # X >= 0 by prox
        base_dual = jnp.maximum(jnp.max(Z, axis=(0, 2)), 0.0)
    elif kind == "group_l2":
        nb, L, B = X.shape
        gpb = B // gsize
        Xg = X.reshape(nb, L, gpb, gsize)
        Zg = Z.reshape(nb, L, gpb, gsize)
        w = weights.reshape(nb, 1, gpb)
        gn_x = jnp.sqrt(jnp.sum(Xg * Xg, axis=3))    # (nb, L, gpb)
        gn_z = jnp.sqrt(jnp.sum(Zg * Zg, axis=3))
        base_val = jnp.sum(w * gn_x, axis=(0, 2))
        base_dual = jnp.max(gn_z / w, axis=(0, 2))
    else:
        raise ValueError(f"unknown penalty kind {kind!r}")
    return base_val, base_dual


@functools.partial(jax.jit,
                   static_argnames=("kind", "gsize", "cfg", "interpret"))
def _solve_batched(A_t, b, lam1s, lam2, steps, weights, x0, r0, *, kind,
                   gsize, cfg: SolverConfig, interpret):
    """The single jitted batched-path program (no XLA dots anywhere).
    x0 (n_blocks, B) / r0 (m,) warm-start every point (None = cold from 0:
    the dense-grid chunking warm-starts chunk k+1 from chunk k's deepest
    solution)."""
    n_blocks, B, m = A_t.shape
    L = lam1s.shape[0]
    dtype = A_t.dtype

    if x0 is None:
        X0 = jnp.zeros((n_blocks, L, B), dtype)
        R0 = jnp.broadcast_to(-b[None, :], (L, m)).astype(dtype)
    else:
        X0 = jnp.broadcast_to(x0[:, None, :], (n_blocks, L, B)).astype(dtype)
        R0 = jnp.broadcast_to(r0[None, :], (L, m)).astype(dtype)
    inf = jnp.full((L,), jnp.inf, dtype)
    state0 = _BatchState(
        X=X0, R=R0, X_best=X0, best_gap=inf, best_rel=inf,
        best_primal=inf, iters_done=jnp.zeros((L,), jnp.int32),
        since_best=jnp.zeros((L,), jnp.int32),
        k=jnp.zeros((), jnp.int32))

    w_flat = (weights if kind == "group_l2"
              else jnp.zeros((n_blocks, 1, 1), dtype))

    def gap_check(X, R):
        # exact refresh pins the incremental residual drift, then one
        # batched witness pass; gap_from_parts broadcasts over (L,)
        R = ax_minus_b_batch_t(A_t, X, b, interpret=interpret)
        Z = neg_at_r_batch_t(A_t, R, X, lam2, interpret=interpret)
        base_val, base_dual = _penalty_parts(kind, gsize, weights, X, Z)
        rho_aug = (jnp.sum(R * R, axis=1)
                   + lam2 * jnp.sum(X * X, axis=(0, 2)))
        # <rho, b> = <b - Ax, b> = ||b||^2 - <r + b, b> = -<r, b>
        rho_dot_b = -(R @ b)
        info = gap_from_parts(
            rho_dot_b=rho_dot_b,
            rho_aug_sq=rho_aug,
            g_value=lam1s * base_val,
            dual_norm_value=base_dual / jnp.maximum(lam1s, 1e-30),
        )
        return R, info, rho_aug, base_val

    def body(state):
        def sweep(_, carry):
            X, R = carry
            return batch_sweep_vpu(A_t, X, R, steps, lam1s, lam2,
                                   kind=kind, gsize=gsize,
                                   weights=w_flat, interpret=interpret)

        X, R = jax.lax.fori_loop(0, cfg.gap_every, sweep,
                                 (state.X, state.R))
        R, info, rho_aug, base_val = gap_check(X, R)
        k = state.k + cfg.gap_every
        improved = info.rel_gap < state.best_rel
        sel = improved[None, :, None]
        X_best = jnp.where(sel, X, state.X_best)
        best_rel = jnp.where(improved, info.rel_gap, state.best_rel)
        best_gap = jnp.where(improved, info.gap, state.best_gap)
        best_primal = jnp.where(improved, info.primal, state.best_primal)
        iters_done = jnp.where(improved, k, state.iters_done)
        since_best = jnp.where(improved, 0, state.since_best + 1)

        # cascade warm start (the in-batch analog of the sequential path's
        # warm starts): point l adopts point l-1's CURRENT iterate whenever
        # that iterate is primal-better AT lam_l.  Evaluating the neighbor
        # at lam_l is free — P_l(x_{l-1}) = 0.5*rho_aug_{l-1}
        # + lam1_l * base_val_{l-1} from the parts already reduced.  GS
        # block prox is monotone from any start, so adoption never hurts;
        # the deep (small-lambda) points inherit the shallow solutions as
        # those converge instead of grinding from 0 (measured in rehearsal:
        # the cold deep tail dominated total sweeps).  lambdas DESCEND, so
        # the shift direction is l-1 -> l.
        prev_aug = jnp.concatenate([rho_aug[:1], rho_aug[:-1]])
        prev_val = jnp.concatenate([base_val[:1], base_val[:-1]])
        primal_of_prev = 0.5 * prev_aug + lam1s * prev_val
        not_first = jnp.arange(L) > 0
        adopt = (primal_of_prev < info.primal) & not_first \
            & (state.best_rel > cfg.tol)
        X = jnp.where(adopt[None, :, None],
                      jnp.concatenate([X[:, :1], X[:, :-1]], axis=1), X)
        R = jnp.where(adopt[:, None],
                      jnp.concatenate([R[:1], R[:-1]], axis=0), R)

        return _BatchState(X=X, R=R, X_best=X_best, best_gap=best_gap,
                           best_rel=best_rel, best_primal=best_primal,
                           iters_done=iters_done, since_best=since_best,
                           k=k)

    def cond(state):
        converged = state.best_rel <= cfg.tol
        stalled = (state.since_best >= cfg.stall_checks
                   if cfg.stall_checks > 0
                   else jnp.zeros_like(converged))
        done = jnp.all(converged | stalled)
        return (state.k < cfg.max_iters) & ~done

    return jax.lax.while_loop(cond, body, state0)


def batched_lambda_path(
    problem: Problem,
    cfg: SolverConfig,
    *,
    path_len: int = 10,
    lam_min_frac: float = 0.01,
    lambdas: jax.Array | None = None,
    interpret: bool | None = None,
) -> PathResult:
    """Solve the whole lambda grid simultaneously; see module docstring.

    Falls back to the sequential ``lambda_path`` when the batched kernel
    gate fails (non-f32 dtype, no pad-free block size, L > MAX_BATCH, or
    VMEM-infeasible (B, m))."""
    if lambdas is None:
        lmax = lambda_max(problem.A, problem.b, problem.penalty)
        lambdas = jnp.geomspace(0.95 * lmax, lam_min_frac * lmax, path_len)
    lambdas = jnp.asarray(lambdas, problem.dtype)
    L = int(lambdas.shape[0])

    multiple = 1
    if problem.penalty.kind == "group_l2":
        multiple = problem.n // problem.penalty.ngroups
    picked = pick_padded_block_size_vpu(problem.m, problem.n, 128,
                                        multiple_of=multiple,
                                        dtype=problem.dtype)
    # dense grids run in consecutive chunks of <= MAX_BATCH points, each
    # chunk warm-started from the previous chunk's deepest solution (GS
    # prox descent is monotone from any start); equal-size chunks keep the
    # number of distinct program shapes at <= 2 (body chunks + remainder)
    n_chunks = -(-L // MAX_BATCH)
    chunk = -(-L // n_chunks)
    ok = (picked is not None and picked[1] == 0
          and eligible_vpu_batch(problem.m, problem.n, picked[0],
                                 min(L, chunk), problem.dtype))
    if not ok:
        from convex_optimization_tpu.solvers.lambda_path import lambda_path

        return lambda_path(problem, cfg, lambdas=lambdas,
                           method="bcd_pallas")

    B = picked[0]
    n_blocks = problem.n // B
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    A_t = to_tblock_major(problem.A, n_blocks)
    block_L = block_power_t(A_t, interpret=interpret)
    steps = (cfg.step_scale / (block_L + problem.lam2)).astype(problem.dtype)
    weights = None
    if problem.penalty.kind == "group_l2":
        weights = problem.penalty._gweights(problem.dtype).reshape(
            n_blocks, 1, B // multiple)

    xs_parts, gaps_parts, iters_parts = [], [], []
    x_warm = r_warm = None
    for c0 in range(0, L, chunk):
        lam_c = lambdas[c0:c0 + chunk]
        final = _solve_batched(A_t, problem.b, lam_c, problem.lam2, steps,
                               weights, x_warm, r_warm,
                               kind=problem.penalty.kind,
                               gsize=multiple, cfg=cfg, interpret=interpret)
        Lc = lam_c.shape[0]
        xs_parts.append(final.X_best.transpose(1, 0, 2).reshape(
            Lc, problem.n))
        gaps_parts.append(final.best_rel)
        iters_parts.append(final.iters_done)
        if c0 + chunk < L:
            from convex_optimization_tpu.ops.matvec_pallas import (
                ax_minus_b_t,
            )

            x_warm = final.X_best[:, Lc - 1, :]
            r_warm = ax_minus_b_t(A_t, x_warm.reshape(problem.n),
                                  problem.b, interpret=interpret)

    return PathResult(
        lambdas=lambdas,
        xs=jnp.concatenate(xs_parts, axis=0),
        gaps=jnp.concatenate(gaps_parts),
        iters=jnp.concatenate(iters_parts),
    )
