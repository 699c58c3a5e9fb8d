"""Row-sharded (data-parallel analog) FISTA under shard_map.

SURVEY.md section 2.2 DP row: A and b are sharded along the SAMPLE axis m
over mesh axis ``"rows"``; each chip owns a row slab and its local residual
slice.  The iterate x is replicated.  Per iteration the only collective is
ONE n-vector psum (the gradient consensus):

    g = psum(A_loc^T r_loc) + lam2 * y      # gradient of the smooth part
    x+ = prox(y - g / L)                     # identical on every chip
    r+_loc = A_loc x+ - b_loc                # local, no collective

Column sharding (parallel/sharded.py) psums an m-vector per iteration; row
sharding psums an n-vector — pick by which axis is longer.  The duality-gap
check combines local partials (<r,b>, ||r||^2) by psum through the same
gap_from_parts arithmetic, so row-sharded == column-sharded == local to
tolerance (tests/test_row_sharding.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from convex_optimization_tpu.core.objective import gap_from_parts
from convex_optimization_tpu.core.problem import Problem
from convex_optimization_tpu.parallel.mesh import ROWS, check_lam1_slot
from convex_optimization_tpu.solvers.common import (
    History,
    SolveState,
    SolverConfig,
    record_check,
)


def _state_specs_rows() -> SolveState:
    """x replicated; residual-like vectors sharded along 'rows'."""
    return SolveState(
        x=P(), r=P(ROWS), x_prev=P(), r_prev=P(ROWS),
        t_mom=P(), k=P(), rel_gap=P(), gap=P(), primal=P(),
        keep_mask=P(),
        history=History(*([P()] * 7)),
        best_rel_gap=P(), stall=P(),
        x_best=P(), best_gap=P(), best_primal=P(),
    )


def _gap_check_rows(pen, lam2, A_loc, b_loc, s: SolveState, col_norms,
                    screen: bool) -> SolveState:
    x, r_loc = s.x, s.r
    z = -lax.psum(A_loc.T @ r_loc, ROWS) - lam2 * x
    r_sq = lax.psum(jnp.vdot(r_loc, r_loc), ROWS)
    info = gap_from_parts(
        rho_dot_b=-lax.psum(jnp.vdot(r_loc, b_loc), ROWS),
        rho_aug_sq=r_sq + lam2 * jnp.vdot(x, x),
        g_value=pen.value(x),
        dual_norm_value=pen.dual_norm(z),
    )
    nnz = jnp.sum(x != 0).astype(jnp.int32)
    keep = s.keep_mask
    if screen:
        # r_norm/primal: the f32-rounding safety margins — without them an
        # active coordinate on the safe-sphere boundary is discarded by
        # reduction noise (screen_keep docstring; matches every other call)
        keep = keep & pen.screen_keep(z, info.alpha, info.gap, col_norms,
                                      r_norm=jnp.sqrt(r_sq),
                                      primal=info.primal)
    return record_check(s, info, x, nnz, keep)


def sharded_fista_rows(problem: Problem, L_total, state0: SolveState,
                       cfg: SolverConfig, mesh: jax.sharding.Mesh,
                       col_norms: jax.Array | None = None):
    """FISTA with rows of A (and b) sharded over mesh axis 'rows'.

    Returns (jitted_fn, args) like parallel.sharded.sharded_fista."""
    pen = problem.penalty
    lam2 = problem.lam2
    screen = cfg.screen_every > 0
    if col_norms is None:
        # note: col_norms needs a psum over rows; precompute globally here
        col_norms = (problem.col_norms() if screen
                     else jnp.zeros(problem.n, problem.dtype))

    def local_solve(A_loc, b_loc, lam1, L_tot, cn, s: SolveState) -> SolveState:
        pen_l = pen.with_lam1(lam1)

        def step(s: SolveState) -> SolveState:
            x, r, x_prev, r_prev, t = s.x, s.r, s.x_prev, s.r_prev, s.t_mom
            if cfg.momentum:
                t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
                beta = (t - 1.0) / t_next
                y = x + beta * (x - x_prev)
                r_y = r + beta * (r - r_prev)
            else:
                t_next, y, r_y = t, x, r
            g = lax.psum(A_loc.T @ r_y, ROWS) + lam2 * y
            stp = 1.0 / L_tot
            x_new = pen_l.prox(y - stp * g, stp)
            x_new = jnp.where(s.keep_mask, x_new, 0.0)
            r_new = A_loc @ x_new - b_loc          # local residual slice
            if cfg.momentum and cfg.adaptive_restart:
                # x-vectors are replicated: the restart dot needs no psum
                do_restart = jnp.vdot(y - x_new, x_new - x) > 0.0
                t_next = jnp.where(do_restart, 1.0, t_next)
                x_prev_out = jnp.where(do_restart, x_new, x)
                r_prev_out = jnp.where(do_restart, r_new, r)
            else:
                x_prev_out, r_prev_out = x, r
            return s._replace(x=x_new, r=r_new, x_prev=x_prev_out,
                              r_prev=r_prev_out, t_mom=t_next, k=s.k + 1)

        def body(s):
            s = lax.fori_loop(0, cfg.gap_every, lambda _, st: step(st), s)
            return _gap_check_rows(pen_l, lam2, A_loc, b_loc, s, cn, screen)

        def cond(s):
            go = (s.k < cfg.max_iters) & (s.rel_gap > cfg.tol)
            if cfg.stall_checks > 0:
                go = go & (s.stall < cfg.stall_checks)
            return go

        s = _gap_check_rows(pen_l, lam2, A_loc, b_loc, s, cn, screen)
        return lax.while_loop(cond, body, s)

    sspec = _state_specs_rows()
    f = jax.shard_map(
        local_solve, mesh=mesh,
        in_specs=(P(ROWS, None), P(ROWS), P(), P(), P(), sspec),
        out_specs=sspec,
    )
    args = check_lam1_slot((problem.A, problem.b, pen.lam1, L_total,
                            col_norms, state0), pen)
    return jax.jit(f), args


def _block_prox_slice(kind: str, lam1, weights, v, t, j, gsz: int):
    """Prox of one B-wide block slice (separable penalties; group-aligned
    blocks for group_l2 — the caller guarantees B % gsz == 0).  ``weights``
    is the per-group weight array covering the caller's x width (None =>
    unit weights); ``j`` is the block index into it."""
    B = v.shape[0]
    if kind == "l1":
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - t * lam1, 0.0)
    if kind == "nonneg_l1":
        return jnp.maximum(v - t * lam1, 0.0)
    # group_l2
    gpb = B // gsz
    gv = v.reshape(gpb, gsz)
    gn = jnp.linalg.norm(gv, axis=1, keepdims=True)
    w = (jnp.ones((gpb, 1), v.dtype) if weights is None
         else lax.dynamic_slice_in_dim(weights, j * gpb, gpb).reshape(gpb, 1))
    scale = jnp.maximum(0.0, 1.0 - t * lam1 * w / jnp.maximum(gn, 1e-30))
    return (gv * scale).reshape(B)


def sharded_bcd_rows(problem: Problem, block_L, state0: SolveState,
                     cfg: SolverConfig, mesh: jax.sharding.Mesh,
                     col_norms: jax.Array | None = None):
    """Block-CD with rows of A sharded over mesh axis 'rows' (round 3:
    closes the r2 fista-only asymmetry for the DP layout).

    Unlike the column-sharded solver (Jacobi ACROSS chips + line-searched
    merge, parallel/sharded.py), row sharding keeps x replicated, so the
    sweep is TRUE cyclic Gauss-Seidel — identical arithmetic to the
    single-device reference sweep — at the cost of one B-vector psum per
    block (the block gradient consensus):

        g_j    = psum(A_loc[:, j]^T r_loc) + lam2 x_j     # (B,) psum
        x_j'   = prox_{t_j}(x_j - t_j g_j)                # replicated
        r_loc += A_loc[:, j] (x_j' - x_j)                 # local slice

    Latency-bound on a real slice (n_blocks small collectives per sweep
    vs the column layout's single m-vector consensus) — the right layout
    when m >> n or when GS convergence is worth the chatter.  Exact
    residual refresh at every gap check pins incremental drift, as in
    solvers/bcd.py.  Returns (jitted_fn, args) like sharded_fista_rows.
    """
    pen = problem.penalty
    lam2 = problem.lam2
    screen = cfg.screen_every > 0
    if col_norms is None:
        col_norms = (problem.col_norms() if screen
                     else jnp.zeros(problem.n, problem.dtype))
    n_blocks = block_L.shape[0]
    n = problem.n
    if n % n_blocks != 0:
        raise ValueError(f"n={n} not divisible by n_blocks={n_blocks}")
    B = n // n_blocks
    if pen.kind == "group_l2" and B % (n // pen.ngroups) != 0:
        raise ValueError("block size must contain whole groups")

    def local_solve(A_loc, b_loc, lam1, bL, cn, s: SolveState) -> SolveState:
        pen_l = pen.with_lam1(lam1)
        steps = cfg.step_scale / (bL + lam2)          # (n_blocks,)

        def sweep(s: SolveState) -> SolveState:
            def one_block(j, carry):
                x, r_loc = carry
                c0 = j * B
                Aj = lax.dynamic_slice_in_dim(A_loc, c0, B, axis=1)
                xj = lax.dynamic_slice_in_dim(x, c0, B)
                g = lax.psum(Aj.T @ r_loc, ROWS) + lam2 * xj
                t = steps[j]
                # per-block prox via a full-width masked prox would pay
                # O(n) per block; slice-local prox instead (separable and
                # group-aligned by the B % gsize check above)
                v = xj - t * g
                xn = _block_prox_slice(
                    pen_l.kind, lam1, pen.weights, v, t, j,
                    n // pen.ngroups if pen.kind == "group_l2" else 1)
                keep_j = lax.dynamic_slice_in_dim(s.keep_mask, c0, B)
                xn = jnp.where(keep_j, xn, 0.0)
                r_loc = r_loc + Aj @ (xn - xj)
                x = lax.dynamic_update_slice_in_dim(x, xn, c0, 0)
                return x, r_loc

            x, r_loc = lax.fori_loop(0, n_blocks, one_block, (s.x, s.r))
            return s._replace(x=x, r=r_loc, k=s.k + 1)

        def body(s):
            s = lax.fori_loop(0, cfg.gap_every, lambda _, st: sweep(st), s)
            # exact refresh: the sweep maintains r_loc incrementally
            s = s._replace(r=A_loc @ s.x - b_loc)
            return _gap_check_rows(pen_l, lam2, A_loc, b_loc, s, cn, screen)

        def cond(s):
            go = (s.k < cfg.max_iters) & (s.rel_gap > cfg.tol)
            if cfg.stall_checks > 0:
                go = go & (s.stall < cfg.stall_checks)
            return go

        s = _gap_check_rows(pen_l, lam2, A_loc, b_loc, s, cn, screen)
        return lax.while_loop(cond, body, s)

    sspec = _state_specs_rows()
    f = jax.shard_map(
        local_solve, mesh=mesh,
        in_specs=(P(ROWS, None), P(ROWS), P(), P(), P(), sspec),
        out_specs=sspec,
    )
    args = check_lam1_slot((problem.A, problem.b, pen.lam1, block_L,
                            col_norms, state0), pen)
    return jax.jit(f), args
