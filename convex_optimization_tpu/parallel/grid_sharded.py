"""2-D sharded FISTA: A tiled over a ('rows', 'blocks') mesh — the DP x TP
composition (SURVEY.md section 2.2's strategies combined).

Each chip owns an (m/R, n/C) tile of A, the matching slice of b (rows) and
of x (blocks).  Per iteration exactly TWO collectives, each over ONE mesh
axis and of LOCAL size:

    g_loc = psum_rows(A_loc^T r_loc) + lam2 * y_loc     # (n/C)-vector
    x+    = prox(y - g/L)                               # local
    r+    = psum_blocks(A_loc x+_loc) - b_loc           # (m/R)-vector

so both the residual and the gradient consensus shrink as the mesh grows in
the other axis — the layout for matrices too large for one chip in BOTH
dimensions (config 5 at multi-host scale).  The duality-gap monitor reduces
partials over the correct single axes (psum over rows for <r, b> and
||r||^2; psum over blocks for g(x), ||x||^2, nnz; pmax over blocks for the
dual norm — z is already rows-replicated after its psum).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from convex_optimization_tpu.core.objective import gap_from_parts
from convex_optimization_tpu.core.problem import Problem
from convex_optimization_tpu.parallel.mesh import (BLOCKS, ROWS,
                                                     check_lam1_slot)
from convex_optimization_tpu.solvers.common import (
    History,
    SolveState,
    SolverConfig,
    record_check,
)


def make_grid_mesh(rows: int, cols: int, devices=None):
    """(rows x cols) mesh with axes ('rows', 'blocks')."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    if len(devices) < rows * cols:
        raise ValueError(f"need {rows * cols} devices, have {len(devices)}")
    return jax.sharding.Mesh(
        np.asarray(devices[:rows * cols]).reshape(rows, cols),
        (ROWS, BLOCKS),
    )


def _state_specs_grid() -> SolveState:
    return SolveState(
        x=P(BLOCKS), r=P(ROWS), x_prev=P(BLOCKS), r_prev=P(ROWS),
        t_mom=P(), k=P(), rel_gap=P(), gap=P(), primal=P(),
        keep_mask=P(BLOCKS),
        history=History(*([P()] * 7)),
        best_rel_gap=P(), stall=P(),
        x_best=P(BLOCKS), best_gap=P(), best_primal=P(),
    )


def _gap_check_grid(pen, lam2, A_loc, b_loc, s: SolveState, cn_loc,
                    screen: bool) -> SolveState:
    x_loc, r_loc = s.x, s.r
    z_loc = -lax.psum(A_loc.T @ r_loc, ROWS) - lam2 * x_loc
    dn = lax.pmax(pen.dual_norm(z_loc), BLOCKS)
    x_sq = lax.psum(jnp.vdot(x_loc, x_loc), BLOCKS)
    g_val = lax.psum(pen.value(x_loc), BLOCKS)
    r_sq = lax.psum(jnp.vdot(r_loc, r_loc), ROWS)
    info = gap_from_parts(
        rho_dot_b=-lax.psum(jnp.vdot(r_loc, b_loc), ROWS),
        rho_aug_sq=r_sq + lam2 * x_sq,
        g_value=g_val,
        dual_norm_value=dn,
    )
    nnz = lax.psum(jnp.sum(x_loc != 0), BLOCKS).astype(jnp.int32)
    keep = s.keep_mask
    if screen:
        # r_norm/primal: f32-rounding safety margins (see _gap_check_rows)
        keep = keep & pen.screen_keep(z_loc, info.alpha, info.gap, cn_loc,
                                      r_norm=jnp.sqrt(r_sq),
                                      primal=info.primal)
    return record_check(s, info, x_loc, nnz, keep)


def grid_sharded_fista(problem: Problem, L_total, state0: SolveState,
                       cfg: SolverConfig, mesh: jax.sharding.Mesh,
                       col_norms: jax.Array | None = None):
    """Returns (jitted_fn, args); see module docstring for the layout."""
    n_cols = mesh.shape[BLOCKS]
    pen = problem.penalty
    lam2 = problem.lam2
    kind = pen.kind
    screen = cfg.screen_every > 0
    if col_norms is None:
        col_norms = (problem.col_norms() if screen
                     else jnp.zeros(problem.n, problem.dtype))
    weights = pen.weights
    if kind == "group_l2" and weights is None:
        weights = jnp.ones((pen.ngroups,), problem.dtype)
    w_spec = P(BLOCKS) if kind == "group_l2" else P()
    if weights is None:
        weights = jnp.zeros((1,), problem.dtype)

    from convex_optimization_tpu.parallel.sharded import _local_penalty

    def local_solve(A_loc, b_loc, lam1, weights_loc, L_tot, cn_loc,
                    s: SolveState) -> SolveState:
        pen_loc = _local_penalty(pen, n_cols, lam1, weights_loc
                                 if kind == "group_l2" else None)

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
            x_new = pen_loc.prox(y - stp * g, stp)
            x_new = jnp.where(s.keep_mask, x_new, 0.0)
            r_new = lax.psum(A_loc @ x_new, BLOCKS) - b_loc
            if cfg.momentum and cfg.adaptive_restart:
                dot = lax.psum(jnp.vdot(y - x_new, x_new - x), BLOCKS)
                do_restart = dot > 0.0
                t_next = jnp.where(do_restart, 1.0, t_next)
                x_prev_out = jnp.where(do_restart, x_new, x)
                r_prev_out = jnp.where(do_restart, r_new, r)
            else:
                x_prev_out, r_prev_out = x, r
            return s._replace(x=x_new, r=r_new, x_prev=x_prev_out,
                              r_prev=r_prev_out, t_mom=t_next, k=s.k + 1)

        def body(s):
            s = lax.fori_loop(0, cfg.gap_every, lambda _, st: step(st), s)
            return _gap_check_grid(pen_loc, lam2, A_loc, b_loc, s, cn_loc,
                                   screen)

        def cond(s):
            go = (s.k < cfg.max_iters) & (s.rel_gap > cfg.tol)
            if cfg.stall_checks > 0:
                go = go & (s.stall < cfg.stall_checks)
            return go

        s = _gap_check_grid(pen_loc, lam2, A_loc, b_loc, s, cn_loc, screen)
        return lax.while_loop(cond, body, s)

    sspec = _state_specs_grid()
    f = jax.shard_map(
        local_solve, mesh=mesh,
        in_specs=(P(ROWS, BLOCKS), P(ROWS), P(), w_spec, P(), P(BLOCKS),
                  sspec),
        out_specs=sspec,
    )
    args = check_lam1_slot((problem.A, problem.b, pen.lam1, weights,
                            L_total, col_norms, state0), pen)
    return jax.jit(f), args


def grid_sharded_bcd(problem: Problem, block_L, state0: SolveState,
                     cfg: SolverConfig, mesh: jax.sharding.Mesh,
                     col_norms: jax.Array | None = None):
    """2-D sharded block-CD (round 3: closes the r2 fista-only asymmetry
    for the DP x TP grid).  The hybrid of the two 1-D BCD layouts:

      * WITHIN a chip's column slab: cyclic Gauss-Seidel over its local
        blocks, each block gradient psum'd over ROWS (the row-sharded
        pattern — g_j needs the full residual, which lives row-sharded);
      * ACROSS column shards: Jacobi with the line-searched merge of
        parallel/sharded.py (chips sweep concurrently against the shared
        residual; the aggregated direction is safeguarded by the same
        closed-form line search, floored at 1/n_cols for guaranteed
        descent by Jacobi averaging).

    Exact residual refresh (psum over BLOCKS) before every gap check pins
    incremental drift, as everywhere else.  Returns (jitted_fn, args).
    """
    n_cols = mesh.shape[BLOCKS]
    pen = problem.penalty
    lam2 = problem.lam2
    kind = pen.kind
    screen = cfg.screen_every > 0
    n = problem.n
    if col_norms is None:
        col_norms = (problem.col_norms() if screen
                     else jnp.zeros(n, problem.dtype))
    weights = pen.weights
    if kind == "group_l2" and weights is None:
        weights = jnp.ones((pen.ngroups,), problem.dtype)
    w_spec = P(BLOCKS) if kind == "group_l2" else P()
    if weights is None:
        weights = jnp.zeros((1,), problem.dtype)

    n_blocks = block_L.shape[0]
    if n % n_blocks != 0 or n_blocks % n_cols != 0:
        raise ValueError(
            f"n={n} / n_blocks={n_blocks} must tile over {n_cols} column "
            f"shards")
    B = n // n_blocks
    nb_loc = n_blocks // n_cols
    gsz = n // pen.ngroups if kind == "group_l2" else 1
    if kind == "group_l2" and B % gsz != 0:
        raise ValueError("block size must contain whole groups")

    from convex_optimization_tpu.parallel.row_sharded import _block_prox_slice
    from convex_optimization_tpu.parallel.sharded import _local_penalty

    def local_solve(A_loc, b_loc, lam1, weights_loc, bL_loc, cn_loc,
                    s: SolveState) -> SolveState:
        pen_loc = _local_penalty(pen, n_cols, lam1, weights_loc
                                 if kind == "group_l2" else None)
        steps = cfg.step_scale / (bL_loc + lam2)      # (nb_loc,)
        w_arr = weights_loc if kind == "group_l2" else None

        def sweep(s: SolveState) -> SolveState:
            x_loc, r_rep = s.x, s.r       # (n/C,), (m/R,) [BLOCKS-replicated]

            def one_block(j, carry):
                x, dr, r_cur = carry
                c0 = j * B
                Aj = lax.dynamic_slice_in_dim(A_loc, c0, B, axis=1)
                xj = lax.dynamic_slice_in_dim(x, c0, B)
                g = lax.psum(Aj.T @ r_cur, ROWS) + lam2 * xj
                t = steps[j]
                xn = _block_prox_slice(kind, lam1, w_arr, xj - t * g, t, j,
                                       gsz)
                keep_j = lax.dynamic_slice_in_dim(s.keep_mask, c0, B)
                xn = jnp.where(keep_j, xn, 0.0)
                d = Aj @ (xn - xj)        # (m/R,) local residual delta
                x = lax.dynamic_update_slice_in_dim(x, xn, c0, 0)
                return x, dr + d, r_cur + d

            # r enters BLOCKS-replicated but the sweep makes it vary per
            # column shard — mark the carry varying for shard_map's VMA
            # checks (same pattern as parallel/sharded.py sweep())
            r_in = lax.pcast(r_rep, (BLOCKS,), to="varying")
            x_new, dr_loc, _ = lax.fori_loop(
                0, nb_loc, one_block,
                (x_loc, jnp.zeros_like(r_in), r_in))
            dx = x_new - x_loc
            dr = lax.psum(dr_loc, BLOCKS)         # merge column shards
            lin = (lax.psum(jnp.vdot(r_rep, dr), ROWS)
                   + lam2 * lax.psum(jnp.vdot(x_loc, dx), BLOCKS))
            den = (lax.psum(jnp.vdot(dr, dr), ROWS)
                   + lam2 * lax.psum(jnp.vdot(dx, dx), BLOCKS))
            dG = lax.psum(pen_loc.value_diff(x_loc, dx), BLOCKS)
            gamma_ls = jnp.clip(-(lin + dG) / jnp.maximum(den, 1e-30),
                                0.0, 1.0)
            gamma = jnp.maximum(gamma_ls, 1.0 / n_cols)
            return s._replace(x=x_loc + gamma * dx, r=r_rep + gamma * dr,
                              k=s.k + 1)

        def body(s):
            s = lax.fori_loop(0, cfg.gap_every, lambda _, st: sweep(st), s)
            # exact refresh (one psum over BLOCKS) pins incremental drift
            s = s._replace(r=lax.psum(A_loc @ s.x, BLOCKS) - b_loc)
            return _gap_check_grid(pen_loc, lam2, A_loc, b_loc, s, cn_loc,
                                   screen)

        def cond(s):
            go = (s.k < cfg.max_iters) & (s.rel_gap > cfg.tol)
            if cfg.stall_checks > 0:
                go = go & (s.stall < cfg.stall_checks)
            return go

        s = _gap_check_grid(pen_loc, lam2, A_loc, b_loc, s, cn_loc, screen)
        return lax.while_loop(cond, body, s)

    sspec = _state_specs_grid()
    f = jax.shard_map(
        local_solve, mesh=mesh,
        in_specs=(P(ROWS, BLOCKS), P(ROWS), P(), w_spec, P(BLOCKS),
                  P(BLOCKS), sspec),
        out_specs=sspec,
    )
    args = check_lam1_slot((problem.A, problem.b, pen.lam1, weights,
                            block_L, col_norms, state0), pen)
    return jax.jit(f), args
