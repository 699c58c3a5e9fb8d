"""Warm-started lambda path (SURVEY.md C10, section 3.5 / config 2).

Solves a geometric sequence lam_max -> lam_min, warm-starting each solve at
the previous solution.  lam1 is *data* (a traced leaf of the Penalty pytree),
so every path point reuses ONE compiled solver — the host loop costs nothing
but dispatch.  Gap-safe screening masks sharpen as the path descends; the
mask is carried forward (a coordinate screened at larger lam1 is NOT
necessarily zero at smaller lam1, so masks are re-derived, not inherited —
only the warm-start x is inherited).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from convex_optimization_tpu.core.problem import Problem
from convex_optimization_tpu.core.objective import lambda_max
from convex_optimization_tpu.solvers.common import SolverConfig
from convex_optimization_tpu.solvers.fista import fista, init_state


class PathResult(NamedTuple):
    lambdas: jax.Array      # (path_len,)
    xs: jax.Array           # (path_len, n) solutions
    gaps: jax.Array         # (path_len,) final relative gaps
    iters: jax.Array        # (path_len,) iterations used


def lambda_path(
    problem: Problem,
    cfg: SolverConfig,
    *,
    path_len: int = 10,
    lam_min_frac: float = 0.01,
    lambdas: jax.Array | None = None,
) -> PathResult:
    """Warm-started path with the jitted FISTA solver (one compilation)."""
    if lambdas is None:
        lmax = lambda_max(problem.A, problem.b, problem.penalty)
        # start just below lam_max (at lam_max the solution is exactly 0)
        lambdas = jnp.geomspace(0.95 * lmax, lam_min_frac * lmax, path_len)
    lambdas = jnp.asarray(lambdas)

    L_total = None
    xs, gaps, iters = [], [], []
    x_warm = None
    col_norms = problem.col_norms() if cfg.screen_every > 0 else None
    from convex_optimization_tpu.ops.power_iter import spectral_norm_sq

    L_total = spectral_norm_sq(problem.A) + problem.lam2

    for lam in lambdas:
        p = problem.with_lam1(lam)
        state = init_state(p, x_warm, cfg)
        state = fista(p, L_total, state, cfg, col_norms)
        x_warm = state.x
        xs.append(state.x)
        gaps.append(state.rel_gap)
        iters.append(state.k)

    return PathResult(
        lambdas=lambdas,
        xs=jnp.stack(xs),
        gaps=jnp.stack(gaps),
        iters=jnp.stack(iters),
    )
