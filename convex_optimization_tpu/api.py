"""User-facing API (L5): ``solve(problem, method=...) -> Result``.

The reference's user surface is "run the driver script" (SURVEY.md section
3.1); this framework exposes a library call that picks the solver, handles
Lipschitz precompute, runs the single jitted solve, and returns a Result
with the solution, the certified gap, and the convergence history.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp

from convex_optimization_tpu.core.problem import Problem
from convex_optimization_tpu.solvers.common import SolverConfig
# NOTE: import the submodules explicitly — the package re-exports functions
# named `fista`/`bcd`, which shadow the module attributes on the package.
import convex_optimization_tpu.solvers.fista as fista_mod  # noqa: E402
import convex_optimization_tpu.solvers.bcd as bcd_mod  # noqa: E402
import sys

fista_mod = sys.modules["convex_optimization_tpu.solvers.fista"]
bcd_mod = sys.modules["convex_optimization_tpu.solvers.bcd"]
from convex_optimization_tpu.ops.power_iter import (
    spectral_norm_sq,
    block_spectral_norms_sq,
)


@dataclasses.dataclass
class Result:
    x: jax.Array
    gap: float               # absolute duality gap at the last check
    rel_gap: float           # relative duality gap (the convergence criterion)
    primal: float
    iterations: int          # FISTA iterations or BCD sweeps
    converged: bool
    wall_time_s: float       # solve wall-clock (excludes compilation)
    compile_time_s: float
    iters_per_sec: float
    history: dict            # trimmed convergence history (numpy arrays)
    method: str
    config: SolverConfig

    @property
    def nnz(self) -> int:
        return int(jnp.sum(self.x != 0))


def solve(
    problem: Problem,
    method: str = "fista",
    *,
    x0: Optional[jax.Array] = None,
    cfg: Optional[SolverConfig] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    **cfg_overrides: Any,
) -> Result:
    """Solve a composite problem.
    method: 'fista' | 'ista' | 'bcd' | 'bcd_pallas' | 'admm'.

    When ``mesh`` is given, the column-sharded distributed solver is used
    (see parallel/); otherwise everything runs on the default device.
    Extra kwargs override SolverConfig fields (e.g. tol=1e-8, max_iters=5000).
    """
    if mesh is not None:
        from convex_optimization_tpu.parallel.sharded import solve_sharded

        return solve_sharded(problem, method=method, mesh=mesh, x0=x0,
                             cfg=cfg, **cfg_overrides)

    if cfg is None:
        cfg = SolverConfig()
    if method == "ista":
        cfg_overrides.setdefault("momentum", False)
    if method == "bcd_pallas":
        cfg_overrides.setdefault("use_pallas", True)
    if cfg_overrides:
        cfg = dataclasses.replace(cfg, **cfg_overrides)

    col_norms = problem.col_norms() if cfg.screen_every > 0 else None

    # Each branch yields the jitted fn, its full arg tuple (for .lower),
    # and the dynamic args (statics like cfg are baked in at compile time).
    if method in ("fista", "ista"):
        L_total = spectral_norm_sq(problem.A) + problem.lam2
        state0 = fista_mod.init_state(problem, x0, cfg)
        jfn = fista_mod.fista
        jargs = (problem, L_total, state0, cfg, col_norms)
        dyn = (problem, L_total, state0, col_norms)
    elif method in ("bcd", "bcd_pallas"):
        multiple = 1
        if problem.penalty.kind == "group_l2":
            multiple = problem.n // problem.penalty.ngroups
        bs = bcd_mod.pick_block_size(problem.n, cfg.block_size,
                                     multiple_of=multiple)
        n_blocks = problem.n // bs
        block_L = block_spectral_norms_sq(problem.A, n_blocks)
        state0 = fista_mod.init_state(problem, x0, cfg)
        jfn = bcd_mod.bcd
        jargs = (problem, block_L, state0, cfg, col_norms)
        dyn = (problem, block_L, state0, col_norms)
    elif method == "admm":
        from convex_optimization_tpu.solvers import admm as admm_mod

        fac = admm_mod.admm_setup(problem)
        state0 = admm_mod.init_state(problem, x0, cfg)
        jfn = admm_mod.admm
        jargs = (problem, fac, state0, cfg)
        dyn = (problem, fac, state0)
    else:
        raise ValueError(f"unknown method {method!r}")

    # AOT compile (untimed), then time exactly ONE execution.  NOTE: a
    # warm-up-then-retime pattern is wrong here — execution backends may
    # memoize identical (program, inputs) pairs, making the second call
    # read ~0 (observed on the axon relay).
    t0 = time.perf_counter()
    compiled = jfn.lower(*jargs).compile()
    t1 = time.perf_counter()
    final = compiled(*dyn)
    jax.block_until_ready(final.x)
    t2 = time.perf_counter()

    iters = int(final.k)
    wall = t2 - t1
    return Result(
        x=final.x,
        gap=float(final.gap),
        rel_gap=float(final.rel_gap),
        primal=float(final.primal),
        iterations=iters,
        converged=bool(final.rel_gap <= cfg.tol),
        wall_time_s=wall,
        compile_time_s=t1 - t0,
        iters_per_sec=iters / wall if wall > 0 else float("inf"),
        history=final.history.trimmed(),
        method=method,
        config=cfg,
    )
