"""f64 post-solve refinement ("polish") on the screened support.

Why this exists: the f32 iteration arithmetic on TPU has an empirical
relative-duality-gap floor of a few 1e-6 at scale (measured: a 4096 x 32768
lasso plateaus at ~5e-6 true gap regardless of matmul precision — the
noise is injected by rounded matvecs each step, not by the monitor;
SURVEY.md section 7.4 anticipated exactly this).  To CERTIFY the 1e-6 grade
[B:2] the solve finishes with a small float64 phase:

  1. gap-safe screen at the f32 solution (f64 certificate) — at gap ~5e-6
     the safe sphere is tight, so the kept set is a small superset of the
     support;
  2. compact the problem to the kept columns (host-side, new static shape);
  3. run the SAME jitted FISTA in float64 on the CPU device, warm-started
     at the f32 solution (TPU f64 is software-emulated and far slower than
     host f64 — measured 17s for a 1024^3 matmul — so CPU is the right
     backend for this small tail);
  4. scatter back and re-certify in f64.

Screening safety (models/penalties.py screen_keep) guarantees the discarded
coordinates are exactly zero at the optimum, so the compacted solve's
certificate is valid for the full problem.
"""

from __future__ import annotations

import dataclasses
import time
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class PolishResult(NamedTuple):
    x: np.ndarray          # (n,) float64 polished solution
    rel_gap: float         # f64-certified relative duality gap (full problem)
    gap: float
    primal: float
    kept: int              # columns that survived screening
    iterations: int        # f64 FISTA iterations
    wall_time_s: float


def polish(problem, x, *, tol: float = 1e-6, max_iters: int = 20_000,
           gap_every: int = 50) -> PolishResult:
    """Refine a solution to an f64-certified relative gap <= tol."""
    from convex_optimization_tpu.core.problem import Problem
    from convex_optimization_tpu.core.objective import duality_gap
    from convex_optimization_tpu.models.penalties import Penalty
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.fista import fista, init_state
    from convex_optimization_tpu.solvers.screening import (
        gap_safe_keep_mask,
        compact_problem,
    )
    from convex_optimization_tpu.ops.power_iter import spectral_norm_sq

    t0 = time.perf_counter()
    # host copies (f32 -> f64)
    A = np.asarray(jax.device_get(problem.A), dtype=np.float64)
    b = np.asarray(jax.device_get(problem.b), dtype=np.float64)
    x_np = np.asarray(jax.device_get(x), dtype=np.float64)
    lam1 = float(jax.device_get(jnp.asarray(problem.penalty.lam1)))
    weights = problem.penalty.weights
    w_np = (None if weights is None
            else np.asarray(jax.device_get(weights), dtype=np.float64))

    x64_was = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            pen64 = Penalty(lam1=lam1, kind=problem.penalty.kind,
                            ngroups=problem.penalty.ngroups,
                            weights=None if w_np is None else jnp.asarray(w_np))
            p64 = Problem(A=jnp.asarray(A), b=jnp.asarray(b), penalty=pen64,
                          lam2=float(problem.lam2))
            keep = gap_safe_keep_mask(p64, jnp.asarray(x_np))
            small, idx = compact_problem(p64, keep)
            x_small = jnp.asarray(x_np)[idx]

            cfg = SolverConfig(tol=tol, max_iters=max_iters,
                               gap_every=gap_every)
            L = spectral_norm_sq(small.A) + small.lam2
            state = init_state(small, x_small, cfg)
            final = fista(small, L, state, cfg, None)
            jax.block_until_ready(final.x)

            x_full = jnp.zeros((problem.n,), jnp.float64).at[idx].set(final.x)
            info = duality_gap(p64, x_full)
        wall = time.perf_counter() - t0
        return PolishResult(
            x=np.asarray(x_full),
            rel_gap=float(info.rel_gap),
            gap=float(info.gap),
            primal=float(info.primal),
            kept=int(idx.shape[0]),
            iterations=int(final.k),
            wall_time_s=wall,
        )
    finally:
        jax.config.update("jax_enable_x64", x64_was)
