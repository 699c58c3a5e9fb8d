"""Working-set FISTA (celer/BLITZ-style outer loop, SURVEY.md C11 taken to
its conclusion): solve restricted subproblems on the device and expand by
full-width KKT checks.

Why: at the 10k x 100k north star the full-width FISTA moves ~8 GB of HBM
per iteration while the active set is ~7% of the columns.  The working-set
loop pays a few full passes (screens + KKT checks) and runs the thousands
of FISTA iterations on a ~10x smaller device-resident subproblem — the
iteration cost collapses proportionally.

Round structure:
  0. a few full-width FISTA iterations (decent x, honest gap estimate);
  1. gap-safe screen at x -> working set W (bucketed to stable sizes so
     the compact solver compiles once per bucket);
  2. FISTA on A[:, W] (device gather; warm-started) to tol or stall;
  3. full-width dual check: z = A^T r.  Violations (|z_j| > lam1 for j
     outside W) are added and we repeat; otherwise the FULL-width gap at
     the expanded-back x is the honest result.

The final reported gap is always computed full-width, so correctness never
depends on the screen being tight — a loose screen only costs an extra
round.  l1 / nonneg_l1 only (group gathers need group alignment; the plain
solvers cover group lasso).

DEPLOYMENT CAVEAT (measured on the axon relay, v5e): the outer loop
instantiates several distinct XLA programs (burn-in config + one per
working-set bucket), and the relay recompiles each per process (its
compiles are NOT covered by jax's persistent compilation cache).  The
steady-state math wins ~1.6x over plain FISTA at 10k x 100k (burn-in
1.16s/100 full iters, screens 0.07s), but first-run compiles add minutes.
Prefer plain `fista` when compile time matters; prefer `fista_ws` for
repeated solves inside one process (lambda paths, cross-validation).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from convex_optimization_tpu.core.problem import Problem
from convex_optimization_tpu.core.objective import (
    dual_witness,
    duality_gap,
)
from convex_optimization_tpu.solvers.common import SolverConfig
from convex_optimization_tpu.solvers.fista import fista, init_state
from convex_optimization_tpu.ops.power_iter import spectral_norm_sq


def _bucket(k: int, n: int, bucket: int) -> int:
    return min(n, -(-max(k, 1) // bucket) * bucket)


def solve_working_set(problem: Problem, cfg: SolverConfig, *,
                      x0: Optional[jax.Array] = None,
                      init_iters: int = 100, bucket: int = 2048,
                      max_rounds: int = 8):
    """Returns (x_full, final SolveState-like scalars dict, wall breakdown).

    Used by api.solve(method='fista_ws').
    """
    if problem.penalty.kind not in ("l1", "nonneg_l1"):
        raise ValueError("working-set solver supports l1 / nonneg_l1")
    n = problem.n
    t0 = time.perf_counter()

    L_total = spectral_norm_sq(problem.A) + problem.lam2

    # Every step of the outer loop is JITTED: on a relay-backed device each
    # EAGER op pays an HTTP round-trip (measured: an unjitted screen loop
    # cost minutes while the flops were milliseconds).
    @jax.jit
    def _screen_dev(problem, x):
        cn = problem.col_norms()
        r = problem.residual(x)
        z = dual_witness(problem, x, r)
        info = duality_gap(problem, x, r, z=z)
        keep = problem.penalty.screen_keep(z, info.alpha, info.gap, cn)
        keep = keep | (x != 0)                 # never drop active coords
        return keep, info

    def screen(x):
        """(keep indices, GapInfo) at the current iterate."""
        keep, info = _screen_dev(problem, x)
        return np.nonzero(np.asarray(jax.device_get(keep)))[0], info

    gather_cols = jax.jit(lambda A, idx: A[:, idx])
    gather_vec = jax.jit(lambda x, idx: x[idx])
    scatter_vec = jax.jit(
        lambda xs, idx: jnp.zeros((n,), xs.dtype).at[idx].set(xs))
    init_j = jax.jit(init_state, static_argnames="cfg")

    # phase 0: ADAPTIVE full-width burn-in — the screen only bites once the
    # gap is moderate, so take full-width batches (ONE static config =
    # one compiled program, called repeatedly with warm starts) until the
    # working set would actually shrink the problem
    cfg0 = dataclasses.replace(cfg, max_iters=init_iters,
                               gap_every=min(cfg.gap_every, init_iters),
                               stall_checks=0, screen_every=0)
    x = jnp.zeros((n,), problem.dtype) if x0 is None else x0
    total_inner = 0
    idx_np, info = None, None
    for _burn in range(10):
        s = fista(problem, L_total, init_j(problem, x, cfg0), cfg0, None)
        x = s.x
        total_inner += int(s.k)
        idx_np, info = screen(x)
        if bool(info.rel_gap <= cfg.tol) or len(idx_np) <= 0.6 * n:
            break

    rounds = 0
    prev_gap = float("inf")
    for rounds in range(1, max_rounds + 1):
        g = float(info.rel_gap)
        if g <= cfg.tol or g > 0.9 * prev_gap:
            break      # converged, or stalled at the f32 floor
        prev_gap = g
        k_b = _bucket(len(idx_np), n, bucket)
        if k_b >= n:
            # working set is everything: fall back to the plain solve
            cfgf = dataclasses.replace(cfg, screen_every=0)
            s = fista(problem, L_total, init_j(problem, x, cfgf),
                      cfgf, None)
            x = s.x_best
            total_inner += int(s.k)
            _, info = _screen_dev(problem, x)
            break
        if k_b > len(idx_np):
            extra = np.setdiff1d(np.arange(n), idx_np)[:k_b - len(idx_np)]
            idx_np = np.sort(np.concatenate([idx_np, extra]))
        idx = jnp.asarray(idx_np)

        # device-resident compact solve (gather stays on device)
        p_ws = dataclasses.replace(problem, A=gather_cols(problem.A, idx))
        cfg_ws = dataclasses.replace(cfg, screen_every=0)
        s_ws = fista(p_ws, L_total,
                     init_j(p_ws, gather_vec(x, idx), cfg_ws),
                     cfg_ws, None)
        total_inner += int(s_ws.k)
        x = scatter_vec(s_ws.x_best, idx)
        # full-width re-screen + honest gap for the next round / the result
        idx_np, info = screen(x)

    wall = time.perf_counter() - t0
    return x, info, {"rounds": rounds, "inner_iters": total_inner,
                     "wall_s": wall}
