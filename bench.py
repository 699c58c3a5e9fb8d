"""Headline benchmark: wall-clock to an f64-CERTIFIED 1e-6 relative duality
gap on a dense lasso (default 10k x 100k — the BASELINE.json north-star
size).  Two phases, both included in the reported time:

  1. jitted f32 FISTA on the default device (TPU under the driver), with
     stall detection — f32 iteration arithmetic has an empirical gap floor
     of a few 1e-6 at scale, so the loop exits when checks stop improving;
  2. f64 polish on the gap-safe-screened support (CPU), which certifies
     rel_gap <= 1e-6 in float64 (solvers/polish.py).

Prints ONE JSON line:
  {"metric": ..., "value": <seconds>, "unit": "s", "vs_baseline": <speedup>}

vs_baseline is an honest like-for-like speedup: the baseline is the SAME
algorithm (FISTA, identical iteration sequence) implemented the reference's
way — NumPy on the host CPU (the reference's CPU backend, SURVEY.md C3) —
whose per-iteration wall time is measured on the same instance and scaled
by the f32 iteration count our solve actually used.  The baseline is NOT
charged for a polish phase (conservative: favors the baseline).

Env overrides for smoke tests: BENCH_M, BENCH_N, BENCH_TOL, BENCH_BASE_ITERS.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def numpy_fista_per_iter_seconds(A: np.ndarray, b: np.ndarray, lam1: float,
                                 iters: int = 3) -> float:
    """Measured seconds per FISTA iteration for the NumPy/CPU reference path.

    One iteration = A.T @ r (gradient) + prox + A @ x (residual refresh) —
    the same two passes over A as the TPU path (solvers/fista.py).
    """
    n = A.shape[1]
    x = np.zeros(n, dtype=A.dtype)
    x_prev = x.copy()
    r = -b.copy()
    r_prev = r.copy()
    t_mom = 1.0
    # power iteration for the step size (setup cost, not timed)
    v = np.random.default_rng(0).standard_normal(n).astype(A.dtype)
    v /= np.linalg.norm(v)
    for _ in range(16):
        w = A.T @ (A @ v)
        v = w / max(np.linalg.norm(w), 1e-30)
    w = A @ v
    L = 1.02 * float(w @ w)
    step = 1.0 / L

    t0 = time.perf_counter()
    for _ in range(iters):
        t_next = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t_mom * t_mom))
        beta = (t_mom - 1.0) / t_next
        y = x + beta * (x - x_prev)
        r_y = r + beta * (r - r_prev)
        g = A.T @ r_y
        v2 = y - step * g
        x_new = np.sign(v2) * np.maximum(np.abs(v2) - step * lam1, 0.0)
        r_new = A @ x_new - b
        x_prev, r_prev, x, r, t_mom = x, r, x_new, r_new, t_next
    t1 = time.perf_counter()
    return (t1 - t0) / iters


def main() -> None:
    m = int(os.environ.get("BENCH_M", 10_000))
    n = int(os.environ.get("BENCH_N", 100_000))
    tol = float(os.environ.get("BENCH_TOL", 1e-6))
    base_iters = int(os.environ.get("BENCH_BASE_ITERS", 3))

    import jax

    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.api import solve
    from convex_optimization_tpu.solvers.polish import polish
    from convex_optimization_tpu.utils.metrics import effective_bandwidth

    inst = make_lasso_instance(jax.random.PRNGKey(42), m, n)
    problem = inst.problem
    lam1 = float(jax.device_get(problem.penalty.lam1))

    res = solve(problem, method="fista", tol=tol, max_iters=20_000,
                gap_every=10, stall_checks=15)
    certified = res.converged and res.rel_gap <= tol
    polish_wall = 0.0
    final_gap = res.rel_gap
    if not certified:
        pr = polish(problem, res.x, tol=tol)
        polish_wall = pr.wall_time_s
        final_gap = pr.rel_gap
        certified = pr.rel_gap <= tol
    if not certified:
        print(f"WARNING: not certified at tol={tol}; rel_gap={final_gap:.3e}",
              file=sys.stderr)

    total_wall = res.wall_time_s + polish_wall

    # reference-style CPU baseline on the identical instance
    A_np = np.asarray(jax.device_get(problem.A))
    b_np = np.asarray(jax.device_get(problem.b))
    per_iter = numpy_fista_per_iter_seconds(A_np, b_np, lam1,
                                            iters=base_iters)
    baseline_s = per_iter * max(res.iterations, 1)

    print(json.dumps({
        "metric": f"time_to_certified_{tol:g}_rel_gap_lasso_{m}x{n}",
        "value": round(total_wall, 4),
        "unit": "s",
        "vs_baseline": round(baseline_s / total_wall, 2)
            if total_wall > 0 else float("inf"),
    }))
    bw = effective_bandwidth(m, n, res.iterations, res.wall_time_s)
    print(
        f"# f32: iters={res.iterations} rel_gap={res.rel_gap:.2e} "
        f"wall={res.wall_time_s:.2f}s iters/s={res.iters_per_sec:.1f} "
        f"bw={bw['achieved_gb_s']:.0f}GB/s "
        f"({100*bw['fraction_of_peak']:.0f}% of HBM peak) "
        f"compile={res.compile_time_s:.1f}s | polish: wall={polish_wall:.2f}s "
        f"final_gap={final_gap:.2e} certified={certified} | "
        f"baseline_per_iter={per_iter:.4f}s total={baseline_s:.1f}s | "
        f"device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
