"""Config-4 single-chip twin measurement (BASELINE.md row): group lasso
10k x 131072, 1024 groups, bcd_pallas solve + group support polish.

Round-3 purpose: measure the _cd64_group polish (VERDICT r2 #3) against the
round-2 row (31 s certified, solve 0.98 s).  Also measures the same-algorithm
CPU baseline per sweep (VERDICT r2 #6) unless SKIP_BASELINE=1.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setswitchinterval(0.001)

M = int(os.environ.get("C4_M", 10_000))
N = int(os.environ.get("C4_N", 131_072))
NGROUPS = int(os.environ.get("C4_NGROUPS", 1024))
TOL = 1e-6

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_co_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from convex_optimization_tpu.api import solve
from convex_optimization_tpu.core.datagen import make_lasso_instance_host
from convex_optimization_tpu.solvers.polish import polish_support
from convex_optimization_tpu.utils.relay import warm_relay_async

# absorb the relay's per-process first-exec tax (40-500 s, probe-measured)
# concurrently with the minutes of datagen + upload below
warm_relay_async()

_T0 = time.perf_counter()


def tick(label):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {label}",
          file=sys.stderr, flush=True)


tick("imports done")
inst, A_np, b_np = make_lasso_instance_host(
    42, M, N, penalty_kind="group_l2", ngroups=NGROUPS)
problem = inst.problem
tick("datagen + device upload done")

baseline_per_sweep = None
if os.environ.get("SKIP_BASELINE") != "1":
    # same-algorithm CPU baseline: cyclic GS block prox over groups, NumPy
    # (the group analog of bench.numpy_bcd_sweep_seconds; measured BEFORE
    # the solve to avoid post-solve memory pressure)
    gsize = N // NGROUPS
    lam1 = float(jax.device_get(problem.penalty.lam1))
    # Frobenius upper bound on lam_max(A_g^T A_g): a sound step size whose
    # VALUE doesn't change the measured per-sweep cost (what the baseline
    # row needs); per-group power iteration on this 1-core host costs
    # minutes of gemv traffic at 1024 groups (measured, round 3)
    col_sq = np.einsum("ij,ij->j", A_np, A_np, dtype=np.float64)
    L = col_sq.reshape(NGROUPS, gsize).sum(axis=1)
    tick("baseline col_sq done")
    x = np.zeros(N, dtype=np.float32)
    r = -b_np.copy()
    sweeps = 2
    t0 = time.perf_counter()
    for _s in range(sweeps):
        tick(f"baseline sweep {_s}")
        for g in range(NGROUPS):
            sl = slice(g * gsize, (g + 1) * gsize)
            Ag = A_np[:, sl]
            grad = Ag.T @ r
            t = float(1.0 / L[g])
            v = x[sl] - t * grad
            nv = float(np.linalg.norm(v))
            s = max(0.0, 1.0 - t * lam1 / max(nv, 1e-30))
            xn = (s * v).astype(np.float32)
            r += Ag @ (xn - x[sl])
            x[sl] = xn
    baseline_per_sweep = (time.perf_counter() - t0) / sweeps
    print(f"# baseline per GS group sweep: {baseline_per_sweep:.3f}s",
          file=sys.stderr, flush=True)

tick("starting solve")
res = solve(problem, method="bcd_pallas", tol=TOL, max_iters=20_000,
            gap_every=10, stall_checks=15, block_size=128)
print(f"# solve: sweeps={res.iterations} timed={res.timed_iterations} "
      f"rel_gap={res.rel_gap:.2e} wall={res.wall_time_s:.2f}s "
      f"compile={res.compile_time_s:.1f}s", file=sys.stderr, flush=True)

pr = polish_support(problem, res.x, tol=TOL, A_host=A_np, b_host=b_np,
                    verbose=True)
total = res.wall_time_s + pr.wall_time_s
out = {
    "metric": f"time_to_certified_1e-6_group_lasso_{M}x{N}_{NGROUPS}g",
    "value": round(total, 3),
    "unit": "s",
    "solve_s": round(res.wall_time_s, 3),
    "polish_s": round(pr.wall_time_s, 3),
    "rel_gap": pr.rel_gap,
    "certified": bool(pr.rel_gap <= TOL),
    "kept": pr.kept,
}
if baseline_per_sweep is not None:
    out["baseline_s"] = round(baseline_per_sweep * max(res.iterations, 1), 1)
    out["vs_baseline"] = round(out["baseline_s"] / total, 2)
print(json.dumps(out))
