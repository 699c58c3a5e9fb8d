"""Config-3 measurement (nonneg elastic-net 10k x 100k, screening on) with
the same-algorithm CPU baseline column (VERDICT r2 #6).

Runs the production path (bcd_pallas + support polish, as the r2 8.5 s
row) and computes vs_baseline = per-sweep nonneg-EN GS cost (from
artifacts/baselines.json, measured by scripts/measure_baselines.py on a
quiet host) x the sweep count this solve used.

Run: python scripts/measure_config3.py   (needs the axon relay)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setswitchinterval(0.001)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_co_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

_T0 = time.perf_counter()
BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "artifacts", "baselines.json")
TOL = 1e-6


def tick(msg):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    from convex_optimization_tpu.api import solve
    from convex_optimization_tpu.core.datagen import make_lasso_instance_host
    from convex_optimization_tpu.solvers.polish import polish_support

    with open(BASE) as f:
        per_sweep = json.load(f)[
            "config3_10000x100000_nonneg_en_bcd_sweep_s"]

    m, n = ((256, 2048) if os.environ.get("C3_CI") == "1"
            else (10_000, 100_000))     # CI twin for CPU rehearsal
    inst, A_np, b_np = make_lasso_instance_host(
        0, m, n, penalty_kind="nonneg_l1", lam2=1e-3)
    problem = inst.problem
    tick("datagen + upload done")

    res = solve(problem, method="bcd_pallas", tol=TOL, max_iters=20_000,
                gap_every=10, stall_checks=15, block_size=128,
                screen_every=1)
    tick(f"solve: sweeps={res.iterations} timed={res.timed_iterations} "
         f"rel_gap={res.rel_gap:.2e} wall={res.wall_time_s:.2f}s "
         f"compile={res.compile_time_s:.1f}s")
    pr = polish_support(problem, res.x, tol=TOL, A_host=A_np, b_host=b_np,
                        verbose=True)
    total = res.wall_time_s + pr.wall_time_s
    ci = os.environ.get("C3_CI") == "1"
    out = {
        "metric": (f"config3_time_to_certified_1e-6_nonneg_en_{m}x{n}"
                   + ("_REHEARSAL" if ci else "")),
        "value": round(total, 3), "unit": "s",
        "solve_s": round(res.wall_time_s, 3),
        "polish_s": round(pr.wall_time_s, 3),
        "sweeps": res.iterations, "timed_sweeps": res.timed_iterations,
        "rel_gap": pr.rel_gap, "certified": bool(pr.rel_gap <= TOL),
    }
    if not ci:   # the per-unit baseline describes the REAL size only
        baseline_s = per_sweep * max(res.iterations, 1)
        out["baseline_s"] = round(baseline_s, 1)
        out["vs_baseline"] = round(baseline_s / total, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
