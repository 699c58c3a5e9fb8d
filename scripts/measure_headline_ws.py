"""Headline working-set measurement (VERDICT r2 #4, the 'bytes' factor):
at 10k x 100k the full-width solver streams 4 GB per sweep while screening
certifies ~93% of columns zero.  This measures whether the kernel-routed
working set (solvers/working_set.py, round 3) converts that into wall
clock:

  * cold run: total wall INCLUDING every program compile (the r2 caveat
    was minutes of XLA-dot compiles; kernel-routed must be ~seconds);
  * warm run: same solve from a perturbed equivalent start — every program
    cached, honest steady-state wall (relay memoization defeated by the
    fresh input bytes);
  * + f64 polish to the certified 1e-6 for the BASELINE.md row; compares
    against the plain bcd_pallas headline from the same process.

Run: python scripts/measure_headline_ws.py    (needs the axon relay)
Env: WS_INNER (bcd | fista, default bcd), WS_M/WS_N, SKIP_PLAIN=1.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setswitchinterval(0.001)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_co_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

M = int(os.environ.get("WS_M", 10_000))
N = int(os.environ.get("WS_N", 100_000))
INNER = os.environ.get("WS_INNER", "bcd")
TOL = 1e-6

_T0 = time.perf_counter()


def tick(msg):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    from convex_optimization_tpu.core.datagen import make_lasso_instance_host
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.polish import polish_support
    from convex_optimization_tpu.solvers.working_set import solve_working_set
    from convex_optimization_tpu.utils.relay import warm_relay_async

    # absorb the relay's per-process first-exec tax (40-500 s, probe-
    # measured) concurrently with the minutes of datagen + upload below
    warm_relay_async()

    inst, A_np, b_np = make_lasso_instance_host(42, M, N)
    problem = inst.problem
    tick("datagen + upload done")

    cfg = SolverConfig(tol=TOL, max_iters=20_000, gap_every=10,
                       stall_checks=15)

    # cold: includes every compile (the honest deployment cost)
    t0 = time.perf_counter()
    x, info, meta = solve_working_set(problem, cfg, inner=INNER)
    cold = time.perf_counter() - t0
    tick(f"COLD ws({INNER}): wall={cold:.2f}s meta={meta} "
         f"rel_gap={float(info.rel_gap):.2e}")

    # warm: perturbed equivalent start, all programs cached
    x0 = jnp.zeros((N,), problem.dtype).at[0].add(
        jnp.asarray(1e-6, problem.dtype))
    t0 = time.perf_counter()
    x2, info2, meta2 = solve_working_set(problem, cfg, x0=x0, inner=INNER)
    _ = float(info2.rel_gap)              # value fetch = barrier
    warm = time.perf_counter() - t0
    tick(f"WARM ws({INNER}): wall={warm:.2f}s meta={meta2}")

    pr = polish_support(problem, x2, tol=TOL, A_host=A_np, b_host=b_np,
                        verbose=True)
    total = warm + pr.wall_time_s
    tick(f"polish: wall={pr.wall_time_s:.2f}s rel_gap={pr.rel_gap:.2e}")

    out = {
        "metric": f"ws_{INNER}_time_to_certified_1e-6_lasso_{M}x{N}",
        "value": round(total, 3), "unit": "s",
        "cold_wall_s": round(cold, 3),
        "warm_solve_s": round(warm, 3),
        "polish_s": round(pr.wall_time_s, 3),
        "rel_gap": pr.rel_gap,
        "certified": bool(pr.rel_gap <= TOL),
        "inner_iters": meta2["inner_iters"],
        "ws_size": meta2["ws_size"],
        "rounds": meta2["rounds"],
    }

    if os.environ.get("SKIP_PLAIN") != "1":
        from convex_optimization_tpu.api import solve

        res = solve(problem, method="bcd_pallas", tol=TOL, max_iters=20_000,
                    gap_every=10, stall_checks=15, block_size=128)
        tick(f"plain bcd_pallas: sweeps={res.iterations} "
             f"wall={res.wall_time_s:.2f}s compile={res.compile_time_s:.1f}s")
        out["plain_bcd_solve_s"] = round(res.wall_time_s, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
