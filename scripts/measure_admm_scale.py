"""ADMM at-scale verdict (VERDICT r3 task 6 / C9 asterisk).

One run of solve(method='admm', admm_setup='host') at the headline size
(10k x 100k): the setup is one device matmul (Gram) + a host f64 LAPACK
eigh of the 10k-dim Gram; the f32 iteration loop is unchanged.  Outcome
decides the fence:
  * certified <= 1e-6 within the iteration budget -> the fence can be
    lifted for admm_setup='host' (api.py already routes it past the
    fence);
  * stalls -> the fence is final; record the measured stall gap.

Prints one JSON row either way.  Run on a QUIET host with the relay up.
Env: ADMM_M/ADMM_N (default 10000 x 100000), ADMM_TOL (1e-6),
ADMM_MAX_ITERS (4000).
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


def tick(msg):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    m = int(os.environ.get("ADMM_M", 10_000))
    n = int(os.environ.get("ADMM_N", 100_000))
    tol = float(os.environ.get("ADMM_TOL", 1e-6))
    max_iters = int(os.environ.get("ADMM_MAX_ITERS", 4_000))

    from convex_optimization_tpu.api import solve
    from convex_optimization_tpu.core.datagen import make_lasso_instance_host
    from convex_optimization_tpu.solvers.polish import polish_support

    tick(f"generating {m}x{n} instance (host)")
    inst, A_np, b_np = make_lasso_instance_host(42, m, n)
    problem = inst.problem

    tick("solve(method='admm', admm_setup='host') — setup pays one device "
         "Gram matmul + host f64 eigh (untimed separately below)")
    t0 = time.perf_counter()
    res = solve(problem, method="admm", admm_setup="host", tol=tol,
                max_iters=max_iters, gap_every=10, stall_checks=25)
    t1 = time.perf_counter()
    tick(f"solve done: iters={res.iterations} rel_gap={res.rel_gap:.3e} "
         f"wall={res.wall_time_s:.2f}s compile+setup={res.compile_time_s:.1f}s")

    stalled = res.rel_gap > 10 * tol and res.iterations >= max_iters
    certified = None
    polish_wall = 0.0
    if not stalled:
        tick("f64 polish certificate")
        pr = polish_support(problem, res.x, tol=tol, A_host=A_np,
                            b_host=b_np, verbose=True)
        polish_wall = pr.wall_time_s
        certified = bool(pr.rel_gap <= tol)
        tick(f"polish: rel_gap={pr.rel_gap:.3e} certified={certified} "
             f"wall={polish_wall:.2f}s")

    print(json.dumps({
        "row": f"admm_host_setup_{m}x{n}",
        "solve_wall_s": round(res.wall_time_s, 2),
        "setup_plus_compile_s": round(res.compile_time_s, 2),
        "total_script_s": round(t1 - t0, 2),
        "polish_wall_s": round(polish_wall, 2),
        "iters": res.iterations,
        "rel_gap_f32_monitor": float(res.rel_gap),
        "stalled": bool(stalled),
        "certified_1e6": certified,
        "verdict": ("LIFT fence for admm_setup='host'"
                    if certified else
                    ("fence FINAL: stalled at "
                     f"{res.rel_gap:.1e}" if stalled else
                     "converged f32 but not certified — inspect")),
    }), flush=True)


if __name__ == "__main__":
    main()
