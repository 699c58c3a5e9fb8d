"""Kernel-routed K-fold CV at TPU scale (round 5, VERDICT r4 Next #2).

Round 4's cv.py stopped at the repo's design rule: per-fold masked COPIES
of A and an XLA validation matmul — minutes-scale relay compiles at the
4 GB headline.  Round 5 routes the fold masks through the batch kernels'
resident residual rows instead, so this measures the first CV that is
runnable at headline size through the relay:

  * ONE A_t hoist serves all k folds + the full-data refit;
  * every fold path is a masked batched-grid solve (bcd_batch kernels);
  * validation scoring is one batched A-stream pass per fold;
  * ZERO full-size XLA programs anywhere => compiles in ~a minute
    (the L-unrolled batch sweep's measured 53.7 s Mosaic compile
    dominates), not minutes-per-program.

Prints one JSON row for BASELINE.md.

Run: python scripts/measure_cv_headline.py       (needs the relay)
Env: CV_M / CV_N (default 10000 x 100000), CV_K (5), CV_PATH (8).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setswitchinterval(0.001)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_co_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

M = int(os.environ.get("CV_M", 10_000))
N = int(os.environ.get("CV_N", 100_000))
K = int(os.environ.get("CV_K", 5))
PATH = int(os.environ.get("CV_PATH", 8))

_T0 = time.perf_counter()


def tick(msg):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    from convex_optimization_tpu.core.datagen import make_lasso_instance_host
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.cv import cv_lambda_path
    from convex_optimization_tpu.utils.relay import warm_relay_async

    # absorb the relay's per-process first-exec tax (40-500 s, probe-
    # measured) concurrently with the minutes of datagen + upload below
    warm_relay_async()

    inst, _, _ = make_lasso_instance_host(7, M, N)
    problem = inst.problem
    tick("datagen + upload done")

    cfg = SolverConfig(tol=1e-5, max_iters=20_000, gap_every=10,
                       stall_checks=15)
    t0 = time.perf_counter()
    # free_A: drop the 4 GB device A once A_t is hoisted — the first
    # attempt crashed the TPU worker with A + A_t + state resident
    # (~8 GB of the chip's ~8.5-11 GB practical admission)
    res = cv_lambda_path(problem, cfg, k=K, path_len=PATH,
                         method="bcd_batch", free_A=True)
    _ = float(jnp.sum(res.mean_mse))       # value fetch = barrier
    wall = time.perf_counter() - t0
    tick(f"CV k={K} path={PATH}: wall={wall:.1f}s "
         f"method_used={res.method_used} best_lambda={res.best_lambda:.4g} "
         f"one_se={res.one_se_lambda:.4g}")

    out = {
        "metric": f"cv_kernel_routed_k{K}_path{PATH}_lasso_{M}x{N}",
        "value": round(wall, 2), "unit": "s",
        "method_used": res.method_used,
        "best_lambda": res.best_lambda,
        "one_se_lambda": res.one_se_lambda,
        "mean_mse": [float(v) for v in res.mean_mse],
        "nnz_best": int(jnp.sum(res.x != 0)),
        "notes": (f"{K} fold paths x {PATH} points + full refit, one "
                  f"resident A, zero full-size XLA programs"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
