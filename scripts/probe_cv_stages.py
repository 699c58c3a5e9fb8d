"""Stage-decomposed CV-at-headline probe: pin WHICH program crashes the
TPU worker.

measure_cv_headline crashed the worker twice (with and without free_A).
Nothing in cv_lambda_path value-fetches until the final argmin, so the
entire 5-fold pipeline is async-dispatched and the UNAVAILABLE error
surfaces far from the faulting program.  This runs the exact same stages
with a value fetch + tick after EACH:

  1. hoist A_t (prepare_batched_solver, masked=True), free device A
  2. lambda_max_t (streamed witness kernel at full n)
  3. UNMASKED batched_lambda_path at the full grid  <- never chip-run at
     10k x 100k before (bake-off was 5k x 50k)
  4. masked fold-0 batched path
  5. _val_mse_kernel at full n
  6. remaining folds + scores

Run: python scripts/probe_cv_stages.py        (needs the relay)
Env: CVS_M / CVS_N (default 10000 x 100000), CVS_K (5), CVS_PATH (8).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setswitchinterval(0.001)

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_co_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

M = int(os.environ.get("CVS_M", 10_000))
N = int(os.environ.get("CVS_N", 100_000))
K = int(os.environ.get("CVS_K", 5))
PATH = int(os.environ.get("CVS_PATH", 8))
MAXIT = int(os.environ.get("CVS_MAXIT", 20_000))   # duration bisector

_T0 = time.perf_counter()


def tick(msg):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    from convex_optimization_tpu.core.datagen import make_lasso_instance_host
    from convex_optimization_tpu.core.objective import lambda_max_t
    from convex_optimization_tpu.solvers.batched_path import (
        batched_lambda_path,
        prepare_batched_solver,
    )
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.cv import (
        _val_mse_kernel,
        fold_lambda_scale,
        kfold_train_masks,
    )
    from convex_optimization_tpu.utils.relay import warm_relay_async

    warm_relay_async()
    inst, _, _ = make_lasso_instance_host(7, M, N)
    problem = inst.problem
    tick("datagen + upload done")

    cfg = SolverConfig(tol=1e-5, max_iters=MAXIT, gap_every=10,
                       stall_checks=15)

    prep = prepare_batched_solver(problem, cfg, masked=True, chunk=PATH)
    assert prep.reason is None, prep.reason
    _ = float(prep.A_t[0, 0, 0])
    tick("stage 1: A_t hoist done (fetched)")
    problem.A.delete()
    tick("stage 1b: device A freed")

    lmax = lambda_max_t(prep.A_t, problem.b, problem.penalty,
                        interpret=prep.interpret)
    lmax_f = float(lmax)
    tick(f"stage 2: lambda_max_t = {lmax_f:.4g} (fetched)")
    lambdas = jnp.geomspace(0.95 * lmax_f, 0.01 * lmax_f,
                            PATH).astype(problem.dtype)

    pr_full = batched_lambda_path(problem, cfg, lambdas=lambdas,
                                  prepared=prep)
    _ = float(jnp.sum(pr_full.xs[-1]))
    tick(f"stage 3: UNMASKED batched path ran (method={pr_full.method_used},"
         f" nnz last={int(jnp.sum(pr_full.xs[-1] != 0))})")

    masks = kfold_train_masks(M, K, 0)
    nb, B = prep.n_blocks, prep.B
    scores = []
    for f in range(K):
        tm = jnp.asarray(masks[f])
        s = fold_lambda_scale(masks[f])
        pr = batched_lambda_path(problem, cfg, lambdas=lambdas * s,
                                 row_mask=tm, prepared=prep)
        _ = float(jnp.sum(pr.xs[-1]))
        tick(f"stage 4.{f}: masked fold-{f} path ran")
        Xc = pr.xs.reshape(-1, nb, B).transpose(1, 0, 2)
        v = _val_mse_kernel(prep.A_t, Xc, problem.b, 1.0 - tm,
                            interpret=prep.interpret)
        v_np = np.asarray(jax.device_get(v))
        tick(f"stage 5.{f}: val MSE fetched: {np.round(v_np, 5).tolist()}")
        scores.append(v_np)

    mean = np.mean(np.stack(scores), axis=0)
    print(json.dumps({"row": "cv_stages_probe", "ok": True,
                      "lmax": lmax_f,
                      "mean_mse": [float(x) for x in mean],
                      "best_lambda": float(lambdas[int(np.argmin(mean))])}),
          flush=True)


if __name__ == "__main__":
    main()
