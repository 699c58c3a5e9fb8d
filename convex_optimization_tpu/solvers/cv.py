"""K-fold cross-validation over the warm-started lambda path — the model-
selection driver that completes the λ-path story (SURVEY.md C10/§3.5: the
reference family's standard workflow is "solve a λ grid, pick λ by
held-out error"; the reference itself stops at the grid, so this is a
capability extension, not a parity item).

TPU-first design:
  * folds are ROW MASKS, not gathers: the fold-f training problem is the
    original problem with validation rows zeroed (A_f = mask ⊙ A,
    b_f = mask ⊙ b) — zero rows contribute nothing to the smooth term, so
    this is EXACTLY the lasso on the training subset, with every shape
    unchanged.  Static shapes mean one compiled solver program serves all
    k folds and all path points (fold data and lam1 are both data);
  * the λ grid is computed ONCE from the full data (glmnet convention) so
    per-fold validation curves align point-for-point;
  * validation error is one batched matmul per fold over the stacked path
    solutions ((L, n) @ (n, m)) — MXU-friendly, no per-λ host loop.

Caveat for relay-backed TPU runs at very large sizes: the validation
matmul and the masked-copy construction are full-size XLA dots/elementwise
programs (minutes-scale relay compiles at the 4 GB headline size — see
CLAUDE.md).  CV is a model-selection tool; run it at the sizes where you
select models, or pass method='bcd_ws' to keep the solve phase
kernel-routed.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from convex_optimization_tpu.core.problem import Problem
from convex_optimization_tpu.core.objective import lambda_max
from convex_optimization_tpu.solvers.common import SolverConfig
from convex_optimization_tpu.solvers.lambda_path import lambda_path


class CVResult(NamedTuple):
    lambdas: jax.Array        # (L,) shared grid (from the FULL data)
    val_mse: jax.Array        # (k, L) per-fold held-out mean squared error
    mean_mse: jax.Array       # (L,) mean across folds
    se_mse: jax.Array         # (L,) standard error across folds
    best_index: int           # argmin of mean_mse
    best_lambda: float
    one_se_index: int         # largest λ within 1 SE of the minimum
    one_se_lambda: float      # (the sparser "1-SE rule" choice)
    x: jax.Array | None       # full-data refit at best_lambda (refit=True)
    x_one_se: jax.Array | None  # full-data refit at one_se_lambda


def kfold_train_masks(m: int, k: int, seed: int = 0) -> np.ndarray:
    """(k, m) float32 train masks: mask[f, i] == 0 iff row i is fold f's
    validation row.  Every row is a validation row in exactly one fold
    (sizes differ by at most 1 when k does not divide m); the permutation
    is deterministic in ``seed``."""
    if not 2 <= k <= m:
        raise ValueError(f"need 2 <= k <= m, got k={k}, m={m}")
    perm = np.random.default_rng(seed).permutation(m)
    masks = np.ones((k, m), np.float32)
    for f in range(k):
        masks[f, perm[f::k]] = 0.0
    return masks


def cv_lambda_path(
    problem: Problem,
    cfg: SolverConfig,
    *,
    k: int = 5,
    path_len: int = 10,
    lam_min_frac: float = 0.01,
    lambdas: jax.Array | None = None,
    seed: int = 0,
    method: str = "fista",
    refit: bool = True,
) -> CVResult:
    """K-fold CV over a warm-started λ path; picks λ by held-out MSE.

    Returns both the MSE-minimizing λ and the "1-SE rule" λ (the largest
    λ whose mean MSE is within one standard error of the minimum — the
    standard sparser choice).  ``refit=True`` re-solves the FULL problem
    at each chosen λ (warm-started from λ_max side as usual)."""
    m = problem.m
    if lambdas is None:
        lmax = lambda_max(problem.A, problem.b, problem.penalty)
        lambdas = jnp.geomspace(0.95 * lmax, lam_min_frac * lmax, path_len)
    # problem dtype: an f64 grid (x64-enabled hosts) would promote the
    # solver carry and break the while_loop's fixed carry type
    lambdas = jnp.asarray(lambdas, problem.dtype)

    masks = kfold_train_masks(m, k, seed)

    # one jitted validation scorer reused across folds (shapes static):
    # R = Xs @ A^T - b broadcast, masked to the held-out rows
    @jax.jit
    def _val_mse(xs, A, b, val_mask):
        r = xs @ A.T - b[None, :]              # (L, m)
        w = val_mask[None, :]
        return jnp.sum(w * r * r, axis=1) / jnp.sum(val_mask)

    val_rows = []
    for f in range(k):
        tm = jnp.asarray(masks[f])
        p_f = dataclasses.replace(problem, A=problem.A * tm[:, None],
                                  b=problem.b * tm)
        pr = lambda_path(p_f, cfg, lambdas=lambdas, method=method)
        val_rows.append(_val_mse(pr.xs, problem.A, problem.b, 1.0 - tm))
    val_mse = jnp.stack(val_rows)              # (k, L)
    mean_mse = jnp.mean(val_mse, axis=0)
    # standard error of the fold mean
    se_mse = jnp.std(val_mse, axis=0, ddof=1) / np.sqrt(k)

    best = int(jnp.argmin(mean_mse))
    thresh = mean_mse[best] + se_mse[best]
    # λs are descending: the first index within threshold is the LARGEST λ
    within = np.asarray(jax.device_get(mean_mse <= thresh))
    one_se = int(np.argmax(within))

    x = x1 = None
    if refit:
        # full-data path down to the chosen λ reuses warm starts; a path
        # is cheaper than two cold solves and both chosen λs lie on it
        pr_full = lambda_path(problem, cfg, lambdas=lambdas, method=method)
        x = pr_full.xs[best]
        x1 = pr_full.xs[one_se]

    return CVResult(
        lambdas=lambdas, val_mse=val_mse, mean_mse=mean_mse, se_mse=se_mse,
        best_index=best, best_lambda=float(lambdas[best]),
        one_se_index=one_se, one_se_lambda=float(lambdas[one_se]),
        x=x, x_one_se=x1,
    )
