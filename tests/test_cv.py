"""K-fold CV driver (solvers/cv.py): fold-mask correctness, equivalence of
the masked-row training problem with the true row-subset problem, and a
closed-loop model-selection check on a planted instance."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_optimization_tpu import solve
from convex_optimization_tpu.core.datagen import make_lasso_instance
from convex_optimization_tpu.solvers.common import SolverConfig
from convex_optimization_tpu.solvers.cv import (
    CVResult,
    cv_lambda_path,
    kfold_train_masks,
)

KEY = jax.random.PRNGKey(33)


def test_kfold_masks_partition_and_determinism():
    m, k = 103, 5
    masks = kfold_train_masks(m, k, seed=7)
    assert masks.shape == (k, m) and masks.dtype == np.float32
    # every row is a validation row in EXACTLY one fold
    val_counts = (masks == 0.0).sum(axis=0)
    np.testing.assert_array_equal(val_counts, np.ones(m))
    # balanced to within 1
    sizes = (masks == 0.0).sum(axis=1)
    assert sizes.max() - sizes.min() <= 1
    np.testing.assert_array_equal(masks, kfold_train_masks(m, k, seed=7))
    assert not np.array_equal(masks, kfold_train_masks(m, k, seed=8))
    with pytest.raises(ValueError):
        kfold_train_masks(10, 1)


def test_masked_fold_equals_row_subset_problem():
    """Zeroing validation rows is EXACTLY the lasso on the training subset:
    same solution to solver tolerance."""
    inst = make_lasso_instance(KEY, 60, 200)
    p = inst.problem
    mask = kfold_train_masks(p.m, 3, seed=0)[0]
    tm = jnp.asarray(mask)
    p_masked = dataclasses.replace(p, A=p.A * tm[:, None], b=p.b * tm)
    rows = np.nonzero(mask)[0]
    p_subset = dataclasses.replace(p, A=p.A[jnp.asarray(rows)],
                                   b=p.b[jnp.asarray(rows)])
    r1 = solve(p_masked, "fista", tol=1e-7, max_iters=8000)
    r2 = solve(p_subset, "fista", tol=1e-7, max_iters=8000)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               atol=5e-5)


def test_cv_selects_a_recovering_lambda():
    inst = make_lasso_instance(KEY, 120, 400, noise_std=0.02)
    cfg = SolverConfig(tol=1e-5, max_iters=4000)
    res = cv_lambda_path(inst.problem, cfg, k=4, path_len=8, seed=1)
    assert isinstance(res, CVResult)
    k, L = res.val_mse.shape
    assert (k, L) == (4, 8)
    assert np.all(np.isfinite(np.asarray(res.mean_mse)))
    # lambdas descend; the 1-SE choice is the sparser (larger) lambda
    assert res.one_se_index <= res.best_index
    assert res.one_se_lambda >= res.best_lambda
    # the selected lambda must beat the near-lam_max end (x ~ 0 there)
    assert float(res.mean_mse[res.best_index]) < float(res.mean_mse[0])
    # refit at the chosen lambda recovers most of the planted support
    sup = np.asarray(inst.support)
    xb = np.asarray(res.x)
    recall = ((xb != 0) & sup).sum() / sup.sum()
    assert recall >= 0.8, recall
    # refits correspond to path points of the full problem
    assert res.x.shape == (inst.problem.n,)
    assert res.x_one_se.shape == (inst.problem.n,)


def test_cv_no_refit_and_explicit_grid():
    inst = make_lasso_instance(KEY, 64, 128)
    cfg = SolverConfig(tol=1e-4, max_iters=1500)
    grid = jnp.geomspace(0.5, 0.01, 5) * float(
        jnp.max(jnp.abs(inst.problem.A.T @ inst.problem.b)))
    res = cv_lambda_path(inst.problem, cfg, k=3, lambdas=grid, refit=False)
    assert res.x is None and res.x_one_se is None
    assert res.val_mse.shape == (3, 5)
    np.testing.assert_allclose(np.asarray(res.lambdas), np.asarray(grid))
