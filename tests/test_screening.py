"""Gap-safe screening safety properties (SURVEY.md section 4.2: 'screening
never discards a coordinate that the no-screening run puts in the support')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_optimization_tpu.api import solve
from convex_optimization_tpu.core.datagen import make_lasso_instance
from convex_optimization_tpu.solvers.screening import (
    gap_safe_keep_mask,
    compact_problem,
)


@pytest.mark.parametrize("kind,ngroups,lam2", [
    ("l1", 0, 0.0),
    ("nonneg_l1", 0, 1e-2),
    ("group_l2", 16, 0.0),
])
def test_screen_is_safe_along_the_solve(kind, ngroups, lam2):
    """Masks taken at coarse, mid, and tight iterates must all KEEP every
    coordinate of the converged no-screening support."""
    inst = make_lasso_instance(jax.random.PRNGKey(51), 96, 384,
                               penalty_kind=kind, ngroups=ngroups, lam2=lam2)
    ref = solve(inst.problem, "fista", tol=1e-6, max_iters=5000)
    support = np.asarray(ref.x != 0)
    for iters in (10, 50, 300):
        part = solve(inst.problem, "fista", tol=1e-12, max_iters=iters,
                     gap_every=10)
        keep = np.asarray(gap_safe_keep_mask(inst.problem, part.x))
        assert not np.any(support & ~keep), (
            f"screen at iter {iters} discarded a support coordinate")


@pytest.mark.parametrize("kind,ngroups", [("l1", 0), ("nonneg_l1", 0),
                                          ("group_l2", 16)])
def test_screened_solve_equals_unscreened(kind, ngroups):
    inst = make_lasso_instance(jax.random.PRNGKey(52), 96, 384,
                               penalty_kind=kind, ngroups=ngroups)
    ref = solve(inst.problem, "fista", tol=1e-5, max_iters=5000)
    scr = solve(inst.problem, "fista", tol=1e-5, max_iters=5000,
                screen_every=1)
    np.testing.assert_allclose(np.asarray(scr.x), np.asarray(ref.x),
                               atol=5e-5)
    assert scr.converged


def test_compact_problem_preserves_solution():
    """compact_problem (host-side lambda-path compaction) must keep the
    solution: solve the compacted problem and scatter back."""
    inst = make_lasso_instance(jax.random.PRNGKey(53), 96, 384)
    ref = solve(inst.problem, "fista", tol=1e-6, max_iters=5000)
    # screen at a decent iterate
    mid = solve(inst.problem, "fista", tol=1e-4, max_iters=3000)
    keep = gap_safe_keep_mask(inst.problem, mid.x)
    small, idx = compact_problem(inst.problem, keep)
    res_s = solve(small, "fista", tol=1e-6, max_iters=5000)
    x_full = np.zeros(inst.problem.n, np.float32)
    x_full[np.asarray(idx)] = np.asarray(res_s.x)
    np.testing.assert_allclose(x_full, np.asarray(ref.x), atol=5e-5)


def test_gap_never_negative_along_history():
    inst = make_lasso_instance(jax.random.PRNGKey(54), 96, 384)
    res = solve(inst.problem, "fista", tol=1e-6, max_iters=5000)
    # f32 certificate noise floor allows a tiny negative excursion only
    assert np.all(res.history["gap"] >= -1e-5 * abs(res.primal))


def test_zero_solution_at_lambda_max():
    from convex_optimization_tpu.core.objective import lambda_max

    inst = make_lasso_instance(jax.random.PRNGKey(55), 64, 256)
    lmax = float(lambda_max(inst.problem.A, inst.problem.b,
                            inst.problem.penalty))
    p = inst.problem.with_lam1(1.01 * lmax)
    res = solve(p, "fista", tol=1e-6, max_iters=500)
    assert res.nnz == 0
