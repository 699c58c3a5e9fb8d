"""Row-sharded (DP-analog) solver: row-sharded == column-sharded == local
(SURVEY.md section 2.2 DP row; the equivalence is the collective-bug canary)."""

import jax
import numpy as np
import pytest

from convex_optimization_tpu import solve
from convex_optimization_tpu.core.datagen import make_lasso_instance
from convex_optimization_tpu.parallel.mesh import make_mesh, ROWS

KEY = jax.random.PRNGKey(33)


@pytest.fixture(scope="module")
def rmesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8, axis=ROWS)


@pytest.mark.parametrize("kind,lam2,ngroups", [
    ("l1", 0.0, 0),
    ("nonneg_l1", 1e-2, 0),
    ("group_l2", 0.0, 32),
])
def test_row_sharded_equals_local(rmesh8, kind, lam2, ngroups):
    inst = make_lasso_instance(KEY, 128, 256, penalty_kind=kind, lam2=lam2,
                               ngroups=ngroups)
    ref = solve(inst.problem, "fista", tol=1e-5, max_iters=2000)
    shr = solve(inst.problem, "fista", mesh=rmesh8, tol=1e-5, max_iters=2000)
    assert shr.converged
    assert shr.method == "row_sharded_fista"
    np.testing.assert_allclose(np.asarray(shr.x), np.asarray(ref.x),
                               atol=5e-5)


def test_row_sharded_tall_problem(rmesh8):
    """The DP regime the row layout is for: m >> n."""
    inst = make_lasso_instance(jax.random.PRNGKey(4), 1024, 64)
    res = solve(inst.problem, "fista", mesh=rmesh8, tol=1e-6, max_iters=3000)
    assert res.converged


def test_row_sharded_rejects_indivisible_m(rmesh8):
    inst = make_lasso_instance(jax.random.PRNGKey(5), 100, 64)  # 100 % 8 != 0
    with pytest.raises(ValueError, match="divide"):
        solve(inst.problem, "fista", mesh=rmesh8)


def test_row_sharded_screening(rmesh8):
    inst = make_lasso_instance(jax.random.PRNGKey(6), 128, 512)
    ref = solve(inst.problem, "fista", tol=1e-5, max_iters=2000)
    shr = solve(inst.problem, "fista", mesh=rmesh8, tol=1e-5, max_iters=2000,
                screen_every=1)
    assert shr.converged
    np.testing.assert_allclose(np.asarray(shr.x), np.asarray(ref.x),
                               atol=5e-5)


@pytest.mark.parametrize("kind,ngroups", [("l1", 0), ("nonneg_l1", 0),
                                          ("group_l2", 16)])
def test_row_sharded_bcd_matches_unsharded(rmesh8, kind, ngroups):
    """Row-sharded BCD (round 3: true Gauss-Seidel, per-block psum) must
    match the single-device BCD — same sweep arithmetic, so tight
    tolerance."""
    inst = make_lasso_instance(jax.random.PRNGKey(41), 128, 256,
                               penalty_kind=kind, ngroups=ngroups)
    ref = solve(inst.problem, "bcd", tol=1e-5, max_iters=600, gap_every=5,
                block_size=32)
    shr = solve(inst.problem, "bcd", mesh=rmesh8, tol=1e-5, max_iters=600,
                gap_every=5, block_size=32)
    assert shr.method == "row_sharded_bcd"
    assert shr.converged == ref.converged
    np.testing.assert_allclose(np.asarray(shr.x), np.asarray(ref.x),
                               atol=1e-4)


def test_row_sharded_lambda_path(rmesh8):
    """Warm-started lambda path on the ROWS mesh (round 3: previously a
    latent crash — the CLI allows --mesh-axis rows with --lambda-path):
    matches the single-device path for both solvers."""
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.lambda_path import lambda_path

    inst = make_lasso_instance(jax.random.PRNGKey(23), 96, 128)
    cfg = SolverConfig(tol=1e-5, max_iters=2000, gap_every=10,
                       block_size=16, stall_checks=10)
    plain = lambda_path(inst.problem, cfg, path_len=4)
    shard = lambda_path(inst.problem, cfg, path_len=4, mesh=rmesh8)
    np.testing.assert_allclose(np.asarray(shard.xs), np.asarray(plain.xs),
                               atol=2e-4)
    bcd = lambda_path(inst.problem, cfg, path_len=4, mesh=rmesh8,
                      method="bcd")
    # independently certified solves agree within the gap-implied ball
    np.testing.assert_allclose(np.asarray(bcd.xs), np.asarray(plain.xs),
                               atol=3e-3)
