"""2-D ('rows' x 'blocks') sharded FISTA == local solve (SURVEY.md 2.2:
DP x TP composition; both per-iteration collectives are local-sized)."""

import jax
import numpy as np
import pytest

from convex_optimization_tpu import solve
from convex_optimization_tpu.core.datagen import make_lasso_instance
from convex_optimization_tpu.parallel.grid_sharded import make_grid_mesh

KEY = jax.random.PRNGKey(44)


@pytest.fixture(scope="module")
def grid24():
    assert len(jax.devices()) >= 8
    return make_grid_mesh(2, 4)


@pytest.mark.parametrize("kind,lam2,ngroups", [
    ("l1", 0.0, 0),
    ("nonneg_l1", 1e-2, 0),
    ("group_l2", 0.0, 32),
])
def test_grid_sharded_equals_local(grid24, kind, lam2, ngroups):
    inst = make_lasso_instance(KEY, 128, 256, penalty_kind=kind, lam2=lam2,
                               ngroups=ngroups)
    ref = solve(inst.problem, "fista", tol=1e-5, max_iters=2000)
    shr = solve(inst.problem, "fista", mesh=grid24, tol=1e-5, max_iters=2000)
    assert shr.converged
    assert shr.method == "grid_sharded_fista"
    np.testing.assert_allclose(np.asarray(shr.x), np.asarray(ref.x),
                               atol=5e-5)


def test_grid_sharded_screening(grid24):
    inst = make_lasso_instance(jax.random.PRNGKey(45), 128, 512)
    ref = solve(inst.problem, "fista", tol=1e-5, max_iters=2000)
    shr = solve(inst.problem, "fista", mesh=grid24, tol=1e-5, max_iters=2000,
                screen_every=1)
    assert shr.converged
    np.testing.assert_allclose(np.asarray(shr.x), np.asarray(ref.x),
                               atol=5e-5)


def test_grid_rejects_indivisible(grid24):
    inst = make_lasso_instance(jax.random.PRNGKey(46), 101, 256)  # m%2!=0
    with pytest.raises(ValueError, match="divide"):
        solve(inst.problem, "fista", mesh=grid24)


@pytest.mark.parametrize("kind,ngroups", [("l1", 0), ("group_l2", 16)])
def test_grid_sharded_bcd_matches_unsharded(grid24, kind, ngroups):
    """Grid-sharded BCD (round 3: GS within a chip's slab + Jacobi merged
    across column shards, per-block ROWS psums) reaches the same solution
    as the single-device solver."""
    inst = make_lasso_instance(jax.random.PRNGKey(43), 64, 256,
                               penalty_kind=kind, ngroups=ngroups)
    ref = solve(inst.problem, "fista", tol=1e-5, max_iters=2000)
    shr = solve(inst.problem, "bcd", mesh=grid24, tol=1e-5, max_iters=600,
                gap_every=5, block_size=32, stall_checks=10)
    assert shr.method == "grid_sharded_bcd"
    assert shr.converged, shr.rel_gap
    # two INDEPENDENT tol=1e-5 solves agree within the gap-implied ball
    # (group solutions carry ~1e-3 coordinate slack at this gap)
    np.testing.assert_allclose(np.asarray(shr.x), np.asarray(ref.x),
                               atol=5e-4 if kind == "l1" else 3e-3)
