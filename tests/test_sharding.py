"""Distributed tests on the 8-device CPU mesh (SURVEY.md 4.2): the sharded
solve must match the unsharded solve bit-for-tolerance — this equivalence is
the data-race analog for collective bugs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_optimization_tpu import solve
from convex_optimization_tpu.core.datagen import make_lasso_instance
from convex_optimization_tpu.parallel.mesh import make_mesh

KEY = jax.random.PRNGKey(21)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


@pytest.mark.parametrize("kind,lam2,ngroups", [
    ("l1", 0.0, 0),
    ("l1", 1e-2, 0),
    ("nonneg_l1", 0.0, 0),
    ("group_l2", 0.0, 32),
])
def test_sharded_fista_equals_unsharded(mesh8, kind, lam2, ngroups):
    inst = make_lasso_instance(KEY, 64, 256, penalty_kind=kind, lam2=lam2,
                               ngroups=ngroups)
    p = inst.problem
    ref = solve(p, "fista", tol=1e-5, max_iters=2000)
    shr = solve(p, "fista", mesh=mesh8, tol=1e-5, max_iters=2000)
    assert shr.converged
    assert shr.method == "sharded_fista"
    np.testing.assert_allclose(np.asarray(shr.x), np.asarray(ref.x),
                               atol=5e-5)
    # gap histories agree at matching checkpoints
    k = min(len(ref.history["gap"]), len(shr.history["gap"]))
    np.testing.assert_allclose(shr.history["primal"][:k],
                               ref.history["primal"][:k], rtol=1e-4)


def test_sharded_bcd_converges_and_matches(mesh8):
    inst = make_lasso_instance(jax.random.PRNGKey(5), 128, 512)
    p = inst.problem
    ref = solve(p, "fista", tol=1e-6, max_iters=4000)
    shr = solve(p, "bcd", mesh=mesh8, tol=1e-6, max_iters=2000,
                block_size=16, step_scale=1.0)
    assert shr.converged, f"rel_gap={shr.rel_gap}"
    np.testing.assert_allclose(np.asarray(shr.x), np.asarray(ref.x),
                               atol=5e-4)


def test_sharded_bcd_no_linesearch_deadlock(mesh8):
    # regression: highly coherent columns (n >> m) used to deadlock the
    # aggregated-direction line search at gamma=0 with the gap still ~1e-3
    inst = make_lasso_instance(jax.random.PRNGKey(5), 64, 256)
    shr = solve(inst.problem, "bcd", mesh=mesh8, tol=5e-6, max_iters=4000,
                block_size=16)
    assert shr.converged, f"rel_gap={shr.rel_gap}"


def test_sharded_respects_mesh_of_2(mesh8):
    # mesh-generic: also runs on a 2-device mesh
    inst = make_lasso_instance(jax.random.PRNGKey(6), 48, 128)
    mesh2 = make_mesh(2)
    res = solve(inst.problem, "fista", mesh=mesh2, tol=1e-5, max_iters=2000)
    assert res.converged


def test_sharded_rejects_indivisible_n(mesh8):
    inst = make_lasso_instance(jax.random.PRNGKey(7), 32, 100)  # 100 % 8 != 0
    with pytest.raises(ValueError, match="divide"):
        solve(inst.problem, "fista", mesh=mesh8)


def test_sharded_lambda_path(mesh8):
    """Warm-started path on the column-sharded solver: one compiled program
    for all path points; matches the single-device path."""
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.lambda_path import lambda_path

    inst = make_lasso_instance(jax.random.PRNGKey(19), 96, 256)
    cfg = SolverConfig(tol=1e-5, max_iters=3000, gap_every=10)
    plain = lambda_path(inst.problem, cfg, path_len=5)
    shard = lambda_path(inst.problem, cfg, path_len=5, mesh=mesh8)
    np.testing.assert_allclose(np.asarray(shard.xs), np.asarray(plain.xs),
                               atol=1e-4)


def test_sharded_lambda_path_bcd(mesh8):
    """The sharded BCD lambda path (round 3: closes the FISTA-only
    asymmetry) reaches the same solutions as the sharded FISTA path."""
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.lambda_path import lambda_path

    inst = make_lasso_instance(jax.random.PRNGKey(19), 96, 256)
    cfg = SolverConfig(tol=1e-5, max_iters=3000, gap_every=10,
                       block_size=16, stall_checks=10)
    ref = lambda_path(inst.problem, cfg, path_len=5, mesh=mesh8)
    bcd = lambda_path(inst.problem, cfg, path_len=5, mesh=mesh8,
                      method="bcd")
    np.testing.assert_allclose(np.asarray(bcd.xs), np.asarray(ref.xs),
                               atol=2e-4)


def test_lam1_slot_guard_fails_loudly_on_reorder(mesh8):
    """VERDICT r3 task 8: the sharded λ-path swaps lam1 by position; a
    builder that moves lam1 must fail at build time, not silently solve
    every path point at the wrong lambda."""
    import dataclasses

    from convex_optimization_tpu.parallel.mesh import (LAM1_ARG_INDEX,
                                                       check_lam1_slot)
    from convex_optimization_tpu.parallel.sharded import sharded_fista
    from convex_optimization_tpu.ops.power_iter import spectral_norm_sq
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.fista import init_state

    inst = make_lasso_instance(KEY, 64, 256)
    p = inst.problem
    pen = p.penalty
    # a reordered tuple (lam1 displaced) trips the guard
    bad = (p.A, pen.lam1, p.b)
    with pytest.raises(AssertionError, match="reordered"):
        check_lam1_slot(bad, pen)
    # an equal-but-distinct float at the slot trips it too (identity check)
    bad2 = (p.A, p.b, float(pen.lam1) + 0.0)
    if bad2[LAM1_ARG_INDEX] is not pen.lam1:
        with pytest.raises(AssertionError, match="reordered"):
            check_lam1_slot(bad2, pen)
    # the real builder passes its own guard and lands lam1 at the index
    cfg = SolverConfig(tol=1e-4, max_iters=50)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from convex_optimization_tpu.parallel.mesh import BLOCKS
    from convex_optimization_tpu.parallel.sharded import _state_specs

    A = jax.device_put(p.A, NamedSharding(mesh8, P(None, BLOCKS)))
    b = jax.device_put(p.b, NamedSharding(mesh8, P()))
    ps = dataclasses.replace(p, A=A, b=b)
    state = init_state(ps, None, cfg)
    state = jax.device_put(
        state,
        jax.tree.map(lambda sp: NamedSharding(mesh8, sp), _state_specs(),
                     is_leaf=lambda v: isinstance(v, P)))
    L = spectral_norm_sq(ps.A) + ps.lam2
    _, args = sharded_fista(ps, L, state, cfg, mesh8)
    assert args[LAM1_ARG_INDEX] is ps.penalty.lam1
