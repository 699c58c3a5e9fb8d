"""Solver-level tests: FISTA/ISTA reach 1e-6 relative duality gap on
config-1-shaped instances and match the float64 numpy oracle; ISTA is
monotone; support recovery vs the planted support (SURVEY.md section 4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_optimization_tpu import solve
from convex_optimization_tpu.core.datagen import make_lasso_instance
from tests.oracle import solve_np

KEY = jax.random.PRNGKey(3)


@pytest.fixture(scope="module")
def inst():
    # config-1 twin, CI-sized; float64 so the 1e-6-grade certificate is
    # resolvable (the f32 certificate noise floor is ~1e-6, SURVEY.md 7.4)
    return make_lasso_instance(KEY, 150, 600, support_frac=0.03,
                               noise_std=0.01, dtype=jnp.float64)


def test_fista_float32_smoke():
    # production dtype path: f32 solve certifies 1e-5 comfortably
    inst32 = make_lasso_instance(KEY, 100, 400, dtype=jnp.float32)
    res = solve(inst32.problem, "fista", tol=1e-5, max_iters=5000)
    assert res.x.dtype == jnp.float32
    assert res.converged, f"rel_gap={res.rel_gap}"


def test_fista_reaches_tolerance(inst):
    res = solve(inst.problem, "fista", tol=1e-6, max_iters=5000)
    assert res.converged, f"rel_gap={res.rel_gap}"
    assert res.rel_gap <= 1e-6


def test_fista_matches_numpy_oracle(inst):
    p = inst.problem
    res = solve(p, "fista", tol=1e-9, max_iters=20000)
    x_np = solve_np(np.asarray(p.A), np.asarray(p.b),
                    float(p.penalty.lam1), tol=1e-11)
    np.testing.assert_allclose(np.asarray(res.x), x_np, atol=2e-4)


def test_fista_support_recovery(inst):
    res = solve(inst.problem, "fista", tol=1e-8, max_iters=10000)
    est = np.asarray(res.x != 0)
    true = np.asarray(inst.support)
    # every planted coordinate recovered (lam small, low noise)
    assert (est & true).sum() >= 0.9 * true.sum()


def test_ista_monotone_objective(inst):
    res = solve(inst.problem, "ista", tol=1e-6, max_iters=3000, gap_every=5)
    primal = res.history["primal"]
    assert len(primal) > 3
    assert np.all(np.diff(primal) <= 1e-5 * np.abs(primal[:-1]) + 1e-7)


def test_gap_history_never_negative(inst):
    res = solve(inst.problem, "fista", tol=1e-6, max_iters=5000)
    assert np.all(res.history["gap"] >= -1e-6)


@pytest.mark.parametrize("kind,lam2,ngroups", [
    ("nonneg_l1", 0.0, 0),
    ("l1", 1e-2, 0),          # elastic net
    ("group_l2", 0.0, 50),
])
def test_fista_variants_vs_oracle(kind, lam2, ngroups):
    inst = make_lasso_instance(jax.random.PRNGKey(9), 80, 200,
                               penalty_kind=kind, ngroups=ngroups, lam2=lam2,
                               dtype=jnp.float64)
    p = inst.problem
    res = solve(p, "fista", tol=1e-9, max_iters=30000)
    assert res.rel_gap <= 1e-9
    x_np = solve_np(np.asarray(p.A), np.asarray(p.b), float(p.penalty.lam1),
                    lam2, kind, ngroups, tol=1e-11)
    np.testing.assert_allclose(np.asarray(res.x), x_np, atol=3e-4)


def test_warm_start_faster(inst):
    cold = solve(inst.problem, "fista", tol=1e-8, max_iters=10000)
    warm = solve(inst.problem, "fista", x0=cold.x, tol=1e-8, max_iters=10000)
    assert warm.iterations <= max(cold.iterations // 4, 2)


def test_lambda_path_compact_matches_plain():
    """Per-lambda screening compaction (SURVEY.md 7.2 step 6) must not
    change the path solutions."""
    import numpy as np
    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.lambda_path import lambda_path

    inst = make_lasso_instance(jax.random.PRNGKey(17), 96, 384)
    cfg = SolverConfig(tol=1e-6, max_iters=4000, gap_every=10)
    plain = lambda_path(inst.problem, cfg, path_len=6)
    comp = lambda_path(inst.problem, cfg, path_len=6, compact=True)
    np.testing.assert_allclose(np.asarray(comp.xs), np.asarray(plain.xs),
                               atol=5e-5)
    assert comp.kept is not None
    # compaction really shrinks the problem at the sparse end
    assert int(comp.kept[0]) < inst.problem.n
    # f32 floor: path points reach the same grade as the plain path
    assert all(float(g) <= 1e-4 for g in np.asarray(comp.gaps))


def test_solve_certify_flag():
    """solve(certify=True) must return an f64-certified result even when
    the f32 solve stalls above tol."""
    import numpy as np
    from convex_optimization_tpu.api import solve
    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.core.objective import duality_gap
    import dataclasses, jax.numpy as jnp

    inst = make_lasso_instance(jax.random.PRNGKey(23), 96, 384)
    res = solve(inst.problem, "fista", tol=1e-9, max_iters=300,
                stall_checks=5, certify=True)
    assert res.converged and res.rel_gap <= 1e-9
    p64 = dataclasses.replace(inst.problem,
                              A=inst.problem.A.astype(jnp.float64),
                              b=inst.problem.b.astype(jnp.float64))
    info = duality_gap(p64, jnp.asarray(res.x))  # x stays f64
    assert float(info.rel_gap) <= 2e-9


@pytest.mark.parametrize("kind", ["l1", "nonneg_l1"])
def test_working_set_matches_full_solve(kind):
    """fista_ws (working-set outer loop) must reach the same solution and an
    honest FULL-width gap."""
    import numpy as np
    from convex_optimization_tpu.api import solve
    from convex_optimization_tpu.core.datagen import make_lasso_instance

    inst = make_lasso_instance(jax.random.PRNGKey(61), 128, 1024,
                               penalty_kind=kind)
    ref = solve(inst.problem, "fista", tol=1e-5, max_iters=5000)
    ws = solve(inst.problem, "fista_ws", tol=1e-5, max_iters=5000)
    assert ws.converged, ws.rel_gap
    # two independent tol=1e-5 solves: iterates agree within the
    # gap-implied ball, not to solver-noise level
    np.testing.assert_allclose(np.asarray(ws.x), np.asarray(ref.x),
                               atol=5e-4)


def test_working_set_certify():
    from convex_optimization_tpu.api import solve
    from convex_optimization_tpu.core.datagen import make_lasso_instance

    inst = make_lasso_instance(jax.random.PRNGKey(62), 96, 768)
    res = solve(inst.problem, "fista_ws", tol=1e-8, max_iters=3000,
                stall_checks=10, certify=True)
    assert res.converged and res.rel_gap <= 1e-8


def test_lambda_path_working_set_matches_fista_path():
    """The working-set lambda path (round 3: one kernel route + persistent
    bucket programs across points) must match the plain FISTA path
    point-for-point."""
    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.lambda_path import lambda_path

    inst = make_lasso_instance(jax.random.PRNGKey(27), 96, 384)
    cfg = SolverConfig(tol=1e-6, max_iters=4000, gap_every=5)
    ref = lambda_path(inst.problem, cfg, path_len=5)
    ws = lambda_path(inst.problem, cfg, path_len=5, method="fista_ws")
    assert ws.kept is not None
    for i in range(5):
        np.testing.assert_allclose(np.asarray(ws.xs[i]),
                                   np.asarray(ref.xs[i]), atol=5e-4)


@pytest.mark.parametrize("inner", ["fista", "bcd"])
def test_working_set_kernel_routed(inner):
    """The kernel-routed working-set path (round 3, VERDICT r2 #4): burn-in,
    screens, gathers, and compact solves all run through the interpret-mode
    Pallas kernels (force_kernels=True on CPU) and must reach the same
    solution as the plain full-width solve.  bucket < n forces real
    compaction, exercising the A_t row-gather and the NaN-placeholder
    compact Problem."""
    from convex_optimization_tpu.api import solve
    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.core.objective import duality_gap
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.working_set import solve_working_set

    inst = make_lasso_instance(jax.random.PRNGKey(63), 128, 1024)
    cfg = SolverConfig(tol=1e-5, max_iters=5000)
    x, info, meta = solve_working_set(inst.problem, cfg, bucket=128,
                                      inner=inner, force_kernels=True)
    assert meta["kernel_routed"], meta
    assert float(info.rel_gap) <= 1e-5, float(info.rel_gap)
    # the reported gap must be honest: recompute it independently full-width
    chk = duality_gap(inst.problem, x)
    assert float(chk.rel_gap) <= 1.5e-5, float(chk.rel_gap)
    ref = solve(inst.problem, "fista", tol=1e-5, max_iters=5000)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x), atol=5e-4)


def test_lambda_path_bcd_matches_fista():
    """The bcd/bcd_pallas warm-started path (one compiled GS program, VPU
    kernels where eligible) must match the FISTA path point-for-point."""
    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.lambda_path import lambda_path

    inst = make_lasso_instance(jax.random.PRNGKey(21), 96, 384)
    cfg = SolverConfig(tol=1e-6, max_iters=4000, gap_every=5, block_size=48)
    ref = lambda_path(inst.problem, cfg, path_len=5)
    # both paths floor at the f32 noise level at the smallest lambdas;
    # parity of the solutions is the real check
    floor = max(3.0 * float(jnp.max(ref.gaps)), 2e-6)
    for method in ("bcd", "bcd_pallas"):
        got = lambda_path(inst.problem, cfg, path_len=5, method=method)
        assert float(jnp.max(got.gaps)) <= floor
        # two eps-optimal points can differ ~sqrt(gap) on near-degenerate
        # coordinates; parity within that class is the check
        np.testing.assert_allclose(np.asarray(got.xs), np.asarray(ref.xs),
                                   atol=6e-3)


def test_lambda_path_compact_group():
    """Group-lasso compacting path (round 3: closes the r2
    NotImplementedError): whole-group gathers, group sphere screen, matches
    the non-compact group path point-for-point."""
    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.lambda_path import lambda_path

    inst = make_lasso_instance(jax.random.PRNGKey(33), 96, 384,
                               penalty_kind="group_l2", ngroups=48)
    cfg = SolverConfig(tol=1e-6, max_iters=4000, gap_every=5,
                       stall_checks=10)
    ref = lambda_path(inst.problem, cfg, path_len=5)
    comp = lambda_path(inst.problem, cfg, path_len=5, compact=True)
    assert comp.kept is not None
    gsize = 384 // 48
    for i in range(5):
        assert int(comp.kept[i]) % gsize == 0    # whole groups only
        np.testing.assert_allclose(np.asarray(comp.xs[i]),
                                   np.asarray(ref.xs[i]), atol=5e-4)
    # compaction must actually bite at the sparse end of the path
    assert int(comp.kept[0]) < 384


def test_working_set_group_lasso():
    """Group working set (round 3): whole-group screens/gathers, compacted
    penalty carries kept weights; matches the plain group solve.  Runs both
    the XLA fallback (default on CPU) and the forced-kernel route."""
    from convex_optimization_tpu.api import solve
    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.core.objective import duality_gap
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.working_set import solve_working_set

    inst = make_lasso_instance(jax.random.PRNGKey(67), 120, 960,
                               penalty_kind="group_l2", ngroups=120)
    ref = solve(inst.problem, "fista", tol=1e-5, max_iters=5000)
    ws = solve(inst.problem, "fista_ws", tol=1e-5, max_iters=5000)
    assert ws.converged, ws.rel_gap
    np.testing.assert_allclose(np.asarray(ws.x), np.asarray(ref.x),
                               atol=1e-3)
    cfg = SolverConfig(tol=1e-5, max_iters=5000)
    x, info, meta = solve_working_set(inst.problem, cfg, bucket=128,
                                      inner="bcd", force_kernels=True)
    assert meta["kernel_routed"], meta
    assert meta["ws_size"] % (960 // 120) == 0      # whole groups
    chk = duality_gap(inst.problem, x)
    assert float(chk.rel_gap) <= 1.5e-5, float(chk.rel_gap)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x), atol=1e-3)
