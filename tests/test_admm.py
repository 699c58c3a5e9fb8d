"""ADMM solver tests (SURVEY.md C9 splitting family; PAPERS.md ADMM refs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_optimization_tpu.api import solve
from convex_optimization_tpu.core.datagen import make_lasso_instance
from convex_optimization_tpu.core.objective import duality_gap
from convex_optimization_tpu.solvers.admm import admm_setup, _x_update


def _inst(m=64, n=256, seed=0, **kw):
    return make_lasso_instance(jax.random.PRNGKey(seed), m, n, **kw)


def test_x_update_exact_both_branches():
    """Woodbury (n > m) and direct (n <= m) x-updates solve the same system."""
    for m, n in [(32, 96), (96, 32)]:
        inst = _inst(m=m, n=n)
        A = np.asarray(inst.problem.A, np.float64)
        fac = admm_setup(inst.problem)
        assert fac.use_woodbury == (n > m)
        q = np.linspace(-1, 1, n).astype(np.float32)
        c = 0.7
        got = np.asarray(_x_update(inst.problem, fac, jnp.asarray(q), c),
                         np.float64)
        want = np.linalg.solve(A.T @ A + c * np.eye(n), q.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("kind,ngroups,lam2", [
    ("l1", 0, 0.0),
    ("l1", 0, 0.1),          # elastic net
    ("nonneg_l1", 0, 0.0),
    ("group_l2", 16, 0.0),
])
def test_admm_converges_and_matches_fista(kind, ngroups, lam2):
    inst = _inst(m=96, n=256, penalty_kind=kind, ngroups=ngroups, lam2=lam2)
    res_a = solve(inst.problem, "admm", tol=1e-5, max_iters=2000)
    res_f = solve(inst.problem, "fista", tol=1e-6, max_iters=5000)
    assert res_a.converged, res_a.rel_gap
    # same optimum within the eps-optimality ball: the optimal-alpha
    # monitor (round 2) certifies tol=1e-5 at genuinely looser iterates
    # than the round-1 conservative gap did, so the admissible distance
    # between the two certified solutions grows accordingly
    np.testing.assert_allclose(np.asarray(res_a.x), np.asarray(res_f.x),
                               atol=2.5e-3)
    # the returned iterate really certifies at the claimed gap
    info = duality_gap(inst.problem, res_a.x)
    assert float(info.rel_gap) < 2e-5


def test_admm_overdetermined():
    """m > n path (direct Gram branch) on a well-posed instance."""
    inst = _inst(m=256, n=96)
    res = solve(inst.problem, "admm", tol=1e-5, max_iters=2000)
    assert res.converged


def test_admm_robust_on_ill_conditioned():
    """ADMM's exact x-update must still converge (to the f32 floor of an
    ill-conditioned Gram) where naive fixed-step methods can stall."""
    key = jax.random.PRNGKey(3)
    m, n = 128, 96
    U = jnp.linalg.qr(jax.random.normal(key, (m, m)))[0]
    V = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(4), (n, n)))[0]
    s = jnp.geomspace(1.0, 1e-3, n)           # condition number 1e3
    A = (U[:, :n] * s) @ V.T
    x_true = jnp.zeros((n,)).at[:8].set(1.0)
    b = A @ x_true
    from convex_optimization_tpu.core.problem import make_problem
    from convex_optimization_tpu.core.objective import lambda_max
    from convex_optimization_tpu.models.penalties import l1

    lam = 0.05 * float(lambda_max(A, b, l1(1.0)))
    prob = make_problem(A, b, lam)
    res_a = solve(prob, "admm", tol=1e-4, max_iters=3000)
    assert res_a.converged
    # solution agrees with FISTA's at matching accuracy
    res_f = solve(prob, "fista", tol=1e-4, max_iters=5000)
    np.testing.assert_allclose(np.asarray(res_a.x), np.asarray(res_f.x),
                               atol=5e-3)


def test_admm_scale_fence_falls_back_with_warning(monkeypatch):
    """Above the documented f32-eigh accuracy fence, solve('admm') must
    warn and fall back to FISTA instead of silently burning max_iters at a
    ~1e-2 stall (api.solve guard, BASELINE.md).  The fence dimension is
    monkeypatched down: exercising the real 4096 threshold costs a
    multi-thousand-dim eigh on the 1-core CI host for no extra coverage."""
    import pytest as _pytest

    from convex_optimization_tpu import api
    from convex_optimization_tpu.core.datagen import make_lasso_instance

    monkeypatch.setattr(api, "ADMM_FENCE_DIM", 64)
    inst = make_lasso_instance(jax.random.PRNGKey(9), 96, 384)
    with _pytest.warns(UserWarning, match="admm_force"):
        res = solve(inst.problem, "admm", tol=1e-4, max_iters=1500)
    assert res.method == "fista"
    assert res.converged


def test_admm_host_setup_beats_device_setup():
    """admm_setup_host (round 3: f64 LAPACK eigh on the host, f32 loop
    unchanged) certifies a DEEPER gap than the f32 device eigh — on this
    instance the host-setup solve hits 1e-5 in ~90 iterations while the
    device-setup one stalls short of it for 3000 (measured; exactly the
    failure mode the >4096 scale fence documents, just milder at 96x384).
    The solution must still agree with FISTA's."""
    from convex_optimization_tpu.core.datagen import make_lasso_instance

    inst = make_lasso_instance(jax.random.PRNGKey(17), 96, 384)
    host = solve(inst.problem, "admm", tol=1e-5, max_iters=3000,
                 admm_setup="host")
    assert host.converged, host.rel_gap
    dev = solve(inst.problem, "admm", tol=1e-5, max_iters=300)
    assert host.rel_gap < dev.rel_gap
    ref = solve(inst.problem, "fista", tol=1e-5, max_iters=5000)
    np.testing.assert_allclose(np.asarray(host.x), np.asarray(ref.x),
                               atol=5e-4)


def test_admm_host_setup_skips_fence(monkeypatch):
    """admm_setup='host' takes the host-f64 path above the fence instead of
    the FISTA fallback (fence dimension monkeypatched down — see the fence
    test)."""
    import warnings

    from convex_optimization_tpu import api
    from convex_optimization_tpu.core.datagen import make_lasso_instance

    monkeypatch.setattr(api, "ADMM_FENCE_DIM", 64)
    inst = make_lasso_instance(jax.random.PRNGKey(19), 96, 384)
    with warnings.catch_warnings():
        warnings.simplefilter("error")        # no fence warning allowed
        res = solve(inst.problem, "admm", tol=1e-3, max_iters=400,
                    stall_checks=10, admm_setup="host")
    assert res.method == "admm"


def test_admm_lambda_path_matches_fista_path():
    """ADMM lambda path (round 3): one eigenbasis factorization serves the
    whole warm-started path (the factors are lam-independent); solutions
    match the FISTA path."""
    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.solvers.common import SolverConfig
    from convex_optimization_tpu.solvers.lambda_path import lambda_path

    inst = make_lasso_instance(jax.random.PRNGKey(51), 96, 384)
    cfg = SolverConfig(tol=1e-6, max_iters=3000, gap_every=5,
                       stall_checks=10)
    ref = lambda_path(inst.problem, cfg, path_len=5)
    adm = lambda_path(inst.problem, cfg, path_len=5, method="admm")
    for i in range(5):
        # two independently certified solves: agreement within the
        # gap-implied ball (same slack as test_admm_converges_and_matches)
        np.testing.assert_allclose(np.asarray(adm.xs[i]),
                                   np.asarray(ref.xs[i]), atol=2.5e-3)
