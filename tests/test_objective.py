"""Unit tests: objective/dual/gap identities and lambda_max (SURVEY.md 4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_optimization_tpu.core.datagen import make_lasso_instance
from convex_optimization_tpu.core.objective import (
    duality_gap, lambda_max, primal_value,
)
from convex_optimization_tpu.core.problem import make_problem
from convex_optimization_tpu.models import l1, nonneg_l1, group_l2
from tests.oracle import solve_np, objective_np


KEY = jax.random.PRNGKey(42)


def test_gap_nonnegative_random_points():
    inst = make_lasso_instance(KEY, 40, 100)
    for seed in range(5):
        x = jax.random.normal(jax.random.PRNGKey(seed), (100,)) * 0.1
        info = duality_gap(inst.problem, x)
        assert float(info.gap) >= -1e-5
        assert float(info.primal) >= float(info.dual) - 1e-5


def test_gap_zero_at_optimum_orthogonal_design():
    # orthogonal A: lasso has the closed form x* = soft_threshold(A^T b, lam)
    m = n = 32
    Q, _ = jnp.linalg.qr(jax.random.normal(KEY, (m, n), dtype=jnp.float64))
    b = jax.random.normal(jax.random.PRNGKey(7), (m,), dtype=jnp.float64)
    lam = 0.3
    prob = make_problem(Q, b, lam)
    z = Q.T @ b
    x_star = jnp.sign(z) * jnp.maximum(jnp.abs(z) - lam, 0.0)
    # exact certificate in float64
    info64 = duality_gap(prob, x_star)
    assert float(info64.rel_gap) < 1e-12
    # f32 evaluation of the same point: certificate noise floor only
    prob32 = make_problem(Q.astype(jnp.float32), b.astype(jnp.float32), lam)
    info32 = duality_gap(prob32, x_star.astype(jnp.float32))
    assert float(info32.rel_gap) < 1e-5


def test_lambda_max_gives_zero_solution():
    inst = make_lasso_instance(KEY, 50, 120)
    p = inst.problem
    lmax = lambda_max(p.A, p.b, p.penalty)
    # at lam >= lam_max, x = 0 is optimal: its duality gap is 0
    for frac in (1.0, 1.5):
        prob = p.with_lam1(frac * lmax)
        info = duality_gap(prob, jnp.zeros(p.n))
        assert float(info.rel_gap) < 1e-5
    # just below lam_max, x = 0 is NOT optimal
    prob = p.with_lam1(0.5 * lmax)
    info = duality_gap(prob, jnp.zeros(p.n))
    assert float(info.rel_gap) > 1e-4


def test_primal_matches_numpy_oracle(rng):
    A = rng.normal(size=(30, 60)).astype(np.float32)
    b = rng.normal(size=30).astype(np.float32)
    x = rng.normal(size=60).astype(np.float32)
    for lam2 in (0.0, 0.5):
        prob = make_problem(A, b, 0.2, lam2=lam2)
        ours = float(primal_value(prob, jnp.asarray(x)))
        ref = objective_np(A, b, x.astype(np.float64), 0.2, lam2, "l1")
        assert np.isclose(ours, ref, rtol=1e-5)


@pytest.mark.parametrize("kind,lam2,ngroups", [
    ("l1", 0.0, 0), ("l1", 0.3, 0), ("nonneg_l1", 0.0, 0), ("group_l2", 0.0, 10),
])
def test_gap_small_at_oracle_solution(rng, kind, lam2, ngroups):
    # the float64 numpy oracle's solution must have a tiny certified gap
    m, n = 40, 80
    A = rng.normal(size=(m, n)) / np.sqrt(m)
    x_true = np.zeros(n)
    x_true[rng.choice(n, 5, replace=False)] = rng.normal(size=5)
    if kind == "nonneg_l1":
        x_true = np.abs(x_true)
    b = A @ x_true + 0.01 * rng.normal(size=m)
    lam1 = 0.1 * np.abs(A.T @ b).max()
    x_star = solve_np(A, b, lam1, lam2, kind, ngroups, tol=1e-10)

    if kind == "l1":
        pen = l1(lam1)
    elif kind == "nonneg_l1":
        pen = nonneg_l1(lam1)
    else:
        pen = group_l2(lam1, ngroups)
    prob = make_problem(A.astype(np.float32), b.astype(np.float32), lam1,
                        lam2=lam2, penalty=pen)
    info = duality_gap(prob, jnp.asarray(x_star, jnp.float32))
    assert float(info.rel_gap) < 5e-5
