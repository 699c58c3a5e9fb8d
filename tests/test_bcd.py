"""Block-coordinate descent tests: sweep correctness vs brute force, solver
convergence vs the float64 oracle, block-size handling (SURVEY.md 4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_optimization_tpu import solve
from convex_optimization_tpu.core.datagen import make_lasso_instance
from convex_optimization_tpu.ops.bcd_sweep_ref import bcd_sweep_ref
from convex_optimization_tpu.ops.power_iter import (
    block_spectral_norms_sq,
    spectral_norm_sq,
)
from convex_optimization_tpu.solvers.bcd import pick_block_size
from tests.oracle import prox_np, solve_np

KEY = jax.random.PRNGKey(11)


def test_pick_block_size():
    assert pick_block_size(2000, 256) == 250
    assert pick_block_size(512, 256) == 256
    assert pick_block_size(256, 256, multiple_of=8) == 256
    assert pick_block_size(240, 128, multiple_of=16) == 80
    assert 1024 % pick_block_size(1024, 300) == 0


def test_block_spectral_norms_match_exact(rng):
    A = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    bl = block_spectral_norms_sq(A, 6, iters=200)
    for j in range(6):
        exact = np.linalg.norm(np.asarray(A[:, j * 16:(j + 1) * 16]), 2) ** 2
        got = float(bl[j])
        assert exact <= got <= 1.10 * exact, (j, exact, got)


def test_global_spectral_norm(rng):
    A = jnp.asarray(rng.normal(size=(48, 80)).astype(np.float32))
    exact = np.linalg.norm(np.asarray(A), 2) ** 2
    got = float(spectral_norm_sq(A, iters=200))
    assert exact <= got <= 1.06 * exact


def test_sweep_matches_manual_numpy(rng):
    """One Gauss-Seidel sweep == hand-written numpy block loop."""
    m, n, B = 24, 32, 8
    A = rng.normal(size=(m, n)).astype(np.float32)
    b = rng.normal(size=m).astype(np.float32)
    x = rng.normal(size=n).astype(np.float32)
    lam1 = 0.15
    from convex_optimization_tpu.core.problem import make_problem

    prob = make_problem(jnp.asarray(A), jnp.asarray(b), lam1)
    nb = n // B
    bL = block_spectral_norms_sq(prob.A, nb, iters=300)
    r0 = A @ x - b
    xj, rj = bcd_sweep_ref(prob, jnp.asarray(x), jnp.asarray(r0), bL,
                           jnp.arange(nb))
    # manual float64 replay with the same step sizes
    x64, r64 = x.astype(np.float64), (A @ x - b).astype(np.float64)
    A64 = A.astype(np.float64)
    for j in range(nb):
        sl = slice(j * B, (j + 1) * B)
        g = A64[:, sl].T @ r64
        t = 1.0 / float(bL[j])
        xn = prox_np(x64[sl] - t * g, t, "l1", lam1)
        r64 += A64[:, sl] @ (xn - x64[sl])
        x64[sl] = xn
    np.testing.assert_allclose(np.asarray(xj), x64, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rj), r64, atol=1e-5)
    # residual consistency: incremental r == recomputed r
    np.testing.assert_allclose(np.asarray(rj),
                               np.asarray(prob.A @ xj - prob.b), atol=1e-5)


def test_bcd_matches_oracle():
    inst = make_lasso_instance(KEY, 96, 384, dtype=jnp.float64)
    p = inst.problem
    res = solve(p, "bcd", tol=1e-9, max_iters=2000, block_size=64)
    assert res.converged
    x_np = solve_np(np.asarray(p.A), np.asarray(p.b), float(p.penalty.lam1),
                    tol=1e-11)
    np.testing.assert_allclose(np.asarray(res.x), x_np, atol=2e-6)


def test_bcd_converges_faster_than_ista_per_sweep():
    # Gauss-Seidel sweeps make more progress than plain gradient steps
    inst = make_lasso_instance(KEY, 80, 320, dtype=jnp.float64)
    bcd_res = solve(inst.problem, "bcd", tol=1e-8, max_iters=3000,
                    block_size=32)
    ista_res = solve(inst.problem, "ista", tol=1e-8, max_iters=20000)
    assert bcd_res.converged
    assert bcd_res.iterations < ista_res.iterations
