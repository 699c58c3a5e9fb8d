"""Pallas fused sweep vs the jnp oracle (SURVEY.md section 4.2 kernel parity).

The oracle is ops/bcd_sweep_ref.py with cyclic order; the Pallas kernel runs
in interpreter mode on CPU (same program, no Mosaic), so this checks the
kernel's arithmetic and blocking logic exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_optimization_tpu.core.datagen import make_lasso_instance
from convex_optimization_tpu.models.penalties import group_l2, nonneg_l1
from convex_optimization_tpu.ops.bcd_sweep_ref import bcd_sweep_ref
from convex_optimization_tpu.ops.bcd_sweep_pallas import (
    bcd_sweep_pallas,
    fits_vmem,
)
from convex_optimization_tpu.ops.power_iter import block_spectral_norms_sq


def _setup(m=64, n=256, penalty_kind="l1", ngroups=0, lam2=0.0, seed=0):
    inst = make_lasso_instance(
        jax.random.PRNGKey(seed), m, n,
        penalty_kind=penalty_kind, ngroups=ngroups, lam2=lam2,
    )
    p = inst.problem
    n_blocks = 4
    block_L = block_spectral_norms_sq(p.A, n_blocks)
    # a non-trivial starting point: one ISTA step from zero
    x = p.penalty.prox(-0.5 / jnp.max(block_L) * (p.A.T @ (-p.b)),
                       0.5 / jnp.max(block_L))
    r = p.residual(x)
    return p, x, r, block_L


@pytest.mark.parametrize("kind,ngroups,lam2", [
    ("l1", 0, 0.0),
    ("l1", 0, 0.3),           # elastic net
    ("nonneg_l1", 0, 0.0),
    ("group_l2", 16, 0.0),
    ("group_l2", 16, 0.1),
])
def test_sweep_parity(kind, ngroups, lam2):
    p, x, r, block_L = _setup(penalty_kind=kind, ngroups=ngroups, lam2=lam2)
    order = jnp.arange(block_L.shape[0], dtype=jnp.int32)
    x_ref, r_ref = bcd_sweep_ref(p, x, r, block_L, order)
    x_pal, r_pal = bcd_sweep_pallas(p, x, r, block_L, interpret=True)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref),
                               rtol=1e-5, atol=1e-6)


def test_sweep_parity_with_mask_and_damping():
    p, x, r, block_L = _setup()
    keep = jax.random.bernoulli(jax.random.PRNGKey(7), 0.7, (p.n,))
    order = jnp.arange(block_L.shape[0], dtype=jnp.int32)
    x_ref, r_ref = bcd_sweep_ref(p, x, r, block_L, order,
                                 step_scale=0.5, keep_mask=keep)
    x_pal, r_pal = bcd_sweep_pallas(p, x, r, block_L,
                                    step_scale=0.5, keep_mask=keep,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref),
                               rtol=1e-5, atol=1e-6)
    # frozen coordinates really frozen
    assert np.all(np.asarray(x_pal)[~np.asarray(keep)]
                  == np.asarray(x)[~np.asarray(keep)])


def test_multiple_sweeps_converge():
    """A few fused sweeps must monotonically decrease the objective."""
    from convex_optimization_tpu.core.objective import primal_value

    p, x, r, block_L = _setup(m=48, n=128)
    prev = float(primal_value(p, x, r))
    for _ in range(5):
        x, r = bcd_sweep_pallas(p, x, r, block_L, interpret=True)
        cur = float(primal_value(p, x, r))
        assert cur <= prev + 1e-6
        prev = cur


def test_vmem_gate():
    assert fits_vmem(4096, 256)
    assert not fits_vmem(50_000, 256)


def test_fallback_on_large_m(monkeypatch):
    """When the working set exceeds VMEM the call must still be correct
    (silent fallback to the oracle)."""
    import convex_optimization_tpu.ops.bcd_sweep_pallas as mod

    monkeypatch.setattr(mod, "_VMEM_BUDGET_BYTES", 1024)  # force fallback
    p, x, r, block_L = _setup()
    order = jnp.arange(block_L.shape[0], dtype=jnp.int32)
    x_ref, r_ref = bcd_sweep_ref(p, x, r, block_L, order)
    x_pal, r_pal = bcd_sweep_pallas(p, x, r, block_L)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref),
                               rtol=1e-6)
