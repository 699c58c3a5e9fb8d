"""Transposed-layout VPU sweep vs the jnp oracle (ops/bcd_sweep_vpu.py).

Same parity methodology as test_pallas_sweep.py: interpreter mode on CPU
checks arithmetic and blocking exactly; hardware lowering is validated on
real TPU by the bench/driver runs (measured round 2: parity 4.8e-7 at
512x4096, 531 GB/s per sweep at 10000x100096).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_optimization_tpu.core.datagen import make_lasso_instance
from convex_optimization_tpu.ops.bcd_sweep_ref import bcd_sweep_ref
from convex_optimization_tpu.ops.bcd_sweep_vpu import (
    bcd_sweep_vpu,
    eligible_vpu,
    fits_vmem_vpu,
    pick_padded_block_size_vpu,
    to_tblock_major,
)
from convex_optimization_tpu.ops.power_iter import block_spectral_norms_sq


def _setup(m=64, n=1024, penalty_kind="l1", ngroups=0, lam2=0.0, seed=0,
           n_blocks=8):
    inst = make_lasso_instance(
        jax.random.PRNGKey(seed), m, n,
        penalty_kind=penalty_kind, ngroups=ngroups, lam2=lam2,
    )
    p = inst.problem
    block_L = block_spectral_norms_sq(p.A, n_blocks)
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
    x_v, r_v = bcd_sweep_vpu(p, x, r, block_L, interpret=True)
    # plain-f32 VPU arithmetic: same error class as the oracle, so the
    # tolerance is tighter than the MXU kernels' bf16x3 class
    np.testing.assert_allclose(np.asarray(x_v), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_v), np.asarray(r_ref),
                               rtol=1e-5, atol=1e-6)


def test_sweep_parity_with_mask_and_damping():
    p, x, r, block_L = _setup()
    keep = jax.random.bernoulli(jax.random.PRNGKey(7), 0.7, (p.n,))
    order = jnp.arange(block_L.shape[0], dtype=jnp.int32)
    x_ref, r_ref = bcd_sweep_ref(p, x, r, block_L, order,
                                 step_scale=0.5, keep_mask=keep)
    x_v, r_v = bcd_sweep_vpu(p, x, r, block_L, step_scale=0.5,
                             keep_mask=keep, interpret=True)
    np.testing.assert_allclose(np.asarray(x_v), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_v), np.asarray(r_ref),
                               rtol=1e-5, atol=1e-6)
    assert np.all(np.asarray(x_v)[~np.asarray(keep)] == 0.0)


def test_sublane_only_block_alignment():
    """B only needs 8-alignment (sublanes), not the MXU kernels' 128."""
    p, x, r, block_L = _setup(m=56, n=1008, n_blocks=14)   # B = 72
    assert eligible_vpu(56, 1008, 72)
    order = jnp.arange(14, dtype=jnp.int32)
    x_ref, r_ref = bcd_sweep_ref(p, x, r, block_L, order)
    x_v, r_v = bcd_sweep_vpu(p, x, r, block_L, interpret=True)
    np.testing.assert_allclose(np.asarray(x_v), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-6)


def test_eligibility_covers_headline():
    # the whole point of the transposed layout: without the MXU-HIGHEST
    # 2.66x scratch charge the (B, m) block is VMEM-resident at the
    # north-star size, so the fused kernel serves the headline bench
    assert eligible_vpu(10_000, 100_096, 128)
    assert fits_vmem_vpu(10_000, 128)
    # pad-free block sizes are preferred (a padded A is a 3rd full-size
    # device copy — OOM at the headline); n=100000 divides at B=80
    assert pick_padded_block_size_vpu(10_000, 100_000, 128) == (80, 0)
    # at config-5 slab m the (128, m) block no longer fits, but the picker
    # recovers residency by shrinking B (sublane-only alignment) — the
    # fused path still covers 50k-row slabs
    assert not fits_vmem_vpu(50_000, 128)
    picked = pick_padded_block_size_vpu(50_000, 1_000_000, 128)
    assert picked is not None and picked[0] < 128
    # non-f32 and ragged shapes decline
    assert not eligible_vpu(10_000, 100_096, 128, jnp.float64)
    assert not eligible_vpu(10_001, 100_096, 128)      # m % 8
    assert not eligible_vpu(10_000, 100_000, 129)      # B % 8


def test_to_tblock_major_roundtrip():
    A = jnp.arange(6 * 8, dtype=jnp.float32).reshape(6, 8)
    A_t = to_tblock_major(A, 2)            # (2, 4, 6)
    assert A_t.shape == (2, 4, 6)
    np.testing.assert_array_equal(np.asarray(A_t[1, 2]),
                                  np.asarray(A[:, 6]))


def test_fallback_when_ineligible(monkeypatch):
    import convex_optimization_tpu.ops.bcd_sweep_vpu as mod

    monkeypatch.setattr(mod, "_VMEM_BUDGET_BYTES", 1024)
    p, x, r, block_L = _setup()
    order = jnp.arange(block_L.shape[0], dtype=jnp.int32)
    x_ref, r_ref = bcd_sweep_ref(p, x, r, block_L, order)
    x_v, r_v = bcd_sweep_vpu(p, x, r, block_L)
    np.testing.assert_allclose(np.asarray(x_v), np.asarray(x_ref),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r_v), np.asarray(r_ref),
                               rtol=1e-6)


def test_multiple_sweeps_converge():
    from convex_optimization_tpu.core.objective import primal_value

    p, x, r, block_L = _setup(m=48, n=512, n_blocks=4)
    prev = float(primal_value(p, x, r))
    for _ in range(5):
        x, r = bcd_sweep_vpu(p, x, r, block_L, interpret=True)
        cur = float(primal_value(p, x, r))
        assert cur <= prev + 1e-6
        prev = cur


def test_solve_end_to_end_uses_vpu():
    """api.solve('bcd_pallas') must pick the VPU kernel at an eligible size
    and return a solution matching FISTA."""
    from convex_optimization_tpu.api import solve

    inst = make_lasso_instance(jax.random.PRNGKey(3), 256, 1000)
    assert pick_padded_block_size_vpu(256, 1000, 128) is not None
    res_p = solve(inst.problem, "bcd_pallas", tol=1e-5, max_iters=3000,
                  block_size=128)
    res_f = solve(inst.problem, "fista", tol=1e-6, max_iters=5000)
    assert res_p.x.shape == (1000,)
    assert res_p.converged
    np.testing.assert_allclose(np.asarray(res_p.x), np.asarray(res_f.x),
                               atol=5e-4)
