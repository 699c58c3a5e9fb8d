"""Unit tests: prox operators against closed forms (SURVEY.md section 4.2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from convex_optimization_tpu.models import l1, nonneg_l1, group_l2, soft_threshold
from tests.oracle import prox_np


def test_soft_threshold_closed_form():
    v = jnp.array([-3.0, -0.5, 0.0, 0.2, 2.0])
    out = soft_threshold(v, 1.0)
    np.testing.assert_allclose(out, [-2.0, 0.0, 0.0, 0.0, 1.0], atol=1e-7)


def test_l1_prox_matches_numpy(rng):
    v = rng.normal(size=256).astype(np.float32)
    pen = l1(0.3)
    np.testing.assert_allclose(
        pen.prox(jnp.asarray(v), 0.7), prox_np(v, 0.7, "l1", 0.3),
        rtol=1e-6, atol=1e-6,
    )


def test_nonneg_prox(rng):
    v = rng.normal(size=128).astype(np.float32)
    pen = nonneg_l1(0.5)
    out = np.asarray(pen.prox(jnp.asarray(v), 1.0))
    assert (out >= 0).all()
    np.testing.assert_allclose(out, prox_np(v, 1.0, "nonneg_l1", 0.5),
                               rtol=1e-6, atol=1e-6)


def test_group_prox_blockwise_shrink(rng):
    v = rng.normal(size=96).astype(np.float32)
    pen = group_l2(0.4, ngroups=8)
    out = np.asarray(pen.prox(jnp.asarray(v), 0.9))
    np.testing.assert_allclose(
        out, prox_np(v, 0.9, "group_l2", 0.4, ngroups=8), rtol=1e-5, atol=1e-6
    )
    # a group either shrinks toward zero or vanishes entirely
    vg = v.reshape(8, -1)
    og = out.reshape(8, -1)
    for g in range(8):
        n_in, n_out = np.linalg.norm(vg[g]), np.linalg.norm(og[g])
        assert n_out <= n_in + 1e-6


def test_group_prox_kills_small_groups():
    v = jnp.ones((4, 8)).reshape(-1) * 0.01
    pen = group_l2(10.0, ngroups=4)
    out = pen.prox(v, 1.0)
    assert jnp.all(out == 0.0)


def test_prox_block_matches_full_prox_group(rng):
    # blockwise prox over aligned blocks == full prox
    n, ngroups = 64, 8
    v = jnp.asarray(rng.normal(size=n).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.5, 2.0, size=ngroups).astype(np.float32))
    pen = group_l2(0.3, ngroups=ngroups, weights=w)
    full = pen.prox(v, 0.5)
    B = 16  # 2 groups per block
    parts = [
        pen.prox_block(v[j * B:(j + 1) * B], 0.5, j, n) for j in range(n // B)
    ]
    np.testing.assert_allclose(jnp.concatenate(parts), full, rtol=1e-6, atol=1e-7)


def test_penalty_value(rng):
    v = rng.normal(size=64).astype(np.float32)
    assert np.isclose(float(l1(2.0).value(jnp.asarray(v))), 2.0 * np.abs(v).sum(),
                      rtol=1e-5)
    gn = np.linalg.norm(v.reshape(4, -1), axis=1).sum()
    assert np.isclose(float(group_l2(1.5, 4).value(jnp.asarray(v))), 1.5 * gn,
                      rtol=1e-5)
