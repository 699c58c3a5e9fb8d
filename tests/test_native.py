"""Native host runtime (native/co_native.cpp via utils/native.py)."""

import numpy as np
import pytest

from convex_optimization_tpu.utils import native


def test_native_builds():
    assert native.have_native(), "g++ build of native/co_native.cpp failed"


def test_gaussian_statistics_and_determinism():
    a = native.gaussian((512, 256), seed=7)
    assert a.dtype == np.float32 and a.shape == (512, 256)
    assert abs(a.mean()) < 0.02 and abs(a.std() - 1.0) < 0.02
    b = native.gaussian((512, 256), seed=7)
    np.testing.assert_array_equal(a, b)          # deterministic in seed
    c = native.gaussian((512, 256), seed=8)
    assert not np.array_equal(a, c)


def test_gaussian_thread_count_invariance():
    a = native.gaussian((2048, 1024), seed=3, nthreads=1)
    b = native.gaussian((2048, 1024), seed=3, nthreads=4)
    np.testing.assert_array_equal(a, b)


def test_matrix_store_roundtrip(tmp_path):
    p = str(tmp_path / "mat.cotpu")
    a = np.random.default_rng(0).standard_normal((37, 53)).astype(np.float32)
    native.write_matrix(p, a)
    back = native.read_matrix(p)
    np.testing.assert_array_equal(back, a)


def test_matrix_store_rejects_garbage(tmp_path):
    if not native.have_native():
        pytest.skip("no native lib")
    p = str(tmp_path / "junk.bin")
    open(p, "wb").write(b"not a matrix header at all.....")
    with pytest.raises(Exception):
        native.read_matrix(p)


def test_host_instance_matches_device_semantics():
    """make_lasso_instance_host builds a valid instance: unit columns,
    planted support, lam1 in the sparse regime, solvable to tolerance."""
    import jax
    from convex_optimization_tpu.api import solve
    from convex_optimization_tpu.core.datagen import make_lasso_instance_host

    inst, A_np, b_np = make_lasso_instance_host(7, 96, 384)
    np.testing.assert_allclose(np.linalg.norm(A_np, axis=0), 1.0, rtol=1e-5)
    assert A_np.shape == (96, 384) and b_np.shape == (96,)
    res = solve(inst.problem, "fista", tol=1e-5, max_iters=4000)
    assert res.converged
    rec = (np.asarray(res.x != 0) & np.asarray(inst.support)).sum()
    assert rec / np.asarray(inst.support).sum() > 0.8


def test_host_instance_polish_with_host_arrays():
    from convex_optimization_tpu.api import solve
    from convex_optimization_tpu.core.datagen import make_lasso_instance_host
    from convex_optimization_tpu.solvers.polish import polish

    inst, A_np, b_np = make_lasso_instance_host(9, 64, 256)
    res = solve(inst.problem, "fista", tol=1e-4, max_iters=3000)
    pr = polish(inst.problem, res.x, tol=1e-8, A_host=A_np, b_host=b_np)
    assert pr.rel_gap <= 1e-8


def test_instance_store_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from convex_optimization_tpu.api import solve
    from convex_optimization_tpu.core.datagen import (
        make_lasso_instance,
        save_instance,
        load_instance,
    )

    inst = make_lasso_instance(jax.random.PRNGKey(31), 64, 256,
                               penalty_kind="group_l2", ngroups=16)
    p = str(tmp_path / "inst")
    save_instance(p, inst)
    back = load_instance(p)
    np.testing.assert_array_equal(np.asarray(back.problem.A),
                                  np.asarray(inst.problem.A))
    np.testing.assert_array_equal(np.asarray(back.support),
                                  np.asarray(inst.support))
    assert back.problem.penalty.kind == "group_l2"
    # loaded instance solves identically
    r1 = solve(inst.problem, "fista", tol=1e-4, max_iters=2000)
    r2 = solve(back.problem, "fista", tol=1e-4, max_iters=2000)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x), atol=1e-6)
