"""ppermute ring all-reduce == psum (SURVEY.md 2.2 ring-consensus analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from convex_optimization_tpu import solve
from convex_optimization_tpu.core.datagen import make_lasso_instance
from convex_optimization_tpu.parallel.collectives import ring_psum, ring_psum_chunked
from convex_optimization_tpu.parallel.mesh import make_mesh, BLOCKS


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def test_ring_psum_equals_psum(mesh8):
    x = jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16)

    def f(v):
        return ring_psum(v, BLOCKS), jax.lax.psum(v, BLOCKS)

    ring, flat = jax.jit(jax.shard_map(
        f, mesh=mesh8, in_specs=P(BLOCKS), out_specs=(P(BLOCKS), P(BLOCKS)),
    ))(x)
    # ring sums sequentially, psum is a tree: different f32 rounding
    np.testing.assert_allclose(np.asarray(ring), np.asarray(flat),
                               rtol=1e-5, atol=1e-6)


def test_ring_psum_chunked(mesh8):
    # NOTE: inside shard_map the operand is the LOCAL shard; chunking splits
    # the local vector, so the global is 1-D sharded over devices
    x = jnp.linspace(-1, 1, 8 * 32, dtype=jnp.float32)

    def f(v):
        return ring_psum_chunked(v, BLOCKS, 4), jax.lax.psum(v, BLOCKS)

    ring, flat = jax.jit(jax.shard_map(
        f, mesh=mesh8, in_specs=P(BLOCKS), out_specs=(P(BLOCKS), P(BLOCKS)),
    ))(x)
    # ring sums sequentially, psum is a tree: different f32 rounding
    np.testing.assert_allclose(np.asarray(ring), np.asarray(flat),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skip(reason="XLA:CPU aborts (SIGABRT in WhileThunk) on "
                  "collective-permute inside a while_loop body; the ring "
                  "path is TPU-only until then.  The ring primitive itself "
                  "is equivalence-tested above; run this test manually on "
                  "TPU hardware.")
def test_sharded_solvers_with_ring_consensus(mesh8):
    """Ring-consensus sharded solves match the psum ones to tolerance."""
    inst = make_lasso_instance(jax.random.PRNGKey(11), 64, 256)
    ref = solve(inst.problem, "fista", mesh=mesh8, tol=1e-5, max_iters=2000)
    ring_f = solve(inst.problem, "fista", mesh=mesh8, tol=1e-5,
                   max_iters=2000, consensus="ring")
    np.testing.assert_allclose(np.asarray(ring_f.x), np.asarray(ref.x),
                               atol=5e-5)
    ring_b = solve(inst.problem, "bcd", mesh=mesh8, tol=1e-5, max_iters=2000,
                   block_size=16, consensus="ring")
    assert ring_b.converged
    np.testing.assert_allclose(np.asarray(ring_b.x), np.asarray(ref.x),
                               atol=5e-4)
