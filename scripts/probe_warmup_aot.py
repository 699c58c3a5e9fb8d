"""Relay first-execution warm-up probe (VERDICT r2 Missing #6).

Round-2 measured: a program's genuinely-FIRST execution through the axon
relay pays 55-557 s at headline size even when its XLA compile is seconds
(kernel-only programs).  This probes whether any of it is mitigable:

  1. baseline: jit compile (timed) -> first exec (timed) -> second exec
     (timed) on a fresh kernel-only program;
  2. jax.export round-trip: serialize the lowered/compiled artifact,
     deserialize, run — does a cold call through the deserialized
     executable still pay the warm-up?
  3. a shape-identical SECOND program (same kernels, different constant):
     does the warm-up amortize per-program or per-process?

Each phase prints its own timing line; run on a QUIET host with the relay
up.  Sizes default to a mid-size slab (2500 x 25000, ~250 MB) so the
probe finishes in minutes; WARMUP_M/WARMUP_N override for the headline.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setswitchinterval(0.001)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_co_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# m must be sublane-aligned (m % 8 == 0) for the VPU kernels — 2500 made
# pick_padded_block_size_vpu return None (r5 battery first run)
M = int(os.environ.get("WARMUP_M", 2_496))
N = int(os.environ.get("WARMUP_N", 25_000))

_T0 = time.perf_counter()


def tick(msg):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.ops.bcd_sweep_vpu import (
        pick_padded_block_size_vpu,
        to_tblock_major,
    )
    from convex_optimization_tpu.ops.matvec_pallas import ax_minus_b_t

    inst = make_lasso_instance(jax.random.PRNGKey(0), M, N)
    A = inst.problem.A
    b = inst.problem.b
    picked = pick_padded_block_size_vpu(M, N, 128)
    assert picked is not None, (
        f"no eligible VPU block for (m={M}, n={N}) — m % 8 == 0 required")
    bs, pad = picked
    assert pad == 0, "pick a pad-free size"
    A_t = to_tblock_major(A, N // bs)
    x = jnp.ones((N,), jnp.float32) / N
    tick(f"setup done (B={bs})")

    def run_phase(label, fn, *args):
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        t1 = time.perf_counter()
        out = compiled(*args)
        _ = float(jnp.sum(out))               # value fetch barrier
        t2 = time.perf_counter()
        # perturbed second exec (defeats relay memoization)
        args2 = (args[0], args[1].at[0].add(1e-6), args[2])
        out = compiled(*args2)
        _ = float(jnp.sum(out))
        t3 = time.perf_counter()
        tick(f"{label}: compile={t1-t0:.1f}s first_exec={t2-t1:.1f}s "
             f"second_exec={t3-t2:.2f}s")
        return compiled

    # 1. baseline program
    f = lambda a_t, xv, bv: ax_minus_b_t(a_t, xv, bv)
    run_phase("baseline kernel program", f, A_t, x, b)

    # 2. export round-trip (does a deserialized executable dodge anything?)
    try:
        from jax import export as jexport

        t0 = time.perf_counter()
        exp = jexport.export(jax.jit(f))(A_t, x, b)
        blob = exp.serialize()
        t1 = time.perf_counter()
        rt = jexport.deserialize(blob)
        t2 = time.perf_counter()
        out = rt.call(A_t, x.at[1].add(1e-6), b)
        _ = float(jnp.sum(out))
        t3 = time.perf_counter()
        out = rt.call(A_t, x.at[2].add(1e-6), b)
        _ = float(jnp.sum(out))
        t4 = time.perf_counter()
        tick(f"export: serialize={t1-t0:.1f}s ({len(blob)} B) "
             f"deserialize={t2-t1:.1f}s first_call={t3-t2:.1f}s "
             f"second_call={t4-t3:.2f}s")
    except Exception as e:
        tick(f"export path unavailable: {type(e).__name__}: {e}")

    # 3. shape-identical second program (fresh trace, new constant)
    g = lambda a_t, xv, bv: ax_minus_b_t(a_t, xv, bv) * 1.0000001
    run_phase("second (shape-identical) program", g, A_t, x, b)


if __name__ == "__main__":
    main()
