"""Config-5 per-chip kernel-regime measurement (VERDICT r2 Missing #2 /
task #5): the 50k x 1M contract size runs 16 chips x (50k x 62.5k) column
slabs; the PER-CHIP regime — m = 50k rows, where the VPU residency gate
forces narrow blocks — is runnable on the one real chip and must be
measured, not assumed.

This script, on the real TPU:
  1. reports which kernel family serves m=50k (VPU block size from the
     gate; expected B=24 — B=32 busts the 15 MB VMEM model at m=50k);
  2. hardware-validates kernel parity at a small 50k-row slab;
  3. runs a certified solve on a 50k x 24960 slab (A + A_t ~ 10 GB HBM,
     the largest pad-free-eligible slab with headroom) and prints the
     BASELINE.md row.

Run: python scripts/measure_config5_slab.py   (needs the axon relay up)
Env: C5_N (default 24960), C5_SMALL=1 for the parity check only.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setswitchinterval(0.001)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_co_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

M = 50_000
N = int(os.environ.get("C5_N", 24_960))
TOL = 1e-6

_T0 = time.perf_counter()


def tick(msg):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    from convex_optimization_tpu.ops.bcd_sweep_vpu import (
        pick_padded_block_size_vpu,
    )
    from convex_optimization_tpu.ops.bcd_sweep_pallas import (
        pick_padded_block_size,
    )
    from convex_optimization_tpu.ops.bcd_sweep_pallas_tiled import (
        pick_padded_block_size_tiled,
    )

    picked_vpu = pick_padded_block_size_vpu(M, N, 128)
    picked_res = pick_padded_block_size(M, N, 128)
    picked_tile = pick_padded_block_size_tiled(M, N, 128)
    tick(f"gates at m={M}, n={N}: vpu={picked_vpu} resident={picked_res} "
         f"tiled={picked_tile}")

    # --- 2. hardware kernel parity on a small 50k-row slab ---
    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.ops.bcd_sweep_ref import bcd_sweep_ref
    from convex_optimization_tpu.ops.bcd_sweep_vpu import (
        bcd_sweep_vpu,
        to_tblock_major,
    )
    from convex_optimization_tpu.ops.power_iter import block_spectral_norms_sq

    n_small = 768
    inst_s = make_lasso_instance(jax.random.PRNGKey(5), M, n_small)
    bs = pick_padded_block_size_vpu(M, n_small, 128)[0]
    nb = n_small // bs
    bL = block_spectral_norms_sq(inst_s.problem.A, nb)
    x0 = jnp.zeros((n_small,), jnp.float32)
    r0 = -inst_s.problem.b
    A_t = to_tblock_major(inst_s.problem.A, nb)
    xk, rk = jax.jit(
        lambda p, x, r, L, a_t: bcd_sweep_vpu(p, x, r, L, A_t=a_t)
    )(inst_s.problem, x0, r0, bL, A_t)
    order = jnp.arange(nb, dtype=jnp.int32)
    xr, rr = jax.jit(
        lambda p, x, r, L, o: bcd_sweep_ref(p, x, r, L, o)
    )(inst_s.problem, x0, r0, bL, order)
    x_err = float(jnp.max(jnp.abs(xk - xr)) / jnp.maximum(
        jnp.max(jnp.abs(xr)), 1e-30))
    r_err = float(jnp.max(jnp.abs(rk - rr)) / jnp.maximum(
        jnp.max(jnp.abs(rr)), 1e-30))
    tick(f"kernel parity at {M}x{n_small} (B={bs}): x_err={x_err:.2e} "
         f"r_err={r_err:.2e}")
    assert x_err < 5e-5 and r_err < 5e-5, "HW parity failed at m=50k"
    if os.environ.get("C5_SMALL") == "1":
        print(json.dumps({"metric": f"c5_parity_{M}x{n_small}",
                          "x_err": x_err, "r_err": r_err}))
        return

    # --- 3. certified solve on the big slab ---
    from convex_optimization_tpu.api import solve
    from convex_optimization_tpu.core.datagen import make_lasso_instance_host
    from convex_optimization_tpu.solvers.polish import polish_support

    inst, A_np, b_np = make_lasso_instance_host(42, M, N)
    tick("datagen + upload done")
    res = solve(inst.problem, method="bcd_pallas", tol=TOL, max_iters=20_000,
                gap_every=10, stall_checks=15, block_size=128)
    tick(f"solve: sweeps={res.iterations} timed={res.timed_iterations} "
         f"rel_gap={res.rel_gap:.2e} wall={res.wall_time_s:.2f}s "
         f"compile={res.compile_time_s:.1f}s")
    pr = polish_support(inst.problem, res.x, tol=TOL, A_host=A_np,
                        b_host=b_np, verbose=True)
    total = res.wall_time_s + pr.wall_time_s
    print(json.dumps({
        "metric": f"time_to_certified_1e-6_lasso_{M}x{N}_c5_slab",
        "value": round(total, 3), "unit": "s",
        "solve_s": round(res.wall_time_s, 3),
        "polish_s": round(pr.wall_time_s, 3),
        "sweeps": res.iterations, "timed_sweeps": res.timed_iterations,
        "rel_gap": pr.rel_gap, "certified": bool(pr.rel_gap <= TOL),
        "vpu_block": picked_vpu[0] if picked_vpu else 0,
    }))


if __name__ == "__main__":
    main()
