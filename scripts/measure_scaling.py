"""Iterations/s scaling-efficiency harness (BASELINE.json:5 north star:
">= 80% iterations/s scaling efficiency 1 -> 16 chips").

Strong scaling on a FIXED instance: for each mesh size k in 1, 2, 4, ...
up to the visible device count, run the column-sharded solver and record
the timed iterations/s.  Efficiency_k = (it/s)_k / (k * (it/s)_1) — ideal
strong scaling makes each iteration k x faster.

On the CPU-simulated mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu, 1 physical core) the numbers are mechanics-validation
only — all "devices" share one core, so efficiency reads ~1/k by
construction.  The contract number needs real chips; this script IS the
measurement when they exist (PARITY.md risk ledger).

Env: SCALE_M/SCALE_N (default 2048 x 16384), SCALE_METHOD
('fista'|'bcd'|'bcd_pallas'), SCALE_TOL (1e-4), SCALE_MAX_ITERS (600),
SCALE_AXIS ('blocks'|'rows').
Prints one JSON line with the per-k rows.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setswitchinterval(0.001)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_co_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

_T0 = time.perf_counter()


def tick(msg):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    from convex_optimization_tpu.api import solve
    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.parallel.mesh import make_mesh

    m = int(os.environ.get("SCALE_M", 2_048))
    n = int(os.environ.get("SCALE_N", 16_384))
    method = os.environ.get("SCALE_METHOD", "fista")
    tol = float(os.environ.get("SCALE_TOL", 1e-4))
    max_iters = int(os.environ.get("SCALE_MAX_ITERS", 600))
    axis = os.environ.get("SCALE_AXIS", "blocks")

    ndev = len(jax.devices())
    ks = [k for k in (1, 2, 4, 8, 16, 32) if k <= ndev]
    tick(f"devices={ndev} ({jax.devices()[0].platform}), instance {m}x{n}, "
         f"method={method}, mesh sizes {ks}")

    inst = make_lasso_instance(jax.random.PRNGKey(42), m, n)
    problem = inst.problem

    rows = []
    base_ips = None
    for k in ks:
        dim = m if axis == "rows" else n
        if dim % k:
            tick(f"k={k}: {axis}-dim {dim} not divisible, skipping")
            continue
        mesh = make_mesh(k, axis=axis)
        t0 = time.perf_counter()
        res = solve(problem, method, mesh=mesh, tol=tol,
                    max_iters=max_iters, gap_every=10)
        wall_total = time.perf_counter() - t0
        ips = res.iters_per_sec
        if base_ips is None:
            base_ips = ips
        eff = ips / (k * base_ips) if base_ips else float("nan")
        rows.append({
            "k": k, "iters_per_sec": round(ips, 2),
            "efficiency_vs_1": round(eff, 4),
            "iters": res.iterations, "rel_gap": float(res.rel_gap),
            "solve_wall_s": round(res.wall_time_s, 3),
            "total_s": round(wall_total, 2),
        })
        tick(f"k={k}: {ips:.1f} it/s, eff={eff:.2%}, "
             f"gap={res.rel_gap:.2e}")

    print(json.dumps({
        "row": f"scaling_{method}_{axis}_{m}x{n}",
        "platform": jax.devices()[0].platform,
        "note": ("CPU-simulated mesh: mechanics validation only"
                 if jax.devices()[0].platform == "cpu" else
                 "real devices"),
        "points": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
