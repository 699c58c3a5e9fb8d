"""Hardware validation of the batched-lambda kernels (round 4).

Mosaic rejects some patterns ONLY on real TPU (CLAUDE.md: (1,1) blocks of
(n,1) arrays, scalar VMEM stores, float iota — interpret mode catches none
of them).  The batched kernels reuse round-2/3-validated patterns plus ONE
new one: static sublane ROW slicing of a resident (L, m) block
(r_ref[l:l+1, c0:c1] read/accumulate).  This script runs the exact
CPU-parity checks from tests/test_batched_path.py on the REAL chip at
small sizes (seconds of compile, trivial data) and prints PASS/FAIL per
kernel — run it BEFORE any batched measurement so a Mosaic rejection
costs seconds, not a battery slot.

Run: python scripts/validate_batch_kernels_tpu.py   (needs the relay)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_co_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

_T0 = time.perf_counter()


def tick(msg):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    import dataclasses
    import json

    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.ops.bcd_sweep_vpu import (
        bcd_sweep_vpu,
        to_tblock_major,
    )
    from convex_optimization_tpu.ops.bcd_sweep_vpu_batch import (
        ax_minus_b_batch_t,
        batch_sweep_vpu,
        neg_at_r_batch_t,
    )
    from convex_optimization_tpu.ops.matvec_pallas import (
        ax_minus_b_t,
        block_power_t,
        neg_at_r_t,
    )

    assert jax.devices()[0].platform == "tpu", "needs the real chip"
    m, n, B, L = 64, 256, 32, 3
    results = {}

    for kind, ngroups in [("l1", 0), ("nonneg_l1", 0), ("group_l2", 32)]:
        inst = make_lasso_instance(jax.random.PRNGKey(7), m, n,
                                   penalty_kind=kind, ngroups=ngroups)
        p = inst.problem
        nb = n // B
        A_t = to_tblock_major(p.A, nb)
        block_L = block_power_t(A_t, interpret=False)
        steps = (1.0 / (block_L + p.lam2)).astype(p.dtype)
        lam1s = jnp.asarray([2.0, 1.0, 0.25], p.dtype) * p.penalty.lam1
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.standard_normal((nb, L, B)), p.dtype) * 0.1
        if kind == "nonneg_l1":
            X = jnp.abs(X)
        gsize = n // ngroups if ngroups else 1
        w = (p.penalty._gweights(p.dtype).reshape(nb, 1, B // gsize)
             if kind == "group_l2" else None)
        R = jnp.stack([p.A @ X[:, l, :].reshape(n) - p.b for l in range(L)])

        tick(f"{kind}: compiling + running batched sweep on TPU")
        Xb, Rb = jax.jit(lambda Xv, Rv: batch_sweep_vpu(
            A_t, Xv, Rv, steps, lam1s, p.lam2, kind=kind, gsize=gsize,
            weights=w, interpret=False))(X, R)
        err = 0.0
        for l in range(L):
            pl_ = dataclasses.replace(
                p, penalty=p.penalty.with_lam1(lam1s[l]))
            x1, r1 = bcd_sweep_vpu(pl_, X[:, l, :].reshape(n), R[l],
                                   block_L, interpret=False, A_t=A_t)
            err = max(err,
                      float(jnp.max(jnp.abs(Xb[:, l, :].reshape(n) - x1))),
                      float(jnp.max(jnp.abs(Rb[l] - r1))))
        results[f"sweep_{kind}"] = err
        tick(f"{kind}: sweep max err vs single-lambda kernel = {err:.2e}")

    # matvec kernels (l1 instance reused)
    Rb = ax_minus_b_batch_t(A_t, X, p.b, interpret=False)
    Zb = neg_at_r_batch_t(A_t, R, X, 0.37, interpret=False)
    err_r = err_z = 0.0
    for l in range(L):
        x_l = X[:, l, :].reshape(n)
        r1 = ax_minus_b_t(A_t, x_l, p.b, interpret=False)
        z1 = neg_at_r_t(A_t, R[l], x_l, 0.37, interpret=False)
        err_r = max(err_r, float(jnp.max(jnp.abs(Rb[l] - r1))))
        err_z = max(err_z,
                    float(jnp.max(jnp.abs(Zb[:, l, :].reshape(n) - z1))))
    results["refresh"] = err_r
    results["witness"] = err_z
    tick(f"refresh err={err_r:.2e} witness err={err_z:.2e}")

    ok = all(v <= 1e-5 for v in results.values())
    print(json.dumps({
        "row": "batch_kernels_tpu_validation",
        "ok": ok,
        "max_errs": {k: f"{v:.2e}" for k, v in results.items()},
    }), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
