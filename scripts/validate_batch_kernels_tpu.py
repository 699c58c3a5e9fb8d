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

    # --- masked sweep (round 5, kernel-routed CV): the row-mask gate on
    # the phase-2 residual update is new Mosaic surface (a resident (1, m)
    # VMEM input multiplied into the (1, c) accumulator chunks); must be
    # bit-exact vs a plain sweep over a masked COPY of A on the chip
    tick("masked sweep: compiling + running row-masked batched sweep")
    rm = jnp.asarray((np.random.default_rng(5).random(m) > 0.25)
                     .astype(np.float32))
    Rm = rm[None, :] * R
    Xm1, Rm1 = jax.jit(lambda Xv, Rv: batch_sweep_vpu(
        A_t, Xv, Rv, steps, lam1s, p.lam2, kind="l1", row_mask=rm,
        interpret=False))(X, Rm)
    A_t_mc = to_tblock_major(p.A * rm[:, None], nb)
    Xm2, Rm2 = jax.jit(lambda Xv, Rv: batch_sweep_vpu(
        A_t_mc, Xv, Rv, steps, lam1s, p.lam2, kind="l1",
        interpret=False))(X, Rm)
    err_m = max(float(jnp.max(jnp.abs(Xm1 - Xm2))),
                float(jnp.max(jnp.abs(Rm1 - Rm2))))
    results["sweep_row_masked"] = err_m
    tick(f"masked sweep max err vs masked-copy sweep = {err_m:.2e}")

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

    # --- production shape: L = MAX_BATCH at headline m (VERDICT r4 Weak
    # #3: the statically-unrolled body grows ~L x lane-chunks; compile
    # time and VMEM behavior at the shape production uses were outside
    # the validation envelope).  n stays tiny (grid steps don't change
    # the program) so the data cost is ~20 MB, not 4 GB.
    from convex_optimization_tpu.ops.bcd_sweep_vpu import (
        pick_padded_block_size_vpu,
    )
    from convex_optimization_tpu.ops.bcd_sweep_vpu_batch import (
        MAX_BATCH,
        eligible_vpu_batch,
    )

    m_h = 10000
    B_h = pick_padded_block_size_vpu(m_h, 100000, 128)[0]  # headline picker
    L_h, nb_h = MAX_BATCH, 4
    n_h = nb_h * B_h
    assert eligible_vpu_batch(m_h, n_h, B_h, L_h)
    tick(f"headline shape: m={m_h} B={B_h} L={L_h} — compiling batched "
         f"sweep (times the Mosaic compile at production size)")
    rng = np.random.default_rng(3)
    A_h = jnp.asarray(rng.standard_normal((nb_h, B_h, m_h)) / np.sqrt(m_h),
                      jnp.float32)
    bL_h = block_power_t(A_h, interpret=False)
    steps_h = (1.0 / bL_h).astype(jnp.float32)
    lam1s_h = jnp.geomspace(1.0, 0.05, L_h).astype(jnp.float32)
    X_h = jnp.asarray(rng.standard_normal((nb_h, L_h, B_h)),
                      jnp.float32) * 0.1
    b_h = jnp.asarray(rng.standard_normal(m_h), jnp.float32)
    R_h = jnp.stack([
        ax_minus_b_t(A_h, X_h[:, l, :].reshape(n_h), b_h, interpret=False)
        for l in range(L_h)])
    f_h = jax.jit(lambda Xv, Rv: batch_sweep_vpu(
        A_h, Xv, Rv, steps_h, lam1s_h, 0.0, kind="l1", interpret=False))
    t0 = time.perf_counter()
    compiled = f_h.lower(X_h, R_h).compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    Xb_h, Rb_h = compiled(X_h, R_h)
    float(Rb_h[0, 0])   # value fetch barrier (relay rules)
    first_exec_s = time.perf_counter() - t0
    tick(f"headline compile={compile_s:.1f}s first_exec={first_exec_s:.1f}s")
    # parity vs the proven single-lambda kernel, per lambda slice
    from convex_optimization_tpu.core.problem import Problem
    from convex_optimization_tpu.models.penalties import l1

    err_h = 0.0
    for l in range(L_h):
        p_l = Problem(A=jnp.full((m_h, n_h), jnp.nan, jnp.float32),
                      b=b_h, penalty=l1(lam1s_h[l]), lam2=0.0)
        x1, r1 = bcd_sweep_vpu(p_l, X_h[:, l, :].reshape(n_h), R_h[l],
                               bL_h, interpret=False, A_t=A_h)
        err_h = max(err_h,
                    float(jnp.max(jnp.abs(Xb_h[:, l, :].reshape(n_h) - x1))),
                    float(jnp.max(jnp.abs(Rb_h[l] - r1))))
    results["sweep_headline_L16"] = err_h
    tick(f"headline L={L_h} parity err={err_h:.2e}")

    ok = all(v <= 1e-5 for v in results.values())
    print(json.dumps({
        "row": "batch_kernels_tpu_validation",
        "ok": ok,
        "max_errs": {k: f"{v:.2e}" for k, v in results.items()},
        "headline_shape": {"m": m_h, "B": B_h, "L": L_h,
                           "compile_s": round(compile_s, 2),
                           "first_exec_s": round(first_exec_s, 2)},
    }), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
