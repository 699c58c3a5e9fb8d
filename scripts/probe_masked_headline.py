"""Isolate the r5 CV-headline worker crash: run the row-masked batched
sweep at the PRODUCTION shape (m=10000, B=80, L=8 — exactly what
cv_lambda_path dispatches at the 10k x 100k headline) standalone, with a
tiny n so data cost is negligible.  The masked kernel was chip-validated
at m=64 only; the unmasked body is chip-validated at m=10000/L=16.  If
this crashes the worker, the masked gate at production m is the fault;
if it passes (parity vs a masked-copy sweep), suspect memory pressure or
relay flake in the CV run.

Run: python scripts/probe_masked_headline.py   (needs the relay)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

M = int(os.environ.get("PMH_M", 10_000))
B = int(os.environ.get("PMH_B", 80))
NB = int(os.environ.get("PMH_NB", 4))
L = int(os.environ.get("PMH_L", 8))

_T0 = time.perf_counter()


def tick(msg):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_co_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from convex_optimization_tpu.ops.bcd_sweep_vpu_batch import (
        ax_minus_b_batch_t,
        batch_sweep_vpu,
    )
    from convex_optimization_tpu.ops.matvec_pallas import block_power_t
    from convex_optimization_tpu.utils.relay import warm_relay_async

    assert jax.devices()[0].platform == "tpu"
    warm_relay_async()

    n = NB * B
    rng = np.random.default_rng(11)
    A_t = jnp.asarray(rng.standard_normal((NB, B, M)) / np.sqrt(M),
                      jnp.float32)
    b = jnp.asarray(rng.standard_normal(M), jnp.float32)
    bL = block_power_t(A_t, interpret=False)
    steps = (1.0 / bL).astype(jnp.float32)
    lam1s = jnp.geomspace(0.5, 0.02, L).astype(jnp.float32)
    X = jnp.asarray(rng.standard_normal((NB, L, B)), jnp.float32) * 0.1
    rm = jnp.asarray((rng.random(M) > 0.2).astype(np.float32))
    R = rm[None, :] * (ax_minus_b_batch_t(A_t, X, b, interpret=False))
    tick(f"setup done (m={M} B={B} nb={NB} L={L})")

    f_masked = jax.jit(lambda Xv, Rv: batch_sweep_vpu(
        A_t, Xv, Rv, steps, lam1s, 0.0, kind="l1", row_mask=rm,
        interpret=False))
    t0 = time.perf_counter()
    Xm, Rm = f_masked(X, R)
    _ = float(Rm[0, 0])
    tick(f"masked sweep at production shape ran ({time.perf_counter()-t0:.1f}s"
         " incl. compile + warm-up)")
    # a few more sweeps: the CV run crashed minutes in, not on first exec
    for i in range(20):
        Xm, Rm = f_masked(Xm, Rm)
    _ = float(Rm[0, 0])
    tick("20 further masked sweeps ran")

    # parity vs a masked COPY of A through the UNMASKED kernel
    A_t_mc = A_t * rm[None, None, :]
    f_copy = jax.jit(lambda Xv, Rv: batch_sweep_vpu(
        A_t_mc, Xv, Rv, steps, lam1s, 0.0, kind="l1", interpret=False))
    Xc, Rc = X, rm[None, :] * ax_minus_b_batch_t(A_t, X, b, interpret=False)
    Xc, Rc = f_copy(Xc, Rc)
    for i in range(20):
        Xc, Rc = f_copy(Xc, Rc)
    err = max(float(jnp.max(jnp.abs(Xm - Xc))),
              float(jnp.max(jnp.abs(Rm - Rc))))
    ok = err <= 1e-5
    print(json.dumps({"row": "masked_headline_probe", "ok": ok,
                      "m": M, "B": B, "nb": NB, "L": L,
                      "err_vs_masked_copy": f"{err:.2e}"}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
