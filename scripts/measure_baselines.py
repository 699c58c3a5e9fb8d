"""Same-algorithm CPU baseline per-unit costs for the contract configs
(VERDICT r2 #6: fill the vs_baseline columns for configs 2-4).

Measures, NumPy on this host (the reference's CPU way), per unit:
  * config2 (5k x 50k, l1): seconds per cyclic GS sweep (block 128) and
    per FISTA iteration — the lambda-path baseline is per-unit x the
    iteration counts OUR path actually used (same warm-start schedule:
    both solvers do identical work per unit, SURVEY.md 3.2).
  * config3 (10k x 100k, nonneg elastic-net): seconds per GS sweep with
    the nonneg prox + lam2 term.

Values go to artifacts/baselines.json (committed: the bench/CLI rows cite
them; /tmp caches do not survive rounds).  Pure CPU — runs while the TPU
relay is down.  The timing needs a quiet host (same rule as bench.py).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setswitchinterval(0.001)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "baselines.json")


def gen(m, n, seed=42):
    """Instance-shaped data for timing (values don't affect dense matvec
    cost; column-major like make_lasso_instance_host so block slices are
    contiguous, matching the reference's natural layout)."""
    rng = np.random.default_rng(seed)
    A = np.asfortranarray(
        rng.standard_normal((m, n)).astype(np.float32) / np.sqrt(m))
    b = rng.standard_normal(m).astype(np.float32)
    return A, b


def main():
    from bench import numpy_bcd_sweep_seconds, numpy_fista_iter_seconds

    out = {}
    t0 = time.perf_counter()

    # config2: 5k x 50k l1
    A, b = gen(5_000, 50_000)
    lam1 = 0.1 * float(np.max(np.abs(A.T @ b)))
    out["config2_5000x50000_bcd_sweep_s"] = numpy_bcd_sweep_seconds(
        A, b, lam1, block=128, sweeps=2)
    print(f"# [{time.perf_counter()-t0:6.1f}s] config2 GS sweep: "
          f"{out['config2_5000x50000_bcd_sweep_s']:.3f}s", file=sys.stderr,
          flush=True)
    out["config2_5000x50000_fista_iter_s"] = numpy_fista_iter_seconds(
        A, b, lam1, iters=2)
    print(f"# [{time.perf_counter()-t0:6.1f}s] config2 FISTA iter: "
          f"{out['config2_5000x50000_fista_iter_s']:.3f}s", file=sys.stderr,
          flush=True)
    del A, b

    # config3: 10k x 100k nonneg elastic-net (lam2=1e-3 per BENCH_CONFIGS)
    A, b = gen(10_000, 100_000)
    lam1 = 0.1 * float(np.max(A.T @ b))      # nonneg lambda_max: max, not abs
    out["config3_10000x100000_nonneg_en_bcd_sweep_s"] = (
        numpy_bcd_sweep_seconds(A, b, lam1, block=128, sweeps=2,
                                penalty_kind="nonneg_l1", lam2=1e-3))
    print(f"# [{time.perf_counter()-t0:6.1f}s] config3 nonneg-EN GS sweep: "
          f"{out['config3_10000x100000_nonneg_en_bcd_sweep_s']:.3f}s",
          file=sys.stderr, flush=True)
    del A, b

    out["host"] = os.uname().nodename
    out["note"] = ("seconds per algorithm unit, NumPy on the 1-core host; "
                   "baseline totals = per-unit x the solver's own "
                   "iteration count (bench.py methodology)")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    existing = {}
    try:
        with open(OUT) as f:
            existing = json.load(f)
    except Exception:
        pass
    existing.update(out)
    with open(OUT, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(existing))


if __name__ == "__main__":
    main()
