"""Multi-host simulation: the sharded solvers on a REAL 2-process
jax.distributed runtime (Gloo cross-process collectives over localhost —
the DCN-analog boundary), 4 virtual CPU devices per process = an 8-device
global mesh.  Closes the gap between the single-process CPU-mesh tests and
real multi-host hardware: device_put of global arrays, cross-process psum,
and the init_multihost wrapper all execute for real.

The workers run the production solve_sharded (column FISTA + BCD) on the
global mesh; this test compares process-0's allgathered solutions against
the single-process solver.
"""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from convex_optimization_tpu import solve
from convex_optimization_tpu.core.datagen import make_lasso_instance

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multihost_worker.py")


def test_two_process_distributed_matches_local(tmp_path):
    out = str(tmp_path / "mh.json")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS")}
    env["JAX_PLATFORMS"] = "cpu"
    # keep the workers off this process's compile cache dir races
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "19741", out],
            env=env, cwd=_REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o.decode(errors="replace"))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"

    with open(out) as f:
        results = json.load(f)

    inst = make_lasso_instance(jax.random.PRNGKey(11), 64, 256)
    for method in ("fista", "bcd"):
        ref = solve(inst.problem, method, tol=1e-5, max_iters=400,
                    gap_every=5, block_size=16)
        got = results[method]
        # the 2-process sharded solver and the local one run the same
        # arithmetic modulo reduction order
        np.testing.assert_allclose(np.asarray(got["x"]), np.asarray(ref.x),
                                   atol=5e-4)
        if method == "fista":
            # identical iteration arithmetic -> identical convergence
            assert got["converged"] == ref.converged
        else:
            # Jacobi-across-chips BCD trades per-sweep progress for
            # parallelism (line-searched merge): within the sweep budget it
            # must be near tol, not necessarily across it
            assert got["rel_gap"] <= 20 * 1e-5, got["rel_gap"]
