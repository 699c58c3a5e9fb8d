"""Worker for the 2-process multi-host simulation test (SURVEY.md §2.2
multi-host row / §4.2 distributed-without-a-cluster strategy, taken one
step further than the single-process CPU mesh: REAL multi-process
jax.distributed with Gloo cross-process collectives, 4 virtual CPU devices
per process -> an 8-device global mesh spanning two OS processes, the
DCN-analog boundary).

Launched by tests/test_multihost.py as:
    python tests/multihost_worker.py <process_id> <coordinator_port> <out>

Runs the production sharded solvers (column FISTA + column BCD) on the
GLOBAL mesh through init_multihost + solve_sharded, allgathers the
solution, and writes process-0 results to <out> as JSON.
"""

import json
import os
import sys

# subprocess: conftest's sys.path bootstrap does not apply, and on a fresh
# VM the package may not be pip-installed yet — insert the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out = sys.argv[3]
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")

    # init BEFORE any device query (init_multihost docstring)
    from convex_optimization_tpu.parallel.mesh import init_multihost

    init_multihost(coordinator_address=f"127.0.0.1:{port}",
                   num_processes=2, process_id=pid)

    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    from convex_optimization_tpu.core.datagen import make_lasso_instance
    from convex_optimization_tpu.parallel.mesh import make_mesh
    from convex_optimization_tpu.parallel.sharded import solve_sharded

    # identical instance on every process (same key -> same host bytes)
    inst = make_lasso_instance(jax.random.PRNGKey(11), 64, 256)
    mesh = make_mesh(8)

    results = {}
    for method in ("fista", "bcd"):
        res = solve_sharded(inst.problem, method=method, mesh=mesh,
                            tol=1e-5, max_iters=400, gap_every=5,
                            block_size=16)
        x_full = np.asarray(
            multihost_utils.process_allgather(res.x, tiled=True))
        results[method] = {
            "rel_gap": float(res.rel_gap),
            "converged": bool(res.converged),
            "iterations": int(res.iterations),
            "x": x_full.tolist(),
        }
    if pid == 0:
        with open(out, "w") as f:
            json.dump(results, f)
    # all processes must reach the end together (collectives in both)
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
