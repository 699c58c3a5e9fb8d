"""Reproduce + diagnose the post-relay host-gather stall (r5 open item).

Every r5 hardware polish paid 20-30x on its host column gather (53 MB/s
on the NATIVE path vs 1.5 GB/s quiet — bench 5.4 s/281 MB, config-4
22 s/1.18 GB, admm 11 s/281 MB), which is now the single largest avoidable
term in the certified headline.  Hypotheses:

  H1  relay-client background threads descheduling us (1-core host)
      -> thread-CPU << wall, involuntary context switches high
  H2  page-fault/THP-compaction storm faulting in the fresh output buffer
      -> thread-CPU ~= wall, minor faults ~ output pages, low ctx switches

Protocol: quiet-host gather baseline; then ONE tiny relay program (enough
to start the client's background machinery); gather again; then a solve-
sized device program on an uploaded 2 GB operand; gather again.  Each
gather prints wall / thread-CPU / minor-fault / ctx-switch deltas plus the
process thread count.

Run: python scripts/probe_gather_stall.py    (needs the relay)
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setswitchinterval(0.001)

import numpy as np

M = int(os.environ.get("GS_M", 10_000))
N = int(os.environ.get("GS_N", 50_000))       # 2 GB f32 host matrix
K = int(os.environ.get("GS_K", 7_000))        # gathered columns (280 MB)

_T0 = time.perf_counter()


def tick(msg):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def nthreads():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("Threads:"):
                return int(line.split()[1])
    return -1


def timed_gather(label, A, idx, results):
    from convex_optimization_tpu.utils import native

    ru0 = resource.getrusage(resource.RUSAGE_THREAD)
    c0, w0 = time.thread_time(), time.perf_counter()
    out = native.gather_cols(A, idx, np.float32)
    w1, c1 = time.perf_counter(), time.thread_time()
    ru1 = resource.getrusage(resource.RUSAGE_THREAD)
    assert out is not None, "native gather unavailable"
    mb = out.nbytes / 1e6
    row = {
        "wall_s": round(w1 - w0, 3),
        "cpu_s": round(c1 - c0, 3),
        "mb_s": round(mb / (w1 - w0), 1),
        "minflt": ru1.ru_minflt - ru0.ru_minflt,
        "nivcsw": ru1.ru_nivcsw - ru0.ru_nivcsw,   # involuntary
        "nvcsw": ru1.ru_nvcsw - ru0.ru_nvcsw,      # voluntary
        "threads": nthreads(),
    }
    results[label] = row
    tick(f"{label}: {row}")
    del out


def main():
    from convex_optimization_tpu.utils import native

    results = {}
    rng = np.random.default_rng(0)
    idx = np.sort(rng.choice(N, size=K, replace=False))

    A = native.gaussian((N, M), seed=1).T       # F-order, like datagen
    tick(f"host A ready ({A.nbytes/1e9:.1f} GB, F={A.flags.f_contiguous})")

    timed_gather("quiet_before_jax", A, idx, results)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_co_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    assert jax.devices()[0].platform == "tpu"

    timed_gather("after_jax_import", A, idx, results)

    # one tiny relay program (starts the client's exec machinery + pays
    # the per-process warm-up)
    h = jax.jit(lambda v: v + 1.0)(jnp.zeros((8, 128), jnp.float32))
    _ = float(h[0, 0])
    tick("tiny relay program done")
    timed_gather("after_tiny_program", A, idx, results)

    # upload the 2 GB operand and run a real device program over it
    A_dev = jnp.asarray(A)
    s = float(jnp.sum(A_dev[:, :8]))            # forces upload completion
    tick(f"2 GB upload + touch done (s={s:.3f})")
    timed_gather("after_big_upload", A, idx, results)

    f = jax.jit(lambda a: (a * 1.000001).sum(axis=1))
    r = f(A_dev)
    _ = float(r[0])
    r2 = f(A_dev * 1.0)                          # second exec, new operand
    _ = float(r2[0])
    tick("solve-sized device programs done")
    timed_gather("after_big_program", A, idx, results)
    time.sleep(5)                                # let any client threads idle
    timed_gather("after_5s_idle", A, idx, results)

    print(json.dumps({"row": "gather_stall_probe", "m": M, "n": N, "k": K,
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
