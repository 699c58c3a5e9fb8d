"""bench.py must fail fast and structured when the axon relay is down
(VERDICT r3 task 2): one JSON line with error=relay_unreachable in well
under 60 s, instead of a ~40-minute import-jax hang."""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_fails_fast_and_structured_on_dead_relay():
    env = dict(os.environ)
    # point the probe at a loopback address with nothing listening:
    # connection refused in milliseconds regardless of real relay state
    env["PALLAS_AXON_POOL_IPS"] = "127.41.42.43"
    env["JAX_PLATFORMS"] = "axon"
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO)
    wall = time.perf_counter() - t0
    assert proc.returncode == 1, proc.stderr[-500:]
    assert wall < 60, wall
    line = proc.stdout.strip().splitlines()[-1]
    row = json.loads(line)
    assert row["error"] == "relay_unreachable"
    assert row["value"] is None and row["vs_baseline"] is None
    assert row["metric"].startswith("time_to_certified_")


def test_bench_probe_gates_on_pool_ips_not_platform():
    from bench import relay_reachable

    old = dict(os.environ)
    try:
        # ADVICE r4: a dead relay hangs `import jax` even under
        # JAX_PLATFORMS=cpu while PALLAS_AXON_POOL_IPS is set — the probe
        # must fire whenever the pool IPs are configured, whatever the
        # platform string says
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["PALLAS_AXON_POOL_IPS"] = "127.41.42.43"
        assert not relay_reachable()
        os.environ["JAX_PLATFORMS"] = "axon,cpu"
        assert not relay_reachable()
        os.environ.pop("PALLAS_AXON_POOL_IPS")
        os.environ["JAX_PLATFORMS"] = "axon"
        assert relay_reachable()   # no pool IPs configured -> no gate
    finally:
        os.environ.clear()
        os.environ.update(old)
