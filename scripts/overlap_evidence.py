"""Overlap evidence (VERDICT r2 Missing #4 / task #7): compile the
split-sweep ring-consensus BCD program on an 8-device CPU mesh, dump the
scheduled HLO, and extract the instruction-order proof that the first
half-slab's ring (collective-permute) chain is ISSUED before the second
half-slab's sweep compute — i.e. the program hands the scheduler
communication that is data-independent of the remaining compute, which is
the structural property latency hiding needs.

Artifacts written to artifacts/overlap/:
  * split_ring_bcd.hlo.txt   — full post-optimization (scheduled) HLO text
  * SUMMARY.md               — the extracted schedule slice + the check

Method notes (honesty): on XLA:CPU collectives execute synchronously, so a
wall-clock profile cannot show true concurrency here; what this artifact
proves is the SCHEDULE ORDER of the compiled program: collective-permute
ops of the first half's reduction appear strictly before dot/fusion ops of
the second half's sweep within one sweep body, and the dependency chain of
those later dots does not pass through the earlier ring ops.  On a real
multi-chip TPU slice the same program structure gives XLA's latency-hiding
scheduler the legal reordering freedom this demonstrates (the repo has one
chip; a 1-chip ring is degenerate — SURVEY.md 4.2's CPU-mesh substitution
applies, as VERDICT r2 #7 concedes).

Run: python scripts/overlap_evidence.py    (forces a CPU mesh itself)
"""

import os
import re
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convex_optimization_tpu.core.datagen import make_lasso_instance
from convex_optimization_tpu.ops.power_iter import block_spectral_norms_sq
from convex_optimization_tpu.parallel.mesh import make_mesh
from convex_optimization_tpu.parallel.sharded import (
    _state_specs,
    sharded_bcd,
)
from convex_optimization_tpu.solvers.common import SolverConfig
from convex_optimization_tpu.solvers.fista import init_state

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "overlap")


def build_program():
    """The production split-sweep ring program at CPU-mesh test scale:
    8 shards, nb_loc=4 local blocks -> split at 2, ring chunked in 2."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8)
    inst = make_lasso_instance(jax.random.PRNGKey(12), 48, 512)
    problem = inst.problem
    cfg = SolverConfig(tol=1e-5, max_iters=10, gap_every=5, block_size=16,
                      consensus="ring", unroll_checks=True)
    A = jax.device_put(problem.A, NamedSharding(mesh, P(None, "blocks")))
    b = jax.device_put(problem.b, NamedSharding(mesh, P()))
    problem = dataclasses.replace(problem, A=A, b=b)
    n_blocks = problem.n // 16
    block_L = block_spectral_norms_sq(problem.A, n_blocks)
    state0 = jax.device_put(
        init_state(problem, None, cfg),
        jax.tree.map(lambda sp: NamedSharding(mesh, sp), _state_specs(),
                     is_leaf=lambda v: isinstance(v, P)),
    )
    jfn, args = sharded_bcd(problem, block_L, state0, cfg, mesh)
    return jfn, args


def _computations(hlo: str):
    """Split HLO text into (header, [body lines]) computations."""
    comps, cur_name, cur = [], None, []
    for line in hlo.splitlines():
        if line.startswith(("%", "ENTRY ")) and line.rstrip().endswith("{"):
            cur_name, cur = line.split("(")[0].strip(), []
        elif line.startswith("}"):
            if cur_name is not None:
                comps.append((cur_name, cur))
            cur_name = None
        elif cur_name is not None:
            cur.append(line)
    return comps


def classify(line: str):
    if "collective-permute" in line:
        return "ring"
    if re.search(r"\ball-reduce\b", line):
        return "allreduce"
    if re.search(r"= .* while\(", line):
        return "sweep-while"
    if re.search(r"\bdot\(", line):
        return "dot"
    if "fusion(" in line:
        return "fusion"
    return None


def analyze(hlo: str):
    """Schedule-order analysis on the (scheduled) computation that carries
    the ring: the sweep body of the outer solve loop.  Returns the ordered
    (index, kind, name) records of that computation."""
    best = None
    for name, body in _computations(hlo):
        n_rings = sum("collective-permute" in ln for ln in body)
        if n_rings and (best is None or n_rings > best[2]):
            best = (name, body, n_rings)
    if best is None:
        return None, []
    name, body, _ = best
    records = []
    for i, line in enumerate(body):
        kind = classify(line)
        if kind:
            records.append((i, kind, line.split("=")[0].strip()))
    return name, records


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    jfn, args = build_program()
    compiled = jfn.lower(*args).compile()
    hlo = compiled.as_text()
    hlo_path = os.path.join(OUT_DIR, "split_ring_bcd.hlo.txt")
    with open(hlo_path, "w") as f:
        f.write(hlo)
    print(f"wrote {hlo_path} ({len(hlo)} bytes)")

    comp_name, records = analyze(hlo)
    rings = [r for r in records if r[1] == "ring"]
    sweeps = [r for r in records if r[1] == "sweep-while"]
    if not rings or len(sweeps) < 2:
        print(f"ERROR: rings={len(rings)} sweep-whiles={len(sweeps)} "
              f"in {comp_name}", file=sys.stderr)
        sys.exit(1)

    # The claim, checked on the schedule: the SECOND half-slab's sweep loop
    # (a while op with known_trip_count = nb_loc/2) is scheduled with
    # ring (collective-permute) ops of the FIRST half's consensus both
    # before and after it — i.e. the first half's ring chain is issued
    # before the second half computes, and is still in flight after.
    overlapped = []
    for i, (idx, _, name) in enumerate(sweeps[1:], start=1):
        before = [r for r in rings if r[0] < idx]
        after = [r for r in rings if r[0] > idx]
        if before and after:
            overlapped.append((name, len(before), len(after)))

    lines = [
        "# Overlap evidence: split-sweep ring BCD schedule",
        "",
        "Program: `sharded_bcd` with `consensus='ring'`, 8-device CPU mesh,",
        "48x512, block_size=16 (nb_loc=4 -> split at 2; ring chunked in 2;",
        "unroll_checks=True per the XLA:CPU ppermute-in-while constraint).",
        "Compiled with `jax.jit(...).lower(...).compile()`; the dumped",
        "module is `is_scheduled=true`, so instruction order within each",
        "computation IS the execution schedule.",
        "",
        f"Full HLO: `split_ring_bcd.hlo.txt` ({len(hlo)} bytes).",
        f"Analyzed computation: `{comp_name}` (the outer sweep body).",
        "",
        "## The check",
        "",
        "Each local sweep is split in two half-slabs; each half's residual",
        "delta is ring-reduced in 2 chunks of 7 collective-permute steps",
        "(8-ring).  The schedule must show the FIRST half's ring chain",
        "issued BEFORE the second half-slab's sweep loop (a `while` op,",
        "trip count 2 = its 2 column blocks) and still running after it —",
        "communication overlapped with independent compute.",
        "",
        f"* collective-permute ops in the sweep body: {len(rings)}",
        f"* half-slab sweep `while` loops: {len(sweeps)}",
    ]
    for name, nb, na in overlapped:
        lines.append(f"* `{name}` (second-half sweep) is scheduled with "
                     f"{nb} ring steps BEFORE it and {na} ring steps "
                     f"AFTER it  ✓ overlapped")
    if not overlapped:
        lines.append("* NO overlap found in the schedule")
    lines += [
        "",
        "The second half's sweep has no data dependency on the first",
        "half's ring results (the merged consensus `dr` is only consumed",
        "by the line search after both halves — `parallel/sharded.py`",
        "`sweep()`), which is what makes this schedule legal; on a real",
        "multi-chip slice the same structure lets the latency-hiding",
        "scheduler hide the ring behind the second half-sweep's kernels.",
        "",
        "## Schedule slice (sweep body, program order)",
        "",
        "```",
    ]
    first_ring = rings[0][0]
    last = max(idx for idx, _, _ in records)
    stop = min(rings[-1][0] + 2, last)
    shown = 0
    for idx, kind, name in records:
        if first_ring - 6 <= idx <= stop and shown < 70:
            lines.append(f"[{idx:5d}] {kind:11s} {name}")
            shown += 1
    lines.append("```")
    summary = "\n".join(lines) + "\n"
    with open(os.path.join(OUT_DIR, "SUMMARY.md"), "w") as f:
        f.write(summary)
    print(summary)
    ok = bool(overlapped)
    print("OVERLAP-STRUCTURE", "CONFIRMED" if ok else "NOT FOUND")
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()
