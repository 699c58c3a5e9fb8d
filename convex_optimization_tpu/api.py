"""User-facing API (L5): ``solve(problem, method=...) -> Result``.

The reference's user surface is "run the driver script" (SURVEY.md section
3.1); this framework exposes a library call that picks the solver, handles
Lipschitz precompute, runs the single jitted solve, and returns a Result
with the solution, the certified gap, and the convergence history.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp

from convex_optimization_tpu.core.problem import Problem
from convex_optimization_tpu.solvers.common import SolverConfig
# importlib: the solvers package re-exports functions named `fista`/`bcd`
# that shadow the submodule attributes, so a plain `from ... import fista`
# would bind the jitted function, not the module
import importlib

fista_mod = importlib.import_module("convex_optimization_tpu.solvers.fista")
bcd_mod = importlib.import_module("convex_optimization_tpu.solvers.bcd")
from convex_optimization_tpu.ops.power_iter import (
    spectral_norm_sq,
    block_spectral_norms_sq,
)


# ADMM scale fence: above this min(m, n) the f32 device eigh of an
# ill-conditioned Gram stalls the solve ~1e-2 rel gap (BASELINE.md,
# measured round 1).  Module constant so tests can exercise the fence
# without a real >4096-dim eigendecomposition on the 1-core host.
ADMM_FENCE_DIM = 4096


@dataclasses.dataclass
class Result:
    x: jax.Array
    gap: float               # absolute duality gap at the last check
    rel_gap: float           # relative duality gap (the convergence criterion)
    primal: float
    iterations: int          # FISTA iterations or BCD sweeps
    converged: bool
    wall_time_s: float       # solve wall-clock (excludes compilation)
    compile_time_s: float
    iters_per_sec: float
    history: dict            # trimmed convergence history (numpy arrays)
    method: str
    config: SolverConfig
    # iteration count of the PERTURBED timed run whose wall clock is
    # wall_time_s (it can stop at an earlier/later stall boundary than
    # `iterations`); iters_per_sec is derived from THIS count so the
    # (count, wall) pair is physically consistent.  0 where no separate
    # timed run exists (sharded/admm/ws paths time the primary run).
    timed_iterations: int = 0

    @property
    def nnz(self) -> int:
        return int(jnp.sum(self.x != 0))


def _pad_columns(problem: Problem, pad: int) -> Problem:
    """Append ``pad`` zero columns to A (one-time device copy).  The padded
    coordinates are provably zero at any optimum (zero columns), and the
    callers additionally freeze them via the solver keep mask."""
    import dataclasses

    import jax.numpy as jnp

    A = jnp.pad(problem.A, ((0, 0), (0, pad)))
    pen = problem.penalty
    if pen.kind == "group_l2":
        gsize = problem.n // pen.ngroups
        assert pad % gsize == 0, "padding must be whole groups"
        extra = pad // gsize
        w = pen.weights
        if w is not None:
            w = jnp.concatenate([w, jnp.ones((extra,), w.dtype)])
        pen = dataclasses.replace(pen, ngroups=pen.ngroups + extra, weights=w)
    return dataclasses.replace(problem, A=A, penalty=pen)


def _perturb_state(state, problem: Problem):
    """Equivalent solver state with fresh input bytes (defeats relay-level
    result memoization for the timed run) built WITHOUT re-running
    init_state: x is nudged by ~1e-6 in one coordinate and r (when the
    state carries one) is updated incrementally with the matching single
    column of A — so the timed run needs no A @ x matvec program (which
    costs a multi-minute XLA compile through the relay)."""
    import jax.numpy as jnp

    d = jnp.asarray(1e-6, problem.dtype)
    x_t = state.x.at[0].add(d)
    updates = dict(x=x_t)
    if hasattr(state, "r"):
        r_t = state.r + d * problem.A[:, 0]
        updates.update(r=r_t, x_prev=x_t, r_prev=r_t)
    return state._replace(**updates)


def _perturb_start(x0, problem: Problem):
    """A start equivalent to x0 but with fresh bytes (one element nudged by
    ~1e-6): defeats relay-level (program, inputs) result memoization so the
    timed run really executes.  The nudge is far below solver tolerances."""
    import jax.numpy as jnp

    base = (jnp.zeros((problem.n,), problem.dtype) if x0 is None
            else x0.astype(problem.dtype))
    return base.at[0].add(jnp.asarray(1e-6, problem.dtype))


def solve(
    problem: Problem,
    method: str = "fista",
    *,
    x0: Optional[jax.Array] = None,
    cfg: Optional[SolverConfig] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    certify: bool = False,
    **cfg_overrides: Any,
) -> Result:
    """Solve a composite problem.
    method: 'fista' | 'ista' | 'bcd' | 'bcd_pallas' | 'admm' |
    'fista_ws' | 'bcd_ws' (working-set outer loop, solvers/working_set.py).

    When ``mesh`` is given, the sharded solver matching the mesh's axis
    names is used (see parallel/); otherwise everything runs on the default
    device.  ``certify=True`` finishes with the f64 polish phase whenever
    the f32 solve stalls above tol, so Result.rel_gap is an f64-grade
    certificate (solvers/polish.py).  Extra kwargs override SolverConfig
    fields (e.g. tol=1e-8, max_iters=5000).
    """
    if mesh is not None:
        from convex_optimization_tpu.parallel.sharded import solve_sharded

        res = solve_sharded(problem, method=method, mesh=mesh, x0=x0,
                            cfg=cfg, **cfg_overrides)
        return _maybe_certify(problem, res, certify)

    if cfg is None:
        cfg = SolverConfig()
    if method == "ista":
        cfg_overrides.setdefault("momentum", False)
    if method == "bcd_pallas":
        cfg_overrides.setdefault("use_pallas", True)
    admm_force = bool(cfg_overrides.pop("admm_force", False))
    admm_setup_mode = cfg_overrides.pop("admm_setup", "device")
    if cfg_overrides:
        cfg = dataclasses.replace(cfg, **cfg_overrides)

    if method in ("fista_ws", "bcd_ws"):
        from convex_optimization_tpu.solvers.working_set import (
            make_ws_route,
            solve_working_set,
        )

        inner = "bcd" if method == "bcd_ws" else "fista"
        # same honest-timing protocol as the other branches: the first run
        # pays route setup + every bucket compile and is the RETURNED
        # result; the second runs from a perturbed equivalent start (fresh
        # input bytes defeat relay memoization) with all programs cached —
        # its wall is the steady-state solve time, and the difference is
        # the compile/setup cost.
        t0 = time.perf_counter()
        route = make_ws_route(problem)
        x_ws, info, meta = solve_working_set(problem, cfg, x0=x0,
                                             inner=inner, route=route)
        t1 = time.perf_counter()
        if jax.default_backend() == "tpu":
            # relay memoization can fake the second run's clock only on the
            # relay-backed TPU path; elsewhere (CPU tests, CI) the repeat
            # solve is pure cost — skip it and time the first run (ADVICE r3)
            x0_t = _perturb_start(x0, problem)
            _, _, meta_t = solve_working_set(problem, cfg, x0=x0_t,
                                             inner=inner, route=route)
            wall, timed_n = meta_t["wall_s"], meta_t["inner_iters"]
        else:
            wall, timed_n = meta["wall_s"], meta["inner_iters"]
        history = dict(meta)
        # disambiguate from Result.wall_time_s (the timed second run)
        history["first_run_wall_s"] = history.pop("wall_s")
        res = Result(
            x=x_ws, gap=float(info.gap), rel_gap=float(info.rel_gap),
            primal=float(info.primal), iterations=meta["inner_iters"],
            converged=bool(info.rel_gap <= cfg.tol), wall_time_s=wall,
            compile_time_s=max((t1 - t0) - wall, 0.0),
            iters_per_sec=(timed_n / wall if wall > 0 else 0.0),
            history=history,
            method=method, config=cfg,
            timed_iterations=timed_n,
        )
        return _maybe_certify(problem, res, certify)

    col_norms = problem.col_norms() if cfg.screen_every > 0 else None
    orig_n = problem.n  # the bcd_pallas branch may zero-pad columns
    user_problem = problem  # unpadded view, for the certify phase

    # Each branch yields the jitted fn, a make_state builder (so the timed
    # run can start from fresh input bytes), and the arg tuple shape.
    if method in ("fista", "ista"):
        # kernel routing (same rationale as the bcd branch): with a
        # pad-free VPU-eligible layout and HBM room for the A_t copy,
        # every matvec in the FISTA program (steps, witness, and the
        # power iteration for L) runs as a Pallas kernel — seconds of
        # relay compile instead of minutes of XLA-dot compiles
        A_t_f = None
        from convex_optimization_tpu.ops.bcd_sweep_vpu import (
            fits_hbm,
            pick_padded_block_size_vpu,
            to_tblock_major,
        )

        # dtype-gated (round-3 fix): f64 problems must NOT route into the
        # f32-only VPU kernels (hard-coded f32 VMEM scratch dies at trace
        # time); pick_padded_block_size_vpu returns None for non-f32.
        # Backend-gated too: this routing exists to turn minutes of relay
        # compile into seconds on TPU; on CPU the interpret-mode kernels
        # are pure overhead AND their power-iteration L differs slightly
        # from spectral_norm_sq's, breaking sharded/unsharded history
        # equivalence (tests/test_sharding.py).
        picked = None
        if jax.default_backend() == "tpu":
            picked = pick_padded_block_size_vpu(problem.m, problem.n, 128,
                                                dtype=problem.dtype)
        # A + the hoisted A_t copy must both stay resident
        if (picked is not None and picked[1] == 0
                and fits_hbm(problem.m, problem.n, problem.dtype, copies=2)):
            from convex_optimization_tpu.ops.matvec_pallas import (
                spectral_norm_sq_t,
            )

            A_t_f = to_tblock_major(problem.A, problem.n // picked[0])
            # jit the whole power iteration: eagerly it would dispatch
            # ~100 kernel calls through the relay one RPC at a time
            L_total = jax.jit(
                lambda a: spectral_norm_sq_t(a))(A_t_f) + problem.lam2
        else:
            L_total = spectral_norm_sq(problem.A) + problem.lam2
        make_state = lambda x: fista_mod.init_state(problem, x, cfg)
        jfn = fista_mod.fista
        jargs = lambda s: (problem, L_total, s, cfg, col_norms, A_t_f)
    elif method in ("bcd", "bcd_pallas"):
        multiple = 1
        if problem.penalty.kind == "group_l2":
            multiple = problem.n // problem.penalty.ngroups
        solve_problem, bs, base_mask = problem, None, None
        if cfg.use_pallas:
            from convex_optimization_tpu.ops.bcd_sweep_pallas import (
                pick_padded_block_size,
            )
            from convex_optimization_tpu.ops.bcd_sweep_pallas_tiled import (
                pick_padded_block_size_tiled,
            )
            from convex_optimization_tpu.ops.bcd_sweep_vpu import (
                pick_padded_block_size_vpu,
            )

            # preference order = measured per-sweep speed: transposed VPU
            # (1 HBM read, ~531 GB/s at 10k x 100k) > MXU resident (1 read,
            # HIGHEST-bound) > m-tiled (2 reads, MXU-6-pass-bound).
            # dtype gate (round 3, mirrors the fista branch): every kernel
            # family is f32-only — an f64 problem must not pick a block /
            # materialize a padded copy for kernels that then reject it
            # and silently fall to the oracle
            picked = None
            if jnp.dtype(problem.dtype) == jnp.float32:
                picked = (pick_padded_block_size_vpu(
                              problem.m, problem.n, cfg.block_size,
                              multiple, dtype=problem.dtype)
                          or pick_padded_block_size(problem.m, problem.n,
                                                    cfg.block_size,
                                                    multiple)
                          or pick_padded_block_size_tiled(
                              problem.m, problem.n, cfg.block_size,
                              multiple))
            if picked is not None:
                bs, pad = picked
                if pad:
                    # zero-column padding to a multiple of the fused
                    # kernel's 128-aligned block (padded coordinates are
                    # frozen at 0 via the keep mask and sliced off the
                    # returned solution)
                    solve_problem = _pad_columns(problem, pad)
                    base_mask = jnp.arange(solve_problem.n) < problem.n
                    if x0 is not None:
                        x0 = jnp.pad(x0, (0, pad))
                    if col_norms is not None:
                        col_norms = solve_problem.col_norms()
        if bs is None:
            bs = bcd_mod.pick_block_size(problem.n, cfg.block_size,
                                         multiple_of=multiple)
        n_blocks = solve_problem.n // bs
        A_t = None
        if cfg.use_pallas:
            from convex_optimization_tpu.ops.bcd_sweep_vpu import (
                eligible_vpu,
                fits_hbm,
                to_tblock_major,
            )

            # HBM guard: the hoisted A_t is a persistent full-size buffer
            # next to A (and, when padding was needed, the padded copy) —
            # 3 copies of a 4 GB matrix OOM a 16 GB chip (measured)
            copies = 2 if solve_problem is problem else 3
            if (fits_hbm(solve_problem.m, solve_problem.n,
                         solve_problem.dtype, copies=copies)
                    and eligible_vpu(solve_problem.m, solve_problem.n,
                                     bs, solve_problem.dtype)):
                from convex_optimization_tpu.ops.matvec_pallas import (
                    block_power_t,
                )

                # one-time transposed relayout (outside the solve program)
                # + per-block Lipschitz via the in-kernel power iteration:
                # one pass over A, and — decisively on the relay — a
                # seconds-scale compile where the batched-einsum power
                # iteration and any XLA-dot-bearing program cost minutes
                A_t = to_tblock_major(solve_problem.A, n_blocks)
                block_L = block_power_t(A_t)
        if A_t is None:
            block_L = block_spectral_norms_sq(solve_problem.A, n_blocks)
        make_state = lambda x: fista_mod.init_state(solve_problem, x, cfg,
                                                    keep_mask=base_mask)
        jfn = bcd_mod.bcd
        jargs = lambda s: (solve_problem, block_L, s, cfg, col_norms, A_t)
        problem = solve_problem  # for _perturb_start sizing below
    elif method == "admm":
        from convex_optimization_tpu.solvers import admm as admm_mod

        # Documented scale fence (BASELINE.md): the exact x-update rests on
        # an f32 eigh of the min(m,n)-dim Gram; beyond ~4k dims the f32
        # eigenbasis of an ill-conditioned Gram is inaccurate enough that
        # the solve stalls near 1e-2 relative gap (measured 10k x 100k,
        # round 1) while silently burning max_iters.  Pass admm_force=True
        # to run anyway (e.g. for well-conditioned A or loose tolerances),
        # or admm_setup='host' for the host-f64 eigendecomposition path
        # (admm_setup_host: f32 loop unchanged, f64-accurate eigenbasis).
        # The host-setup exemption is MEASURED at scale (r5 battery,
        # scripts/measure_admm_scale.py, 10k x 100k): solve 6.3 s /
        # 490 iters, f64 polish certifies 4.9e-7 — the f32 gap MONITOR
        # still reads ~1.3e-2 at that scale (an f32-witness artifact, not
        # a stall: the iterate itself is 1e-6-grade), so certification
        # must come from the polish phase, as solve() does by default.
        if (min(problem.m, problem.n) > ADMM_FENCE_DIM and not admm_force
                and admm_setup_mode != "host"):
            import warnings

            warnings.warn(
                "admm at min(m, n) > 4096 stalls ~1e-2 rel gap (f32 eigh "
                "accuracy; see BASELINE.md) — falling back to FISTA. "
                "Pass admm_force=True to run ADMM anyway, or "
                "admm_setup='host' for the host-f64 eigh setup.",
                stacklevel=2)
            return solve(problem, "fista", x0=x0, cfg=cfg, mesh=mesh,
                         certify=certify)
        fac = (admm_mod.admm_setup_host(problem)
               if admm_setup_mode == "host"
               else admm_mod.admm_setup(problem))
        make_state = lambda x: admm_mod.init_state(problem, x, cfg)
        jfn = admm_mod.admm
        jargs = lambda s: (problem, fac, s, cfg)
    elif method == "bcd_batch":
        raise ValueError(
            "method 'bcd_batch' solves a LAMBDA GRID, not a single point — "
            "use lambda_path(problem, cfg, method='bcd_batch') or the CLI's "
            "--method bcd_batch --lambda-path N")
    else:
        raise ValueError(f"unknown method {method!r}")

    # Timing protocol (calibrated against the axon TPU relay, where naive
    # patterns read out garbage):
    #  * a traced-jit call + block_until_ready blocks correctly and is
    #    reproducible; AOT lowered/compiled executions do NOT block (the
    #    wait silently moves to the first value fetch) — so time the
    #    traced call, never the AOT path;
    #  * identical (program, inputs) executions can be memoized by the
    #    relay (a repeat run reads ~0s) — so the timed run starts from a
    #    minutely perturbed, equivalent initial state: same problem,
    #    fresh input bytes.
    # The warm call pays compile + one untimed execution and is discarded;
    # the timed run's result is what gets returned.
    t0 = time.perf_counter()
    state0 = make_state(x0)
    final = jfn(*jargs(state0))
    # value fetch: the only reliable completion barrier here.  This is also
    # the iteration count REPORTED: it must correspond to the returned
    # solution (the perturbed timed run below can cross a gap-check/stall
    # boundary and finish with a different count — ADVICE r1).
    iters = int(final.k)
    t1 = time.perf_counter()
    # timed run: same solve from a minutely perturbed start — used ONLY for
    # the wall clock (the returned result is the unperturbed first run, so
    # the nudge can never leak into the solution)
    state_t = _perturb_state(state0, problem)
    jax.block_until_ready(state_t.x)
    t2 = time.perf_counter()
    timed = jfn(*jargs(state_t))
    # barrier INSIDE the timed window: block_until_ready silently no-ops on
    # relay-backed cached-executable executions, a value fetch cannot.
    # The fetched count is ALSO recorded: it is the iteration count that
    # matches wall_time_s (the perturbed run can exit at a different
    # stall boundary than the first run — VERDICT r2 Weak #2), so it/s and
    # any bandwidth derived from it must use THIS count, not `iters`.
    timed_iters = int(timed.k)
    t3 = time.perf_counter()

    wall = t3 - t2
    # return the BEST-certified iterate: an f32 solve oscillates at its
    # noise floor, and the last check can read ~2x worse than the best
    x_out = final.x_best
    res = Result(
        x=x_out if x_out.shape[0] == orig_n else x_out[:orig_n],
        gap=float(final.best_gap),
        rel_gap=float(final.best_rel_gap),
        primal=float(final.best_primal),
        iterations=iters,
        converged=bool(final.best_rel_gap <= cfg.tol),
        wall_time_s=wall,
        compile_time_s=max(t1 - t0 - wall, 0.0),
        iters_per_sec=timed_iters / wall if wall > 0 else float("inf"),
        history=final.history.trimmed(),
        method=method,
        config=cfg,
        timed_iterations=timed_iters,
    )
    return _maybe_certify(user_problem, res, certify)


def _maybe_certify(problem: Problem, res: "Result", certify: bool) -> "Result":
    """certify=True: if the f32 solve stalled above tol, finish with the f64
    polish phase and fold its certificate into the Result."""
    import dataclasses as _dc

    if not certify or (res.converged and res.rel_gap <= res.config.tol):
        return res
    from convex_optimization_tpu.solvers.polish import polish_support

    pr = polish_support(problem, res.x, tol=res.config.tol)
    # pr.x stays a float64 numpy array: casting back to the problem dtype
    # (f32) would re-introduce representation error above deep tolerances
    return _dc.replace(
        res,
        x=pr.x,
        gap=pr.gap, rel_gap=pr.rel_gap, primal=pr.primal,
        converged=pr.rel_gap <= res.config.tol,
        wall_time_s=res.wall_time_s + pr.wall_time_s,
    )
