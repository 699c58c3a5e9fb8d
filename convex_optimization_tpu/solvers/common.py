"""Shared solver plumbing: static config, jittable state, and the fixed-size
convergence history (the framework's version of the reference's
error-vs-iteration arrays, SURVEY.md C5/C7 — recorded inside jit into a
preallocated buffer, no host round-trips).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static solver knobs (hashable; close over it or pass as a static arg)."""

    max_iters: int = 2000
    tol: float = 1e-6          # relative duality-gap target (the 1e-6 grade)
    gap_every: int = 10        # convergence check cadence (iters or sweeps)
    momentum: bool = True      # FISTA (True) vs ISTA (False)
    adaptive_restart: bool = True
    block_size: int = 256      # BCD column-block width
    step_scale: float = 1.0    # BCD step damping (Jacobi-across-chips safety)
    use_pallas: bool = False   # BCD: fused Pallas sweep vs jnp oracle sweep
    screen_every: int = 0      # 0 = screening off; else re-screen cadence
    stall_checks: int = 0      # 0 = off; else exit after this many gap
                               # checks without a new best rel_gap (f32
                               # noise-floor detection, see solvers/polish.py)
    consensus: str = "psum"    # sharded residual consensus: "psum" (one
                               # fused all-reduce), "ring" (ppermute ring,
                               # overlapped with the second half-sweep), or
                               # "reduce_scatter" (reduce-scatter +
                               # all-gather, the Ulysses/all-to-all layout
                               # swap) — parallel/collectives.py
    unroll_checks: bool = False  # sharded solvers: statically unroll the
                               # check loop instead of lax.while_loop.  Use
                               # with SMALL max_iters only.  Exists because
                               # XLA:CPU aborts on ppermute inside a
                               # while_loop body, so the ring-consensus path
                               # can only be validated on a CPU mesh this way

    @property
    def max_checks(self) -> int:
        # ceil: the loop body always completes a full gap_every batch, so
        # the last check lands at ceil(max_iters/gap_every)*gap_every;
        # floor division dropped the final record when gap_every did not
        # divide max_iters
        return -(-self.max_iters // self.gap_every) + 1


class History(NamedTuple):
    """Fixed-shape convergence history recorded at gap checks."""

    iteration: jax.Array  # (max_checks,) int32
    primal: jax.Array     # (max_checks,)
    dual: jax.Array       # (max_checks,)
    gap: jax.Array        # (max_checks,)
    rel_gap: jax.Array    # (max_checks,)
    nnz: jax.Array        # (max_checks,) int32 — support size at check
    count: jax.Array      # () int32 — number of valid records

    @staticmethod
    def empty(max_checks: int, dtype=jnp.float32) -> "History":
        # inf, NOT nan: unfilled slots are never read (trimmed() cuts by
        # count), but the fill value still travels through multi-process
        # device_put, whose cross-process equality check treats NaN != NaN
        # and aborts the whole multi-host solve (found by
        # tests/test_multihost.py's 2-process simulation)
        f = jnp.full((max_checks,), jnp.inf, dtype=dtype)
        return History(
            iteration=jnp.zeros((max_checks,), jnp.int32),
            primal=f, dual=f, gap=f, rel_gap=f,
            nnz=jnp.zeros((max_checks,), jnp.int32),
            count=jnp.zeros((), jnp.int32),
        )

    def record(self, iteration, primal, dual, gap, rel_gap, nnz) -> "History":
        i = self.count
        return History(
            iteration=self.iteration.at[i].set(iteration.astype(jnp.int32)),
            primal=self.primal.at[i].set(primal),
            dual=self.dual.at[i].set(dual),
            gap=self.gap.at[i].set(gap),
            rel_gap=self.rel_gap.at[i].set(rel_gap),
            nnz=self.nnz.at[i].set(nnz.astype(jnp.int32)),
            count=i + 1,
        )

    def trimmed(self) -> dict:
        """Host-side: dict of numpy arrays cut to the valid prefix."""
        import numpy as np

        c = int(self.count)
        return {
            "iteration": np.asarray(self.iteration[:c]),
            "primal": np.asarray(self.primal[:c]),
            "dual": np.asarray(self.dual[:c]),
            "gap": np.asarray(self.gap[:c]),
            "rel_gap": np.asarray(self.rel_gap[:c]),
            "nnz": np.asarray(self.nnz[:c]),
        }


class SolveState(NamedTuple):
    """Generic solver carry for while_loop-based solvers."""

    x: jax.Array
    r: jax.Array          # A x - b, maintained incrementally or refreshed
    x_prev: jax.Array
    r_prev: jax.Array
    t_mom: jax.Array      # FISTA momentum scalar
    k: jax.Array          # iteration counter (int32)
    rel_gap: jax.Array    # most recent relative duality gap
    gap: jax.Array
    primal: jax.Array
    keep_mask: jax.Array  # (n,) bool screening mask (all True if unused)
    history: History
    best_rel_gap: jax.Array  # best rel_gap seen at any check
    stall: jax.Array         # consecutive checks without improvement (int32)
    x_best: jax.Array        # iterate at the best check (returned on stall:
    best_gap: jax.Array      # the LAST iterate of an oscillating f32 solve
    best_primal: jax.Array   # can be 2x further from optimum than the best)


def count_nnz(x: jax.Array) -> jax.Array:
    return jnp.sum(x != 0).astype(jnp.int32)


def record_check(state: SolveState, info, x_for_best: jax.Array,
                 nnz: jax.Array, keep: jax.Array) -> SolveState:
    """Shared gap-check bookkeeping for every while_loop solver: history
    record, screening mask, stall counter, and best-iterate tracking.  The
    callers differ only in how the GapInfo partials are REDUCED (local /
    psum / pmax) — that stays with them; this keeps the state-update logic
    in exactly one place (it previously diverged across five copies)."""
    hist = state.history.record(state.k, info.primal, info.dual, info.gap,
                                info.rel_gap, nnz)
    improved = info.rel_gap < state.best_rel_gap
    return state._replace(
        rel_gap=info.rel_gap, gap=info.gap, primal=info.primal,
        history=hist, keep_mask=keep,
        best_rel_gap=jnp.minimum(info.rel_gap, state.best_rel_gap),
        stall=jnp.where(improved, 0, state.stall + 1),
        x_best=jnp.where(improved, x_for_best, state.x_best),
        best_gap=jnp.where(improved, info.gap, state.best_gap),
        best_primal=jnp.where(improved, info.primal, state.best_primal),
    )
