"""Checkpoint / resume (SURVEY.md section 5).

Solver state is tiny and deterministic — ``(x, lam1, lam_index, rng_seed)``
plus config — so recovery is snapshot + warm start (the lasso warm start IS
the elastic-recovery mechanism here; SURVEY.md 'failure detection' row).
Plain ``np.savez`` keeps the artifact portable and dependency-free; the
residual is NOT saved (recomputed exactly as r = A x - b on restore, which
also heals any incremental-update drift across the failure boundary).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import NamedTuple, Optional

import numpy as np


class Snapshot(NamedTuple):
    x: np.ndarray           # (n,) iterate
    lam1: float             # current regularization
    lam_index: int          # position in the lambda path (-1: single solve)
    iteration: int          # iterations already spent at this lam1
    meta: dict              # free-form (config echo, problem sizes, seed)


def save_snapshot(path: str, x, lam1: float, *, lam_index: int = -1,
                  iteration: int = 0, meta: Optional[dict] = None) -> None:
    """Atomic snapshot write (tmp file + rename — kill-safe)."""
    x = np.asarray(x)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(
                f,
                x=x,
                lam1=np.float64(lam1),
                lam_index=np.int64(lam_index),
                iteration=np.int64(iteration),
                meta=np.frombuffer(
                    json.dumps(meta or {}).encode(), dtype=np.uint8),
            )
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_snapshot(path: str) -> Snapshot:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode() or "{}")
        return Snapshot(
            x=z["x"],
            lam1=float(z["lam1"]),
            lam_index=int(z["lam_index"]),
            iteration=int(z["iteration"]),
            meta=meta,
        )


def resume_solve(problem, path: str, **solve_kwargs):
    """Restore a snapshot and continue solving the SAME problem at the
    snapshot's lam1 (warm start).  Returns api.Result."""
    from convex_optimization_tpu.api import solve
    import jax.numpy as jnp

    snap = load_snapshot(path)
    problem = problem.with_lam1(snap.lam1)
    x0 = jnp.asarray(snap.x, dtype=problem.dtype)
    return solve(problem, x0=x0, **solve_kwargs)
