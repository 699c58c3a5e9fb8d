"""Slow trusted NumPy reference solver (SURVEY.md section 4.2): plain float64
proximal gradient with a tiny step, no acceleration, no tricks.  ~50 lines.
Used as the ground-truth oracle for solver-level tests."""

import numpy as np


def prox_np(v, t, kind, lam1, ngroups=0, weights=None):
    if kind == "l1":
        return np.sign(v) * np.maximum(np.abs(v) - t * lam1, 0.0)
    if kind == "nonneg_l1":
        return np.maximum(v - t * lam1, 0.0)
    if kind == "group_l2":
        vg = v.reshape(ngroups, -1)
        w = np.ones(ngroups) if weights is None else np.asarray(weights)
        gn = np.linalg.norm(vg, axis=1, keepdims=True)
        scale = np.maximum(0.0, 1.0 - t * lam1 * w[:, None] / np.maximum(gn, 1e-30))
        return (vg * scale).reshape(v.shape)
    raise ValueError(kind)


def objective_np(A, b, x, lam1, lam2, kind, ngroups=0, weights=None):
    r = A @ x - b
    smooth = 0.5 * (r @ r + lam2 * (x @ x))
    if kind in ("l1", "nonneg_l1"):
        g = lam1 * np.abs(x).sum()
    else:
        w = np.ones(ngroups) if weights is None else np.asarray(weights)
        g = lam1 * (w * np.linalg.norm(x.reshape(ngroups, -1), axis=1)).sum()
    return smooth + g


def dual_gap_np(A, b, x, lam1, lam2, kind, ngroups=0, weights=None):
    """Certified duality gap in float64 (same math as core/objective.py)."""
    r = A @ x - b
    z = -(A.T @ r) - lam2 * x
    if kind == "l1":
        dn = np.abs(z).max() / lam1
    elif kind == "nonneg_l1":
        dn = z.max() / lam1
    else:
        w = np.ones(ngroups) if weights is None else np.asarray(weights)
        dn = (np.linalg.norm(z.reshape(ngroups, -1), axis=1) / w).max() / lam1
    alpha = 1.0 / max(1.0, dn)
    rho_sq = r @ r + lam2 * (x @ x)
    primal = objective_np(A, b, x, lam1, lam2, kind, ngroups, weights)
    dual = alpha * (-(r @ b)) - 0.5 * alpha * alpha * rho_sq
    return primal - dual, primal


def solve_np(A, b, lam1, lam2=0.0, kind="l1", ngroups=0, weights=None,
             iters=200000, tol=1e-11):
    """Plain FISTA in float64, stopped on the certified relative duality gap
    — slow but trustworthy (the tol is *relative* gap, default 1e-11)."""
    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64)
    n = A.shape[1]
    L = np.linalg.norm(A, 2) ** 2 + lam2
    x = np.zeros(n)
    x_prev = x
    t = 1.0
    for k in range(iters):
        t_next = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t * t))
        y = x + ((t - 1.0) / t_next) * (x - x_prev)
        r = A @ y - b
        g = A.T @ r + lam2 * y
        x_new = prox_np(y - g / L, 1.0 / L, kind, lam1, ngroups, weights)
        # adaptive restart keeps the float64 oracle robust
        if np.dot(y - x_new, x_new - x) > 0:
            t_next = 1.0
        x_prev, x, t = x, x_new, t_next
        if k % 50 == 0:
            gap, primal = dual_gap_np(A, b, x, lam1, lam2, kind, ngroups, weights)
            if gap <= tol * max(abs(primal), 1e-300):
                break
    return x
