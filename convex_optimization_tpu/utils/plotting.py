"""Convergence plots (SURVEY.md C7: the reference driver's error-vs-
iteration matplotlib output).  Lazy matplotlib import with the Agg
backend; every entry point degrades to a no-op-with-warning when
matplotlib is missing, so the solver stack never depends on it."""

from __future__ import annotations

import sys


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception as e:                     # pragma: no cover
        print(f"plotting unavailable ({e}); skipping", file=sys.stderr)
        return None


def plot_history(history: dict, path: str, *, title: str = "") -> bool:
    """Error-vs-iteration curves from a Result.history dict (the trimmed
    per-check records): relative duality gap (log scale) and primal value.
    Returns True if the figure was written."""
    import numpy as np

    plt = _plt()
    if plt is None or "iteration" not in history:
        return False
    it = np.asarray(history["iteration"])
    if it.size == 0:
        return False
    fig, ax1 = plt.subplots(figsize=(7, 4.2))
    rel = np.maximum(np.asarray(history["rel_gap"], dtype=float), 1e-300)
    ax1.semilogy(it, rel, "o-", color="tab:blue", ms=3,
                 label="relative duality gap")
    ax1.set_xlabel("iteration / sweep")
    ax1.set_ylabel("relative duality gap", color="tab:blue")
    ax1.grid(True, which="both", alpha=0.25)
    if "primal" in history:
        ax2 = ax1.twinx()
        ax2.plot(it, np.asarray(history["primal"], dtype=float), "s--",
                 color="tab:orange", ms=3, alpha=0.7, label="primal value")
        ax2.set_ylabel("primal objective", color="tab:orange")
    if title:
        ax1.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return True


def plot_path(lambdas, gaps, iters, nnzs, path: str, *,
              title: str = "") -> bool:
    """Lambda-path summary: per-point final gap, iterations, and support
    size against lambda (log-x).  Returns True if written."""
    import numpy as np

    plt = _plt()
    if plt is None:
        return False
    lam = np.asarray(lambdas, dtype=float)
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.6))
    axes[0].loglog(lam, np.maximum(np.asarray(gaps, dtype=float), 1e-300),
                   "o-")
    axes[0].set_xlabel("lambda"); axes[0].set_ylabel("final rel gap")
    axes[1].semilogx(lam, np.asarray(iters), "o-")
    axes[1].set_xlabel("lambda"); axes[1].set_ylabel("iterations")
    axes[2].semilogx(lam, np.asarray(nnzs), "o-")
    axes[2].set_xlabel("lambda"); axes[2].set_ylabel("nnz")
    for ax in axes:
        ax.grid(True, which="both", alpha=0.25)
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return True

def plot_cv(lambdas, mean_mse, se_mse, best_lambda, one_se_lambda,
            path: str, *, title: str = "") -> bool:
    """CV curve: mean held-out MSE ± 1 SE against lambda (log-x), with the
    MSE-minimizing and 1-SE-rule choices marked.  Returns True if written."""
    import numpy as np

    plt = _plt()
    if plt is None:
        return False
    lam = np.asarray(lambdas, dtype=float)
    mu = np.asarray(mean_mse, dtype=float)
    se = np.asarray(se_mse, dtype=float)
    fig, ax = plt.subplots(figsize=(7, 4.2))
    ax.errorbar(lam, mu, yerr=se, fmt="o-", ms=4, capsize=3,
                color="tab:blue", ecolor="tab:blue", alpha=0.85,
                label="held-out MSE (mean ± 1 SE)")
    ax.set_xscale("log")
    ax.axvline(best_lambda, color="tab:green", ls="--",
               label=f"min MSE (λ={best_lambda:.3g})")
    if one_se_lambda != best_lambda:
        ax.axvline(one_se_lambda, color="tab:orange", ls=":",
                   label=f"1-SE rule (λ={one_se_lambda:.3g})")
    ax.set_xlabel("lambda")
    ax.set_ylabel("validation MSE")
    ax.grid(True, which="both", alpha=0.25)
    ax.legend()
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return True
