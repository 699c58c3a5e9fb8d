"""Penalty (model) families: the nonsmooth part ``g`` of the composite objective.

Capability contract (SURVEY.md section 2.1, components C1/C9/C10): lasso,
elastic net (via the smooth ``lam2`` term on :class:`~convex_optimization_tpu.core.problem.Problem`),
nonnegative lasso, and group lasso, each with a prox operator, a dual-norm
(for the certified duality gap), and a gap-safe screening rule.
"""

from convex_optimization_tpu.models.penalties import (
    Penalty,
    l1,
    nonneg_l1,
    group_l2,
    soft_threshold,
)

__all__ = ["Penalty", "l1", "nonneg_l1", "group_l2", "soft_threshold"]
