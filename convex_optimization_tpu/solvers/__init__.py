"""Solver layer (L4): FISTA/ISTA proximal-gradient, block-coordinate descent,
warm-started lambda paths, and gap-safe screening (SURVEY.md C2/C9/C10/C11).
"""

from convex_optimization_tpu.solvers.common import SolverConfig, SolveState, History
from convex_optimization_tpu.solvers.fista import fista, fista_step
from convex_optimization_tpu.solvers.bcd import bcd
from convex_optimization_tpu.solvers.lambda_path import lambda_path
from convex_optimization_tpu.solvers.cv import cv_lambda_path, CVResult
from convex_optimization_tpu.solvers.screening import gap_safe_keep_mask

__all__ = [
    "SolverConfig",
    "SolveState",
    "History",
    "fista",
    "fista_step",
    "bcd",
    "lambda_path",
    "cv_lambda_path",
    "CVResult",
    "gap_safe_keep_mask",
]
