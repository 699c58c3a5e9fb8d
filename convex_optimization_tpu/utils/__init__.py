"""Utilities (cross-cutting): structured metrics + HBM bandwidth meter,
atomic checkpoint/resume, and ctypes bindings for the native host runtime."""

from convex_optimization_tpu.utils import checkpoint, metrics, native

__all__ = ["checkpoint", "metrics", "native"]
