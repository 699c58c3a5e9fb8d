"""Utilities (cross-cutting): structured metrics, checkpoint/resume, timing."""
