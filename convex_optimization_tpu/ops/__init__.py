"""Compute ops (L2 kernels layer): jnp reference implementations and the
Pallas fused block-sweep kernel.  The jnp path is kept forever as the parity
oracle and the non-TPU fallback (SURVEY.md section 7.2 step 4).
"""

from convex_optimization_tpu.ops.power_iter import (
    spectral_norm_sq,
    block_spectral_norms_sq,
)
from convex_optimization_tpu.ops.bcd_sweep_ref import bcd_sweep_ref

__all__ = ["spectral_norm_sq", "block_spectral_norms_sq", "bcd_sweep_ref"]
