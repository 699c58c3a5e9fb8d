"""Axon-relay process warm-up.

Measured (scripts/probe_warmup_aot.py, r5 hardware, 2026-08-19): the
relay's first-execution tax is **per-process, not per-program** —

  * the process's FIRST program execution paid 479 s (compile itself was
    0.6 s; a 250 MB kernel-only program);
  * a SECOND, freshly-traced shape-identical program in the same process:
    first exec 0.1 s;
  * the tax does not scale with operand size and is absorbed by ANY first
    execution, including a tiny-operand program (the same-day batch-kernel
    validation paid its ~330 s tax on an m=64 program, after which an
    800 MB program's first exec was 0.9 s).

So a fire-and-forget tiny program dispatched BEFORE multi-minute host
setup (datagen, 4 GB uploads) lets the relay absorb the tax concurrently
instead of serially on the first real solve program.  JAX dispatch is
async: ``warm_relay_async()`` returns as soon as the tiny compile is done
(~1 s) and the relay pays the warm-up in the background.
"""

from __future__ import annotations

_warm_handle = None
_FAILED = object()     # sentinel: warm-up dispatch raised; don't retry


def warm_relay_async():
    """Dispatch a tiny device program without blocking on its result.

    Call once per process, right after ``import jax`` and before any
    expensive host-side setup.  Safe on any backend (CPU/TPU); exceptions
    are swallowed — this is an optimization, never a correctness step.
    Keeps a module handle to the in-flight array so it cannot be GC'd
    before the execution lands.
    """
    global _warm_handle
    if _warm_handle is not None:
        return
    try:
        import jax
        import jax.numpy as jnp

        _warm_handle = jax.jit(lambda v: v + 1.0)(
            jnp.zeros((8, 128), jnp.float32))
        # NO value fetch: fetching would block this thread for the full
        # per-process warm-up (40-500 s measured).
    except Exception:
        _warm_handle = _FAILED


def warm_relay_wait() -> None:
    """Block until the warm-up program (if any) has finished executing."""
    h = _warm_handle
    if h is not None and h is not _FAILED:
        try:
            h.block_until_ready()
            float(h[0, 0])  # value fetch: block_until_ready can no-op
        except Exception:
            pass
