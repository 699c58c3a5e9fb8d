"""utils/relay warm-up: safe on any backend, idempotent, waitable."""

from convex_optimization_tpu.utils import relay


def test_warm_relay_async_idempotent_and_waitable():
    relay.warm_relay_async()
    h1 = relay._warm_handle
    assert h1 is not None
    # second call is a no-op (one warm program per process)
    relay.warm_relay_async()
    assert relay._warm_handle is h1
    # the handle resolves (on CPU the "warm-up" is just a tiny add)
    relay.warm_relay_wait()
