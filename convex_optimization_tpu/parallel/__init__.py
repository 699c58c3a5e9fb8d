"""Distributed layer (L3): mesh construction, column-block sharding of A,
and residual-consensus collectives (psum / ppermute ring) under shard_map.
See SURVEY.md section 2.2/2.3 — this subsystem replaces nothing in the
reference (which is single-process, single-GPU) and is designed TPU-first.
"""
