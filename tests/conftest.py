"""Test harness: run JAX on a virtual 8-device CPU mesh.

Replaces the reference's "launch N ranked processes" non-strategy
(reference train.py:97-103) with JAX's standard fake-multi-chip mechanism
so distributed code paths are exercised in CI on CPU.

NOTE: this environment ships an 'axon' TPU PJRT plugin that force-appends
itself to jax_platforms during registration, overriding JAX_PLATFORMS=cpu.
We pin the platform via jax.config *after* import, which wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compile cache: repeated suite runs (and the subprocess CLI
# tests) skip XLA recompilation of identical programs.
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
