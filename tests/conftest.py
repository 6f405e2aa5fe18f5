"""Test harness: run JAX on a virtual 8-device CPU mesh.

Replaces the reference's "launch N ranked processes" non-strategy
(reference train.py:97-103) with JAX's standard fake-multi-chip mechanism
so distributed code paths are exercised in CI on CPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
