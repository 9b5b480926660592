"""Test env: hermetic CPU backend with 8 virtual devices (SURVEY.md §5.2.3).

Pallas kernels run in interpreter mode on CPU (the 'sanitizer' path,
SURVEY.md §6); the same shard_map code path exercises the multi-host
contract without a TPU slice. Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
