"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip shardings are validated on `xla_force_host_platform_device_count=8`
CPU devices (no TPU needed for unit tests); the driver separately dry-runs the
multichip path and benches on the real chip.
"""

import os

# Unit tests always run on the host CPU (the session env may point
# JAX_PLATFORMS at the real TPU; benches use it, tests must not).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
