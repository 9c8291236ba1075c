"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the way the reference validates multi-FPGA
behavior offline (udpreplay, udp/README.md) — without hardware: JAX's host
platform is split into 8 virtual devices so ``shard_map`` collectives run
for real.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments force an accelerator platform through sitecustomize;
# pin the config explicitly as well (must happen before any computation).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
