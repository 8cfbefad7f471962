"""Test configuration: force CPU with a virtual 8-device mesh.

The sharding/multi-device tests run against XLA:CPU with
``--xla_force_host_platform_device_count=8`` (the same program XLA compiles
for TPU); the driver separately validates the real multi-chip path via
``__graft_entry__.dryrun_multichip``.

Note: this environment registers an 'axon' TPU platform from
sitecustomize ignoring JAX_PLATFORMS, so we override via jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
