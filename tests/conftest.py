import os

# Run the test-suite on a virtual 8-device CPU mesh: multi-chip sharding is
# validated without TPU hardware (the driver separately dry-runs the
# multi-chip path), and CPU float64 is available for verification runs.
#
# NOTE: the JAX_PLATFORMS env var is not sufficient in this environment (the
# axon TPU plugin still registers); jax.config.update is authoritative.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
