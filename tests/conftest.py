import os

# Tests run on a virtual 8-device CPU mesh: multi-chip sharding logic is
# validated without TPU hardware; the driver benches on the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize pins JAX_PLATFORMS=axon (TPU); force CPU for the test mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
