"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Sharding/parallelism tests ("multi-node without a cluster") run on virtual
CPU devices; numerical tests are device-agnostic.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var; the config update
# takes precedence and reliably pins tests to the virtual CPU devices.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def base_opt():
    """Default Pix3D options with the repo config."""
    from shapeclipper_tpu.config import options
    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "..", "options/pix3d/config.yaml"))
    opt.H, opt.W = opt.image_size
    return opt
