"""Test configuration.

Tests run on a virtual multi-device CPU platform (8 host devices) so sharding
tests exercise real meshes without TPU hardware.  Env vars must be set before
jax initialises its backends, hence this sits at conftest import time.

NOTE (this build environment): run tests with the axon TPU plugin disabled —
``env -u PYTHONPATH python -m pytest tests/ -x -q`` — otherwise every compile
is routed through the remote-TPU tunnel.
"""

import os

# Force CPU for tests (override e.g. a JAX_PLATFORMS=axon baked into the
# image); export RSOCCER_TEST_PLATFORM to test on other platforms.
os.environ["JAX_PLATFORMS"] = os.environ.get("RSOCCER_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_default_matmul_precision", "highest")
