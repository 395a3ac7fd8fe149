"""Test config: run everything on a virtual 8-device CPU mesh.

The SURVEY §4 strategy: simulate multi-device with
``--xla_force_host_platform_device_count``.  This container pre-imports
jax via sitecustomize (axon TPU plugin), so env vars alone are too late;
backends initialize lazily though, so forcing the platform via
``jax.config`` before first use works.

Set MINDREC_TEST_PLATFORM=tpu to run the suite on the real chip instead.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

if os.environ.get("MINDREC_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def mesh8():
    from jax.sharding import Mesh
    import numpy as np

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    return Mesh(np.array(devs[:8]).reshape(4, 2), ("data", "model"))
