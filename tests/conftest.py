"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env before jax initializes (SURVEY §4: fake multi-host backend
via --xla_force_host_platform_device_count).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def mesh8():
    from jax.sharding import Mesh
    import numpy as np

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "model"))
