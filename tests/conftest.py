"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4: emulated-mesh testing via
xla_force_host_platform_device_count). The axon sitecustomize in this
environment force-selects the TPU backend via jax.config, so we both set the
env vars (before backend init) AND override the config back to cpu.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    devices = jax.devices()
    assert devices[0].platform == "cpu", f"tests must run on CPU, got {devices[0]}"
    assert len(devices) == 8, f"expected 8 virtual CPU devices, got {len(devices)}"
    yield


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def demo_scene_path():
    path = "/root/reference/data/S2A_MSIL1C_20170527_T33UUB.mat"
    if not os.path.exists(path):
        pytest.skip("bundled demo scene not available")
    return path
