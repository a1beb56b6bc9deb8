"""Test configuration: run JAX on CPU with 8 virtual devices.

Sharding/pjit tests exercise a simulated 8-chip mesh on the host CPU (the
standard JAX trick for testing pod-slice sharding without TPU hardware).
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

REFERENCE_SCENES = pathlib.Path("/root/reference/scenes")
REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def scenes_dir():
    d = REPO_ROOT / "scenes"
    return d if d.exists() else REFERENCE_SCENES


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
