"""Test configuration: run JAX on CPU with 8 virtual devices.

Sharding/pjit tests exercise a simulated 8-chip mesh on the host CPU (the
standard JAX trick for testing pod-slice sharding without TPU hardware).
Must run before jax is imported anywhere.
"""

import os

# Force CPU: the ambient environment pre-registers the axon TPU plugin via
# sitecustomize (PYTHONPATH=/root/.axon_site) and pre-imports jax, so both
# the env var *and* the already-imported config must be overridden before
# any backend initializes; otherwise every unit test pays TPU tunnel latency.
os.environ["JAX_PLATFORMS"] = "cpu"
# Keep the persistent XLA compilation cache out of the test process: CLI
# tests call enable_compilation_cache() mid-suite, and concurrent writers
# (a TPU bench/tool in another process) have produced a segfault inside
# the zstd cache serializer. CPU test compiles are cheap anyway.
os.environ["PLUTRACER_NO_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

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
