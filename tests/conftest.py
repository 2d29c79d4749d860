"""Test configuration: force the CPU backend with 8 virtual devices so that
multi-chip sharding paths (mesh/pjit/shard_map) are exercised without TPU
hardware, and enable float64 before JAX initializes."""

import os

os.environ.setdefault("JAX_ENABLE_X64", "true")

if os.environ.get("QGS_TPU_TEST_DEVICE", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # a site hook may have imported jax and forced an accelerator platform
    # already — switch it back pre-initialization
    import jax

    jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES
