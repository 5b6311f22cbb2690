import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are testable
# without TPU hardware (SURVEY.md §4: multi-host simulation path).
# Hard-override: the session sitecustomize may register a remote TPU (axon)
# backend and force jax_platforms=axon, so the env var alone is not enough.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

EXAMPLE_DIR = "/root/reference/example"

import pytest


@pytest.fixture(scope="session")
def example_dir():
    return EXAMPLE_DIR
