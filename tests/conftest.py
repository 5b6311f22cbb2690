import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are testable
# without TPU hardware (SURVEY.md §4: multi-host simulation path).
# Hard-override: the session env may point JAX at a remote TPU (axon).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

EXAMPLE_DIR = "/root/reference/example"

import pytest


@pytest.fixture(scope="session")
def example_dir():
    return EXAMPLE_DIR
