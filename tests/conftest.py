import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

# fp64 correctness testing on the host CPU backend (8 virtual devices for
# sharding tests); set EXAADMM_TEST_PLATFORM=axon to run the suite on TPU.
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", os.environ.get("EXAADMM_TEST_PLATFORM", "cpu"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def case9_path():
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "data", "case9.m")
