import os
import sys

_PLATFORM = os.environ.get("EXAADMM_TEST_PLATFORM", "cpu")
if _PLATFORM == "cpu":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

# Default: fp64 correctness testing on the host CPU backend (8 virtual
# devices for sharding tests). EXAADMM_TEST_PLATFORM=axon runs the
# device-gated subset (tests/test_tpu_device.py) on real TPU hardware in the
# production fp32 config — the reference's CUDA.functional() hardware gate
# (/root/reference/test/runtests.jl:23) translated to platform selection.
jax.config.update("jax_enable_x64", _PLATFORM == "cpu")
jax.config.update("jax_platforms", _PLATFORM)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def case9_path():
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "data", "case9.m")
