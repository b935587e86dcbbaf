"""Test environment: CPU backend with 8 virtual devices.

Must run before any ``import jax`` (SURVEY.md §4.2.4). The sandbox's
sitecustomize registers the single-TPU `axon` PJRT plugin whenever
``PALLAS_AXON_POOL_IPS`` is set, so tests clear it to get a deterministic
8-device CPU mesh for shard_map/psum paths.
"""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# NOTE: the sandbox's sitecustomize imports jax at interpreter startup, but
# backends initialize lazily — setting the env before the first device use
# still selects the 8-device CPU platform. Verified by test_env.py.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_collection_modifyitems(config, items):
    """Fast tier: ``pytest -m quick`` = everything not marked slow.

    The compile-heavy e2e modules dominate the ~19-min full-suite wall time
    (VERDICT r1 weak #8); iterate on the quick tier, run the full suite
    before committing engine-level changes.
    """
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
