"""Test config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware
(SURVEY.md §4 rebuild strategy).

The container's sitecustomize registers the remote 'axon' TPU backend and
forces jax_platforms='axon,cpu', so setting the env var is not enough —
we must override jax.config before any backend initializes. Unit tests on
the remote TPU would pay a network round-trip per op.
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


# `pytest -m quick`: the sub-2-minute oracle layer that gates every commit
# (VERDICT r1 #9). Files listed here are auto-marked quick unless a test
# carries an explicit `slow` marker.
_QUICK_FILES = {
    "test_config.py",
    "test_curves.py",
    "test_diffusion.py",
    "test_pointops.py",
    "test_prepare.py",
    "test_smplx.py",
    "test_text.py",
    "test_visualize.py",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if (
            item.path.name in _QUICK_FILES
            and "slow" not in item.keywords
        ):
            item.add_marker(pytest.mark.quick)
