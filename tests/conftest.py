"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU-native answer to "test distributed without a cluster"
(SURVEY.md §4): the same jit/sharding programs run on
``xla_force_host_platform_device_count=8`` CPU devices.

Note: this environment may route JAX at a remote TPU through a PJRT plugin
that force-selects itself via ``jax.config`` (overriding JAX_PLATFORMS), so
we must both set the XLA flag before the first backend init *and* update
the config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = pathlib.Path("/root/reference")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (torch-oracle parity, 8-device "
             "mesh equivalence, end-to-end pipelines). Default `pytest "
             "tests/ -q` is the fast tier (<~15 min on a 1-vCPU box); "
             "`--runslow` is the full CI/round-end suite.")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy suite (torch oracles, mesh equivalence, e2e loops) — "
        "skipped unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

requires_reference = pytest.mark.skipif(
    not REFERENCE_ROOT.exists(),
    reason="reference implementation not mounted",
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
