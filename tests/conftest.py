"""Test harness: force an 8-virtual-device CPU JAX so sharding/pjit paths
are exercised without TPU hardware (SURVEY.md §4: multi-host behavior is
tested with XLA_FLAGS=--xla_force_host_platform_device_count).

The axon sitecustomize pins jax_platforms to "axon,cpu"; tests override to
pure CPU before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the tier is dominated by single-threaded
# XLA CPU compiles of large scan graphs; caching them on disk makes
# re-runs compile-free (entries key on the HLO hash, so source changes
# invalidate naturally).  First run pays full price.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".pytest_cache", "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run the slow tier (the multi-minute parity renders); "
             "default `pytest -q` stays the fast tier")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute renders (run with --slow; always run "
                   "the full tier before a snapshot)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow tier — run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8


@pytest.fixture
def key():
    return jax.random.key(0)


def mc_keys(n=4):
    return [jax.random.key(i) for i in range(n)]
