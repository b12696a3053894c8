"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's "mpirun -n 2 on one host" testing mode
(nbody/README.md:30-37) via XLA host-platform device multiplexing.

The container's sitecustomize registers the axon TPU backend and forces
``jax_platforms=axon,cpu`` via jax.config, overriding the env var — so we must
override through jax.config *after* import, and set the host device count flag
before the first backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (long statistical validations)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long statistical/large-N validation (skipped unless "
        "--runslow or RUN_SLOW=1) — keeps the default suite fast so "
        "green-at-HEAD is cheap to check")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


_TEST_COUNT = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_cache_clear():
    """The XLA CPU compiler segfaults after ~90 accumulated compilations in
    one process (reproduced twice at the same suite position, never
    standalone). Dropping the jit caches every 25 tests keeps the compiler
    state bounded at the cost of a few recompiles."""
    yield
    _TEST_COUNT["n"] += 1
    if _TEST_COUNT["n"] % 25 == 0:
        jax.clear_caches()
