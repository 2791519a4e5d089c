"""Test config: run everything on an 8-virtual-device CPU mesh.

Mirrors the reference's multi-node-without-a-cluster strategy
(velox/exec/tests/MultiFragmentTest.cpp:52 + LocalExchangeSource): multi-chip
semantics are validated in one process with XLA's host-platform device
virtualization before ever touching a real pod.

The session environment pre-imports jax (sitecustomize) and pins
JAX_PLATFORMS to the tunneled TPU, so we must override via jax.config (env
vars are already consumed) BEFORE any backend initializes. Set
VELOX_TPU_TEST_PLATFORM=axon to run the suite on real hardware instead.
"""

import os

_platform = os.environ.get("VELOX_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "nightly: long-running fuzzer sweeps (run with -m nightly)")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    if config.getoption("-m"):
        return
    skip = _pytest.mark.skip(reason="nightly fuzz: run with -m nightly")
    for item in items:
        if "nightly" in item.keywords:
            item.add_marker(skip)


_test_counter = {"n": 0}


def pytest_runtest_teardown(item, nextitem):
    """Drop XLA executables periodically: a long single-process run
    accumulates compiled programs until LLVM hits the process mmap
    budget and segfaults (observed at ~400 tests). Caches rebuild on
    demand; only wall time is traded."""
    _test_counter["n"] += 1
    if _test_counter["n"] % 60 == 0:
        import jax

        jax.clear_caches()
