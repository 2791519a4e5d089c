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


def _map_count() -> int:
    try:
        with open(f"/proc/{os.getpid()}/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def pytest_runtest_teardown(item, nextitem):
    """Drop XLA executables when the process nears the kernel memory-
    map cap: each CPU-JIT executable holds ~3 mmaps, and crossing
    vm.max_map_count (default 65530) SIGSEGVs the process inside the
    compiler (measured: maps climbed to ~65k right before the crash;
    clear_caches() releases them). Count-based cadence was too coarse
    — compile-heavy tests (TPC-DS suite) burn >1k maps per test.
    Caches rebuild on demand; only wall time is traded."""
    if _map_count() > 40_000:
        import jax

        jax.clear_caches()
