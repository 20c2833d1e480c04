"""Test config: run everything on a virtual 8-device CPU mesh.

This is how JAX projects test pod-sharding without TPU hardware
(SURVEY.md §4): XLA's host platform exposes 8 virtual devices, and all
sharding/collective code paths compile and execute exactly as they would on
an 8-chip slice.

The harness environment wires every python interpreter to a remote TPU
tunnel via sitecustomize (PALLAS_AXON_*), which routes XLA compiles through
a remote compile service (~10s+ per compile) and occasionally wedges.
sitecustomize runs before any pytest code can touch the environment, so when
the axon env is detected we re-exec pytest once with a clean CPU-only
environment (suspending pytest's fd capture first so output survives).
"""

import os
import sys

_AXON_VARS = ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE", "AXON_LOOPBACK_RELAY")


def _needs_reexec() -> bool:
    if os.environ.get("L3Q_TPU_TESTS") == "1":
        # on-device test run (tests/test_tpu_device.py): keep the real TPU
        # attached instead of re-execing onto the CPU mesh
        return False
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and os.environ.get("L3Q_TEST_REEXEC") != "1"


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    for var in _AXON_VARS:
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    env["L3Q_TEST_REEXEC"] = "1"
    sys.stdout.flush()
    sys.stderr.flush()
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


if not _needs_reexec() and os.environ.get("L3Q_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    # `big_compile`-marked tests get fresh XLA caches first: the CPU
    # compiler SIGSEGVs when a large interpret-mode scan/shard_map kernel
    # compiles with the whole suite's executables cached (reproduced at
    # test_windowed and test_sharding::test_flash_decode_kernel_sharded
    # in full-suite runs, never standalone). Applied per marked ITEM —
    # a per-module clear was not enough: the module's own earlier
    # compiles re-fill the budget before a late heavy test.
    for item in items:
        if item.get_closest_marker("big_compile"):
            item.fixturenames.insert(0, "_l3q_fresh_caches")


@pytest.fixture
def _l3q_fresh_caches():
    import jax

    jax.clear_caches()
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
