"""Test configuration: force a PURE-CPU JAX backend with 8 virtual devices so
pjit/shard_map sharding tests run without a TPU pod (SURVEY.md §4).

The container pins ``JAX_PLATFORMS=axon`` and installs a sitecustomize that
registers the axon PJRT plugin with remote compilation — under which the CPU
backend ignores ``--xla_force_host_platform_device_count`` and compiles hang.
Environment changes must land before the interpreter starts, so the first
pytest process re-execs itself once with a scrubbed environment.
"""

import os
import sys

import numpy as np
import pytest


def pytest_configure(config):
    """Re-exec pytest once with a scrubbed environment (pure-CPU JAX, 8
    virtual devices, axon sitecustomize removed).

    This must happen via exec — the sitecustomize monkey-patches JAX at
    interpreter start, so env changes inside this process are too late. Global
    output capture is stopped first so the exec'd process inherits the real
    stdout/stderr fds instead of pytest's capture tempfiles.
    """
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process spawns, e2e runs)")
    if os.environ.get("EELUNET_TPU_TEST_ENV") == "1":
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()

    env = dict(os.environ)
    env["EELUNET_TPU_TEST_ENV"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    # Prevent the axon PJRT plugin + remote-compile hooks from registering.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p and "axon_site" not in p
    )
    # Persistent XLA compilation cache for the suite: the full run compiles
    # hundreds of CPU programs on this 1-core host; repeat runs load them
    # from disk instead. Fingerprint-keyed, so never stale; opt out with
    # EELUNET_TEST_COMPILE_CACHE=0.
    if os.environ.get("EELUNET_TEST_COMPILE_CACHE", "1") != "0":
        env.setdefault(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser(os.path.join("~", ".cache", "eelunet_tpu", "xla-tests")),
        )
    args = list(config.invocation_params.args)
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *args], env)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_tree(tmp_path_factory):
    """A ToothDataset-style PNG tree with 8 train / 4 test images at 64x64."""
    from eelunet_tpu.data.synthetic import write_synthetic_tree

    root = tmp_path_factory.mktemp("toothlike")
    return write_synthetic_tree(str(root), n_train=8, n_test=4, image_size=(64, 64))
