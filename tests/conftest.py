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

if os.environ.get("EELUNET_TPU_TEST_ENV") != "1":
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
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_tree(tmp_path_factory):
    """A ToothDataset-style PNG tree with 8 train / 4 test images at 64x64."""
    from eelunet_tpu.data.synthetic import write_synthetic_tree

    root = tmp_path_factory.mktemp("toothlike")
    return write_synthetic_tree(str(root), n_train=8, n_test=4, image_size=(64, 64))
