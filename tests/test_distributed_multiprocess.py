"""REAL 2-process jax.distributed execution over localhost CPU.

tests/test_distributed.py pins the multi-host plumbing single-process; this
test actually runs it: two OS processes (coordinator + worker) call
``jax.distributed.initialize`` via ``init_distributed``, see each other's
devices, broadcast a seed, partition a global batch through the
process-sharded DataLoader, assemble it with
``jax.make_array_from_process_local_data``, and reduce it with a jitted psum
across processes. The reference has no distributed layer at all
(SURVEY.md §2.8); this is the TPU-pod idiom exercised end-to-end on CPU.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")
N_PROC, LOCAL_DEVICES = 2, 4


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_init_broadcast_shard_psum():
    port = _free_port()
    env_base = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={LOCAL_DEVICES}",
        JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        JAX_NUM_PROCESSES=str(N_PROC),
        PYTHONPATH=REPO,
        # each process compiles its own tiny programs; don't share the cache
        # dir concurrently with the main suite's processes
        EELUNET_TEST_COMPILE_CACHE="0",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER],
            env={**env_base, "JAX_PROCESS_ID": str(i)},
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(N_PROC)
    ]
    outs = []
    try:
        for p in procs:
            stdout, stderr = p.communicate(timeout=300)
            assert p.returncode == 0, f"worker failed:\n{stderr[-4000:]}"
            outs.append(json.loads(stdout.strip().splitlines()[-1]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    by_pid = {o["process_id"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for pid, o in by_pid.items():
        assert o["process_count"] == N_PROC
        assert o["n_local_devices"] == LOCAL_DEVICES
        assert o["n_global_devices"] == N_PROC * LOCAL_DEVICES
        assert o["is_primary"] == (pid == 0)
        assert o["shard_spec"] == [pid, N_PROC]
        assert o["global_shape"] == [8, 2, 2, 3]
        assert o["replicated_ok"] is True

    # host 0's seed reached host 1 despite different host entropy
    assert by_pid[0]["seed"] == by_pid[1]["seed"]

    # the two 4-row local slices partition the 8-row global batch: disjoint,
    # and the jitted cross-process reduction saw their union (each local row
    # is a (2,2,3) plane filled with its sample index)
    rows0, rows1 = by_pid[0]["local_rows"], by_pid[1]["local_rows"]
    assert len(rows0) == len(rows1) == 4
    assert not set(rows0) & set(rows1)
    want = sum(rows0 + rows1) * 2 * 2 * 3
    for o in outs:
        assert o["global_sum"] == pytest.approx(want)
