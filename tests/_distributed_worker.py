"""Subprocess body for the real 2-process jax.distributed test.

Launched twice by tests/test_distributed_multiprocess.py (process_id 0 = the
coordinator, 1 = a worker) on localhost with CPU devices. Exercises the
ACTUAL multi-process code paths that single-process tests can only mimic:
``init_distributed`` (jax.distributed.initialize), ``sync_seed``'s
broadcast_one_to_all, process-sharded DataLoader slices assembled into one
global on-mesh array via ``assemble_global_batch``, and a jitted psum-style
reduction over the non-fully-addressable global array.

Prints ONE JSON line with everything the parent asserts on.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from eelunet_tpu.data.pipeline import DataLoader
    from eelunet_tpu.parallel.distributed import (
        assemble_global_batch,
        init_distributed,
        is_primary,
        process_shard_spec,
        sync_seed,
    )
    from eelunet_tpu.parallel.mesh import batch_sharding, create_mesh

    # init_distributed resolves JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    # JAX_PROCESS_ID from the environment (set by the parent test)
    assert init_distributed() is True
    pid = jax.process_index()
    out = {
        "process_id": pid,
        "process_count": jax.process_count(),
        "n_global_devices": len(jax.devices()),
        "n_local_devices": len(jax.local_devices()),
        "is_primary": is_primary(),
        "shard_spec": process_shard_spec(),
    }

    # broadcast_one_to_all: host 0 draws the seed, both must report the same
    np.random.seed(1000 + pid)  # DIFFERENT host entropy on purpose
    out["seed"] = sync_seed(None)

    # process-sharded loader -> per-process slices -> one global on-mesh array
    class _IndexDataset:
        def __init__(self, n=16, hw=2):
            self.n, self.hw = n, hw

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            x = np.full((self.hw, self.hw, 3), float(i), np.float32)
            return x, x[..., :1]

    global_bs = 8
    loader = DataLoader(_IndexDataset(), global_bs, shuffle=True,
                        seed=out["seed"], num_workers=1,
                        process_shard=process_shard_spec())
    xb, _ = next(iter(loader))
    out["local_rows"] = [float(v) for v in xb[:, 0, 0, 0]]

    mesh = create_mesh()  # all GLOBAL devices, pure data-parallel
    bs = batch_sharding(mesh)
    garr = assemble_global_batch(xb, bs)
    out["global_shape"] = list(garr.shape)

    # jitted reduction over the non-fully-addressable global array: XLA
    # inserts the cross-process psum; the replicated result must equal the
    # host-side sum over the UNION of both processes' slices.
    total = jax.jit(lambda a: jnp.sum(a), out_shardings=None)(garr)
    out["global_sum"] = float(total)

    # replicated assembly path (eval loaders): every host holds the full
    # array; the global view must equal the local one
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    full = np.arange(24, dtype=np.float32).reshape(2, 2, 2, 3)
    rarr = assemble_global_batch(full, rep)
    out["replicated_ok"] = bool(
        np.array_equal(np.asarray(jax.jit(lambda a: a + 0)(rarr)), full)
    )

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
