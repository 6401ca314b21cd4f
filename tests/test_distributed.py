"""Multi-host data-feed plumbing (SURVEY.md §2.8 'Distributed comm backend').

True multi-process execution can't run in CI (one host); these tests pin the
pieces that make the multi-host path correct by construction: the per-process
batch slicing partitions every global batch exactly, and the global-batch
assembly produces the same on-mesh array the single-process path does.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from eelunet_tpu.data.pipeline import DataLoader
from eelunet_tpu.parallel.distributed import assemble_global_batch, sync_seed
from eelunet_tpu.parallel.mesh import batch_sharding, create_mesh


class _IndexDataset:
    """Sample i -> (image filled with i, mask filled with -i)."""

    def __init__(self, n=32, hw=4):
        self.n, self.hw = n, hw

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        x = np.full((self.hw, self.hw, 3), float(i), np.float32)
        y = np.full((self.hw, self.hw, 1), float(-i), np.float32)
        return x, y


def _rows(batch):
    return [float(batch[0][i, 0, 0, 0]) for i in range(batch[0].shape[0])]


@pytest.mark.parametrize("pc", [2, 4])
def test_process_shard_partitions_every_batch(pc):
    ds = _IndexDataset(n=32)
    full = DataLoader(ds, 8, shuffle=True, seed=3, num_workers=1)
    shards = [
        DataLoader(ds, 8, shuffle=True, seed=3, num_workers=1, process_shard=(p, pc))
        for p in range(pc)
    ]
    assert all(len(s) == len(full) for s in shards)
    for batches in zip(full, *shards):
        want = _rows(batches[0])
        got = sum((_rows(b) for b in batches[1:]), [])
        # contiguous slices in process order reassemble the global batch
        assert got == want
        assert all(b[0].shape[0] == 8 // pc for b in batches[1:])


def test_process_shard_epochs_reshuffle_consistently():
    ds = _IndexDataset(n=16)
    a = DataLoader(ds, 8, shuffle=True, seed=1, num_workers=1, process_shard=(0, 2))
    b = DataLoader(ds, 8, shuffle=True, seed=1, num_workers=1, process_shard=(1, 2))
    e1 = [_rows(x) + _rows(y) for x, y in zip(a, b)]
    e2 = [_rows(x) + _rows(y) for x, y in zip(a, b)]
    assert e1 != e2  # epoch-keyed shuffle advanced on both loaders
    assert sorted(sum(e1, [])) == sorted(sum(e2, []))  # same sample set


def test_process_shard_validation():
    ds = _IndexDataset()
    with pytest.raises(ValueError, match="drop_remainder"):
        DataLoader(ds, 8, drop_remainder=False, process_shard=(0, 2))
    with pytest.raises(ValueError, match="divisible"):
        DataLoader(ds, 9, process_shard=(0, 2))
    with pytest.raises(ValueError, match="out of range"):
        DataLoader(ds, 8, process_shard=(2, 2))
    # pc=1 degenerates to a normal loader
    dl = DataLoader(ds, 8, drop_remainder=False, process_shard=(0, 1))
    assert dl.process_shard is None


def test_assemble_global_batch_matches_device_put():
    mesh = create_mesh()
    bs = batch_sharding(mesh)
    x = np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3)
    got = assemble_global_batch(x, bs)
    want = jax.device_put(x, bs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert got.sharding == want.sharding


def test_make_array_from_process_local_data_api():
    """The multi-process branch's API call produces the same global array on
    one host (local data == global data when all shards are addressable)."""
    mesh = create_mesh()
    bs = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    x = np.arange(8 * 2 * 2 * 3, dtype=np.float32).reshape(8, 2, 2, 3)
    for sh in (bs, rep):
        arr = jax.make_array_from_process_local_data(sh, x)
        np.testing.assert_array_equal(np.asarray(arr), x)
        assert arr.sharding.is_equivalent_to(sh, x.ndim)


def test_sync_seed_single_process():
    assert sync_seed(1234) == 1234
    s = sync_seed(None)
    assert 0 <= s < 10000


def test_build_loaders_single_process_unaffected(synthetic_tree, tmp_path):
    from eelunet_tpu.cli.common import build_loaders
    from eelunet_tpu.config import TrainConfig, apply_overrides

    cfg = apply_overrides(TrainConfig(), [
        f"data.data_dir={synthetic_tree}", "data.image_size=[64,64]",
        "data.batch_size=4", "seed=0", "data.num_workers=0",
    ])
    tr, va, te = build_loaders(cfg)
    assert tr.process_shard is None and te.process_shard is None


def test_choose_batch_placement():
    """Placement selection incl. the multi-host corruption guard: a
    process-sharded loader's batches must never be 'replicated' (each host
    holds a different slice — replication would silently train every host on
    its own data)."""
    import pytest

    from eelunet_tpu.train.trainer import choose_batch_placement as choose

    # single process: full / rows-only / replicate fallbacks
    assert choose(8, 64, 4, 2, 1, False) == "full"
    assert choose(8, 66, 4, 4, 1, False) == "rows"      # H % spatial != 0
    assert choose(7, 64, 4, 2, 1, False) == "replicate"  # ragged eval tail
    # multi-host, process-sharded loader: 2 hosts x 4 local rows = 8 global
    assert choose(4, 64, 8, 1, 2, True) == "full"
    assert choose(4, 66, 8, 4, 2, True) == "rows"
    with pytest.raises(ValueError, match="cannot be replicated"):
        choose(3, 64, 8, 1, 2, True)  # 6 global rows over 8-way data axis
    # multi-host, UNsharded loader (every host holds the full batch):
    # replication is the only correct placement
    assert choose(8, 64, 8, 1, 2, False) == "replicate"
