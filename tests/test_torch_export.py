"""Reverse-direction checkpoint migration: flax -> reference torch.

export_state_dict (models/torch_port.py) must be the exact inverse of
port_state_dict: for every importable family, torch-sd -> flax -> torch-sd
round-trips bit-for-bit, and the exported dict load_state_dict(strict=True)s
into the reference model (all keys present, incl. num_batches_tracked).
This is the migration-OUT surface (cli.export_torch): weights trained here
drop back into the upstream eval stack (evaluate.py:172-176, test.py:82-86).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from reference_accuracy_bench import MODEL_ZOO  # noqa: E402
from reference_loader import load_reference_module  # noqa: E402

from eelunet_tpu.models.torch_port import (  # noqa: E402
    export_state_dict,
    port_state_dict,
)

FAMILIES = ("unet", "eelunet", "unext", "unext_s", "egeunet", "malunet")


def _reference_sd(family):
    torch.manual_seed(0)
    module_name, build, _, _ = MODEL_ZOO[family]
    tm = build(load_reference_module(module_name))
    return tm, {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}


@pytest.mark.parametrize("family", FAMILIES)
def test_export_is_exact_inverse_of_port(family):
    tm, sd = _reference_sd(family)
    variables = port_state_dict(family, sd)
    back = export_state_dict(family, variables)
    want = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    assert set(back) - {k for k in back if k.endswith("num_batches_tracked")} == set(want)
    for k, v in want.items():
        np.testing.assert_array_equal(back[k], v.astype(np.float32), err_msg=k)


@pytest.mark.parametrize("family", ["eelunet", "malunet"])
def test_exported_sd_loads_strict(family):
    """strict=True catches any missing/extra key (num_batches_tracked
    included); covers the two families with the most exotic rule kinds
    (conv_il interleave permutation; ea_dense/conv1d)."""
    tm, sd = _reference_sd(family)
    variables = port_state_dict(family, sd)
    back = {k: torch.from_numpy(np.asarray(v)) for k, v in
            export_state_dict(family, variables).items()}
    tm.load_state_dict(back, strict=True)
