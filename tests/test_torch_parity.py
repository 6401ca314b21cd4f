"""Full-model forward parity vs the PyTorch reference.

For each importable family: instantiate the reference torch model with random
init, port its state_dict through eelunet_tpu.models.torch_port, run BOTH
frameworks on the same input, and require elementwise agreement. This is the
end-to-end composition check the block-level parity tests can't provide —
wiring order, padding, init-vs-runtime semantics (e.g. the EAblock init-only
weight coupling, malunet.py:89) all have to line up for these to pass.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eelunet_tpu.models.torch_port import (  # noqa: E402
    load_torch_checkpoint,
    port_state_dict,
    validate_against_model,
)
from eelunet_tpu.registry import _build  # noqa: E402
from reference_loader import load_reference_module  # noqa: E402

SIZE = 64


def _state_dict_np(tmodel):
    return {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}


def _run_flax(name, variables, x_nhwc, **kwargs):
    model = _build(name)(**kwargs)
    if not variables.get("batch_stats"):
        variables = {"params": variables["params"]}
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x_nhwc)
    return out


def _input(rng, c=3):
    x = rng.standard_normal((2, c, SIZE, SIZE)).astype(np.float32)
    return torch.from_numpy(x), jnp.asarray(x.transpose(0, 2, 3, 1))


def _assert_close(got, want_nchw, tol, what):
    want = np.transpose(want_nchw.detach().cpu().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got, np.float32), want, atol=tol, rtol=tol,
                               err_msg=what)


def test_unet_forward_parity(rng):
    ref = load_reference_module("models.Unet")
    tm = ref.Unet(in_channels=3, out_channels=1).eval()
    variables = port_state_dict("unet", _state_dict_np(tm))
    validate_against_model("unet", variables)
    xt, xj = _input(rng)
    with torch.no_grad():
        want = tm(xt)
    out = _run_flax("unet", variables, xj)
    _assert_close(out.seg, want, 1e-4, "unet logits")


def test_unext_forward_parity(rng):
    ref = load_reference_module("models.unext")
    tm = ref.UNext(num_classes=1, input_channels=3, img_size=SIZE).eval()
    variables = port_state_dict("unext", _state_dict_np(tm))
    validate_against_model("unext", variables)
    xt, xj = _input(rng)
    with torch.no_grad():
        want = tm(xt)
    out = _run_flax("unext", variables, xj)
    _assert_close(out.seg, want, 1e-4, "unext logits")


def test_unext_s_forward_parity(rng):
    ref = load_reference_module("models.unext")
    tm = ref.UNext_S(num_classes=1, input_channels=3, img_size=SIZE).eval()
    variables = port_state_dict("unext_s", _state_dict_np(tm))
    validate_against_model("unext_s", variables)
    xt, xj = _input(rng)
    with torch.no_grad():
        want = tm(xt)
    out = _run_flax("unext_s", variables, xj)
    _assert_close(out.seg, want, 1e-4, "unext_s logits")


def test_egeunet_forward_parity(rng):
    ref = load_reference_module("models.egeunet")
    tm = ref.EGEUNet(num_classes=1, input_channels=3, bridge=True, gt_ds=True).eval()
    variables = port_state_dict("egeunet", _state_dict_np(tm))
    validate_against_model("egeunet", variables)
    xt, xj = _input(rng)
    with torch.no_grad():
        gt_pre, want = tm(xt)
    out = _run_flax("egeunet", variables, xj)
    _assert_close(out.seg, want, 1e-4, "egeunet seg")
    assert len(out.aux) == 5
    for i, (g, w) in enumerate(zip(out.aux, gt_pre)):
        _assert_close(g, w, 1e-4, f"egeunet gt_pre[{i}]")


def test_malunet_forward_parity(rng):
    ref = load_reference_module("models.malunet")
    tm = ref.MALUNet(num_classes=1, input_channels=3, bridge=True).eval()
    variables = port_state_dict("malunet", _state_dict_np(tm))
    validate_against_model("malunet", variables)
    xt, xj = _input(rng)
    with torch.no_grad():
        want = tm(xt)
    out = _run_flax("malunet", variables, xj)
    _assert_close(out.seg, want, 1e-4, "malunet seg")


def test_eelunet_forward_parity(rng):
    ref = load_reference_module("models.EELUnet")
    tm = ref.EELUnet(in_channels=3, out_channels=1).eval()
    variables = port_state_dict("eelunet", _state_dict_np(tm))
    validate_against_model("eelunet", variables)
    xt, xj = _input(rng)
    with torch.no_grad():
        want_seg, want_edges = tm(xt)
    out = _run_flax("eelunet", variables, xj)
    # FFT high-pass runs through the low-rank factorization on f32: identical
    # math up to float rounding, so allow a slightly wider tolerance.
    _assert_close(out.seg, want_seg, 5e-4, "eelunet seg")
    assert len(out.aux) == 5
    for i, (g, w) in enumerate(zip(out.aux, want_edges)):
        _assert_close(g, w, 5e-4, f"eelunet edge[{i}]")


def test_checkpoint_file_roundtrip(rng, tmp_path):
    """torch.save -> load_torch_checkpoint -> port produces the same trees."""
    ref = load_reference_module("models.Unet")
    tm = ref.Unet(in_channels=3, out_channels=1)
    path = tmp_path / "unet.pth"
    torch.save(tm.state_dict(), str(path))
    a = port_state_dict("unet", load_torch_checkpoint(str(path)))
    b = port_state_dict("unet", _state_dict_np(tm))
    jax.tree_util.tree_map(np.testing.assert_array_equal, a, b)


def test_import_cli_end_to_end(rng, tmp_path, synthetic_tree):
    """cli.import_torch writes an orbax checkpoint cli.evaluate can consume,
    and the restored weights reproduce the torch model's forward."""
    from eelunet_tpu.cli import evaluate as cli_evaluate
    from eelunet_tpu.cli import import_torch as cli_import

    ref = load_reference_module("models.Unet")
    tm = ref.Unet(in_channels=3, out_channels=1).eval()
    pth = tmp_path / "unet_best.pth"
    torch.save(tm.state_dict(), str(pth))
    out_dir = tmp_path / "imported"

    cli_import.main([
        "--model_type", "unet", "--checkpoint", str(pth), "--output", str(out_dir),
        "--image_size", "64", "--save_dir", str(tmp_path / "ckpts"),
    ])
    assert (out_dir / "framework_meta.json").exists()

    # evaluate CLI restores it without error and covers the whole split
    m = cli_evaluate.main([
        "--model_type", "unet", "--data_dir", synthetic_tree, "--image_size", "64",
        "--batch_size", "4", "--checkpoint", str(out_dir),
        "--save_dir", str(tmp_path / "ckpts"),
    ])
    assert 0.0 <= m["dice"] <= 1.0

    # restored forward == torch forward
    from eelunet_tpu.config import TrainConfig, apply_overrides
    from eelunet_tpu.train.trainer import Trainer

    cfg = apply_overrides(TrainConfig(), ["model.name=unet", "data.image_size=[64,64]",
                                          f"save_dir={tmp_path / 'ckpts'}", "seed=0"])
    tr = Trainer(cfg)
    state = tr.ckpt.restore_params(str(out_dir), tr.init_state())
    xt, xj = _input(rng)
    with torch.no_grad():
        want = tm(xt)
    out = tr.model.apply({"params": state.params}, xj, train=False)
    _assert_close(out.seg, want, 1e-4, "unet restored forward")


def test_unetpp_is_unsupported():
    """The upstream UnetPlusPlus crashes on forward (UnetPlusPlus.py:50-76),
    so no reference checkpoint can exist; the importer must say so."""
    with pytest.raises(KeyError, match="unet"):
        port_state_dict("unet++", {})


def test_reference_evaluate_metric_parity(tmp_path, synthetic_tree):
    """North star: Dice/IoU within 0.5% of the PyTorch reference. Same
    weights (torch EELUnet, ported via cli.import_torch), same images ->
    the reference's own evaluate() (evaluate.py:62-124, incl. its cv2
    boundary F1) and our cli.evaluate must agree on all 9 metrics.

    The final 1x1 conv is scaled so sigmoid outputs saturate away from the
    0.5 threshold — otherwise f32-rounding differences between frameworks
    flip borderline pixels and the comparison measures noise, not wiring."""
    from eelunet_tpu.cli import evaluate as cli_evaluate
    from eelunet_tpu.cli import import_torch as cli_import
    from eelunet_tpu.cli.common import make_folder_dataset
    from eelunet_tpu.config import DataConfig
    from eelunet_tpu.data.pipeline import DataLoader as JaxLoader

    ref_eval = load_reference_module("evaluate")
    ref_mod = load_reference_module("models.EELUnet")
    torch.manual_seed(3)
    tm = ref_mod.EELUnet(in_channels=3, out_channels=1).eval()
    with torch.no_grad():
        tm.final[1].weight.mul_(25.0)
        tm.final[1].bias.mul_(25.0)

    pth = tmp_path / "eelunet_ref.pth"
    torch.save(tm.state_dict(), str(pth))
    out_dir = tmp_path / "imported"
    cli_import.main([
        "--model_type", "eelunet", "--checkpoint", str(pth),
        "--output", str(out_dir), "--image_size", "64",
        "--save_dir", str(tmp_path / "ckpts"),
    ])

    ours = cli_evaluate.main([
        "--model_type", "eelunet", "--data_dir", synthetic_tree,
        "--image_size", "64", "--batch_size", "4", "--checkpoint", str(out_dir),
        "--save_dir", str(tmp_path / "ckpts"),
    ])

    # Reference side: identical pixels — the same float-feed dataset the CLI's
    # uint8 device chain reproduces (<=1e-6, tests/test_uint8_feed.py).
    d = DataConfig(data_dir=synthetic_tree, image_size=(64, 64), uint8_feed=False)
    loader = JaxLoader(make_folder_dataset(d, "test"), 4, drop_remainder=False)
    tbatches = [
        (torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))),
         torch.from_numpy(np.ascontiguousarray(y.transpose(0, 3, 1, 2))))
        for x, y in loader
    ]
    with torch.no_grad():
        ref = ref_eval.evaluate(tm, tbatches, torch.device("cpu"))

    keys = ["pixel_accuracy", "precision", "recall", "f1_score", "iou",
            "dice", "miou", "boundary_f1", "mdice"]
    for k, want in zip(keys, ref):
        np.testing.assert_allclose(ours[k], want, rtol=5e-3, atol=1e-6, err_msg=k)
    # Guard against a degenerate comparison (all-0/all-1 predictions agree
    # trivially): the random-weight model must produce a real confusion split.
    assert 0.01 < ours["iou"] < 0.99 and 0.01 < ours["pixel_accuracy"] < 0.99
