"""PyTorch-reference checkpoint importer.

Maps a reference ``state_dict`` (``torch.save(model.state_dict())``, the only
checkpoint format the reference ever writes — train.py:157-180) onto the flax
param/batch-stats trees of the corresponding model family here, so reference-
trained weights can be evaluated/served/finetuned on TPU.

Families covered: unet, eelunet, unext, unext_s, egeunet, malunet.
``unetpp`` is intentionally unsupported: the upstream UnetPlusPlus crashes on
forward (channel mismatch, UnetPlusPlus.py:50-76) so no trained reference
checkpoint of it can exist; our repaired architecture has a different
parameter structure by necessity.

Layout conversions (verified numerically in tests/test_torch_parity.py):
- Conv2d weight (O,I/g,kh,kw)      -> flax kernel (kh,kw,I/g,O)
- ConvTranspose2d weight (I,O,kh,kw) -> flax ConvTranspose kernel
  (kh,kw,I,O) with BOTH spatial axes flipped (lax.conv_transpose with
  transpose_kernel=False is a forward-oriented fractionally-strided conv,
  torch computes the adjoint of a strided correlation).
- Linear weight (O,I) -> kernel (I,O); LayerNorm/GroupNorm/BatchNorm weight ->
  scale; running_mean/var -> batch_stats.
- Conv1d (O,I/g,k) -> (k,1,I/g,O) kernel of the equivalent (k,1) Conv2d.
- EELUnet dec1..dec4 first convs additionally permute input channels from the
  reference's interleaved bridge order to our concat order (the exact
  permutation of models/eelunet.py:migrate_interleaved_checkpoint;
  reference FeatureInterleaveBridge EELUnet.py:127-141).
- EGE-UNet GHPA parameter grids (1,C,x,y)/(1,1,C,x) -> NHWC (0,2,3,1).
- MALUNet EAblock Conv1d weights (k,C,1)/(C,k,1) -> the (C,k)/(k,C) matmul
  operands of models/malunet.py:EAblock (malunet.py:86-89).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

Rule = Tuple[str, str, str]  # (flax_dir, torch_prefix, kind)


# ---------------------------------------------------------------- converters

def _conv_w(w):
    return np.transpose(w, (2, 3, 1, 0))


def _convt_w(w):
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _conv1d_w(w):
    return np.transpose(w[:, :, :, None], (2, 3, 1, 0))


def _interleave_to_concat(kernel):
    """Reorder (kh,kw,cin,cout) cin from [d0,e0,d1,e1,..] to [d...|e...]."""
    return np.concatenate([kernel[..., 0::2, :], kernel[..., 1::2, :]], axis=-2)


# ---------------------------------------------------------------- rule lists
# A rule maps the flax directory that directly holds the leaves to the torch
# name prefix. Kinds: conv, conv_il (conv + interleave->concat cin permute),
# convt, conv1d, dense, bn, gn, ln, ghpa_param, ea_dense.


def _unet_rules() -> List[Rule]:
    rules: List[Rule] = []
    blocks = [
        ("ConvBlock_0", "enc1"), ("ConvBlock_1", "enc2"), ("ConvBlock_2", "enc3"),
        ("ConvBlock_3", "enc4"), ("ConvBlock_4", "bottleneck"), ("ConvBlock_5", "conv4"),
        ("ConvBlock_6", "conv3"), ("ConvBlock_7", "conv2"), ("ConvBlock_8", "conv1"),
    ]
    for fb, tb in blocks:  # Unet.py:33-40: Sequential(Conv,ReLU,Conv,ReLU)
        rules.append((f"{fb}/TorchConv_0/Conv_0", f"{tb}.0", "conv"))
        rules.append((f"{fb}/TorchConv_1/Conv_0", f"{tb}.2", "conv"))
    for fu, tu in [("UpConvBlock_0", "upconv4"), ("UpConvBlock_1", "upconv3"),
                   ("UpConvBlock_2", "upconv2"), ("UpConvBlock_3", "upconv1")]:
        rules.append((f"{fu}/TorchConvTranspose_0/ConvTranspose_0", f"{tu}.0", "convt"))
    rules.append(("TorchConv_0/Conv_0", "final_conv", "conv"))
    return rules


def _capmlp(fp: str, tp: str) -> List[Rule]:
    """ChannelAwarePatchedMLP (EELUnet.py:101-123)."""
    return [
        (f"{fp}/TorchConv_0/Conv_0", f"{tp}.to_patch", "conv"),
        (f"{fp}/ChannelAttention_0/TorchConv_0/Conv_0", f"{tp}.channel_attention.fc1", "conv"),
        (f"{fp}/ChannelAttention_0/TorchConv_1/Conv_0", f"{tp}.channel_attention.fc2", "conv"),
        (f"{fp}/TorchDense_0/Dense_0", f"{tp}.mlp.0", "dense"),
        (f"{fp}/TorchDense_1/Dense_0", f"{tp}.mlp.2", "dense"),
        (f"{fp}/TorchConv_1/Conv_0", f"{tp}.to_space", "conv"),
    ]


def _eel_conv_block(fp: str, tp: str, mlp: bool, interleave: bool = False) -> List[Rule]:
    """conv_block / mlp_conv_block (EELUnet.py:335-359): params at .0 .1 .3 .4."""
    rules = [
        (f"{fp}/TorchConv_0/Conv_0", f"{tp}.0", "conv_il" if interleave else "conv"),
        (f"{fp}/BatchNorm_0/BatchNorm_0", f"{tp}.1", "bn"),
        (f"{fp}/BatchNorm_1/BatchNorm_0", f"{tp}.4", "bn"),
    ]
    if mlp:
        rules += _capmlp(f"{fp}/ChannelAwarePatchedMLP_0", f"{tp}.3")
    else:
        rules.append((f"{fp}/TorchConv_1/Conv_0", f"{tp}.3", "conv"))
    return rules


def _eel_upconv(fp: str, tp: str, mlp: bool) -> List[Rule]:
    """upconv_block / mlp_upconv_block (EELUnet.py:361-374)."""
    rules = [(f"{fp}/TorchConvTranspose_0/ConvTranspose_0", f"{tp}.0", "convt")]
    if mlp:
        rules += _capmlp(f"{fp}/ChannelAwarePatchedMLP_0", f"{tp}.1")
        rules.append((f"{fp}/BatchNorm_0/BatchNorm_0", f"{tp}.2", "bn"))
    else:
        rules.append((f"{fp}/BatchNorm_0/BatchNorm_0", f"{tp}.1", "bn"))
    return rules


def _eelunet_rules() -> List[Rule]:
    r: List[Rule] = []
    r += _eel_conv_block("enc1", "enc1.0", mlp=False)
    r += _eel_conv_block("enc2", "enc2.0", mlp=False)
    r += _eel_conv_block("enc3", "enc3.0", mlp=True)
    r += _eel_conv_block("enc4", "enc4.0", mlp=True)
    r += [
        ("bottleneck_bn/BatchNorm_0", "bottleneck.0", "bn"),
        ("bottleneck_conv/Conv_0", "bottleneck.1", "conv"),
    ]
    r += _capmlp("bottleneck_mlp", "bottleneck.3")
    for i in range(1, 6):
        r.append((f"pred{i}/TorchConv_0/Conv_0", f"pred{i}.conv", "conv"))
    r += _eel_upconv("edge_up4", "edge_upconv_4.0", mlp=True)
    r += _eel_conv_block("edge_conv4", "edge_upconv_4.1", mlp=True)
    r += _eel_upconv("edge_up3", "edge_upconv_3.0", mlp=True)
    r += _eel_conv_block("edge_conv3", "edge_upconv_3.1", mlp=True)
    # edge_upconv_2/1 have HighFourierTransform (no params) at index 1
    r += _eel_upconv("edge_up2", "edge_upconv_2.0", mlp=False)
    r += _eel_conv_block("edge_conv2", "edge_upconv_2.2", mlp=False)
    r += _eel_upconv("edge_up1", "edge_upconv_1.0", mlp=False)
    r += _eel_conv_block("edge_conv1", "edge_upconv_1.2", mlp=False)
    r += _eel_upconv("upconv4", "upconv4", mlp=True)
    r += _eel_upconv("upconv3", "upconv3", mlp=True)
    r += _eel_upconv("upconv2", "upconv2", mlp=False)
    r += _eel_upconv("upconv1", "upconv1", mlp=False)
    r += _eel_conv_block("dec4", "dec4", mlp=True, interleave=True)
    r += _eel_conv_block("dec3", "dec3", mlp=True, interleave=True)
    r += _eel_conv_block("dec2", "dec2", mlp=False, interleave=True)
    r += _eel_conv_block("dec1", "dec1", mlp=False, interleave=True)
    r += [
        ("final_ln/LayerNorm_0", "final.0", "ln"),
        ("final_conv/Conv_0", "final.1", "conv"),
    ]
    return r


def _unext_rules() -> List[Rule]:
    r: List[Rule] = []
    for i in (1, 2, 3):
        r.append((f"encoder{i}/Conv_0", f"encoder{i}", "conv"))
        r.append((f"ebn{i}/BatchNorm_0", f"ebn{i}", "bn"))
    for pe in ("patch_embed3", "patch_embed4"):
        r.append((f"{pe}/proj", f"{pe}.proj", "conv"))
        r.append((f"{pe}/norm", f"{pe}.norm", "ln"))
    # blockN are single-element ModuleLists (unext.py:220-238)
    for fb, tb in [("block1", "block1.0"), ("block2", "block2.0"),
                   ("dblock1", "dblock1.0"), ("dblock2", "dblock2.0")]:
        r.append((f"{fb}/norm2", f"{tb}.norm2", "ln"))
        r.append((f"{fb}/mlp/fc1", f"{tb}.mlp.fc1", "dense"))
        r.append((f"{fb}/mlp/dwconv/Conv_0", f"{tb}.mlp.dwconv.dwconv", "conv"))
        r.append((f"{fb}/mlp/fc2", f"{tb}.mlp.fc2", "dense"))
    for n in ("norm3", "norm4", "dnorm3", "dnorm4"):
        r.append((n, n, "ln"))
    for i in (1, 2, 3, 4, 5):
        r.append((f"decoder{i}/Conv_0", f"decoder{i}", "conv"))
    for i in (1, 2, 3, 4):
        r.append((f"dbn{i}/BatchNorm_0", f"dbn{i}", "bn"))
    r.append(("final/Conv_0", "final", "conv"))
    return r


def _ghpa(fp: str, tp: str) -> List[Rule]:
    """Grouped multi-axis Hadamard Product Attention (egeunet.py:96-160)."""
    return [
        (f"{fp}/params_xy", f"{tp}.params_xy", "ghpa_param"),
        (f"{fp}/params_zx", f"{tp}.params_zx", "ghpa_param"),
        (f"{fp}/params_zy", f"{tp}.params_zy", "ghpa_param"),
        (f"{fp}/conv_xy_dw/Conv_0", f"{tp}.conv_xy.0", "conv"),
        (f"{fp}/conv_xy_pw/Conv_0", f"{tp}.conv_xy.2", "conv"),
        (f"{fp}/conv_zx_dw/Conv_0", f"{tp}.conv_zx.0", "conv1d"),
        (f"{fp}/conv_zx_pw/Conv_0", f"{tp}.conv_zx.2", "conv1d"),
        (f"{fp}/conv_zy_dw/Conv_0", f"{tp}.conv_zy.0", "conv1d"),
        (f"{fp}/conv_zy_pw/Conv_0", f"{tp}.conv_zy.2", "conv1d"),
        (f"{fp}/dw_pw/Conv_0", f"{tp}.dw.0", "conv"),
        (f"{fp}/dw_dw/Conv_0", f"{tp}.dw.2", "conv"),
        (f"{fp}/norm1/LayerNorm_0", f"{tp}.norm1", "ln"),
        (f"{fp}/norm2/LayerNorm_0", f"{tp}.norm2", "ln"),
        (f"{fp}/ldw_dw/Conv_0", f"{tp}.ldw.0", "conv"),
        (f"{fp}/ldw_pw/Conv_0", f"{tp}.ldw.2", "conv"),
    ]


def _egeunet_rules() -> List[Rule]:
    r: List[Rule] = []
    r.append(("encoder1/Conv_0", "encoder1.0", "conv"))
    r.append(("encoder2/Conv_0", "encoder2.0", "conv"))
    r.append(("encoder3_conv/Conv_0", "encoder3.0", "conv"))
    # ConvLayer (egeunet.py:163-183)
    r += [
        ("encoder3_block/conv1/Conv_0", "encoder3.1.conv1", "conv"),
        ("encoder3_block/norm1/BatchNorm_0", "encoder3.1.norm1", "bn"),
        ("encoder3_block/conv2/Conv_0", "encoder3.1.conv2", "conv"),
        ("encoder3_block/conv3/Conv_0", "encoder3.1.conv3", "conv"),
        ("encoder3_block/norm2/BatchNorm_0", "encoder3.1.norm2", "bn"),
    ]
    for f, t in [("encoder4", "encoder4.0"), ("encoder5", "encoder5.0"),
                 ("encoder6", "encoder6.0"), ("decoder1", "decoder1.0"),
                 ("decoder2", "decoder2.0"), ("decoder3", "decoder3.0")]:
        r += _ghpa(f, t)
    for i in (1, 2, 3):
        r.append((f"down{i}/bn/BatchNorm_0", f"Down{i}.bn", "bn"))
        r.append((f"down{i}/conv/Conv_0", f"Down{i}.conv", "conv"))
    for i in (1, 2, 3, 4, 5):
        r.append((f"ebn{i}/GroupNorm_0", f"ebn{i}", "gn"))
        r.append((f"dbn{i}/GroupNorm_0", f"dbn{i}", "gn"))
        r.append((f"pred{i}/conv/Conv_0", f"pred{i}.conv", "conv"))
    r.append(("decoder4/Conv_0", "decoder4.0", "conv"))
    r.append(("decoder5/Conv_0", "decoder5.0", "conv"))
    r.append(("final/Conv_0", "final", "conv"))
    return r


def _mal_dwc(fp: str, tp: str) -> List[Rule]:
    """DepthWiseConv2d (malunet.py:9-19)."""
    return [
        (f"{fp}/conv1/Conv_0", f"{tp}.conv1", "conv"),
        (f"{fp}/norm/GroupNorm_0", f"{tp}.norm_layer", "gn"),
        (f"{fp}/conv2/Conv_0", f"{tp}.conv2", "conv"),
    ]


def _mal_dga(fp: str, tp: str) -> List[Rule]:
    """DilatedGatedAttention + GAU (malunet.py:22-76). GAU w1/w2/wo are
    Sequential(DepthWiseConv2d, activation) so params live at .0."""
    r = [(f"{fp}/mda{i}/Conv_0", f"{tp}.mda{i}", "conv") for i in range(4)]
    r += [
        (f"{fp}/norm/GroupNorm_0", f"{tp}.norm_layer", "gn"),
        (f"{fp}/conv/Conv_0", f"{tp}.conv", "conv"),
        (f"{fp}/gau/cw/Conv_0", f"{tp}.gau.cw", "conv"),
    ]
    for w in ("w1", "w2", "wo"):
        r += _mal_dwc(f"{fp}/gau/{w}", f"{tp}.gau.{w}.0")
    return r


def _mal_ea(fp: str, tp: str) -> List[Rule]:
    """EAblock (malunet.py:79-111)."""
    return [
        (f"{fp}/conv1/Conv_0", f"{tp}.conv1", "conv"),
        (f"{fp}/linear_0", f"{tp}.linear_0", "ea_dense"),
        (f"{fp}/linear_1", f"{tp}.linear_1", "ea_dense"),
        (f"{fp}/conv2/Conv_0", f"{tp}.conv2", "conv"),
        (f"{fp}/norm/GroupNorm_0", f"{tp}.norm_layer", "gn"),
    ]


def _malunet_rules() -> List[Rule]:
    r: List[Rule] = []
    for i in (1, 2, 3):
        r.append((f"encoder{i}/Conv_0", f"encoder{i}.0", "conv"))
    for i in (4, 5, 6):  # Sequential(EAblock, DGA) (malunet.py:216-226)
        r += _mal_ea(f"encoder{i}_ea", f"encoder{i}.0")
        r += _mal_dga(f"encoder{i}_dga", f"encoder{i}.1")
    for i in (1, 2, 3):  # Sequential(DGA, EAblock) (malunet.py:233-243)
        r += _mal_dga(f"decoder{i}_dga", f"decoder{i}.0")
        r += _mal_ea(f"decoder{i}_ea", f"decoder{i}.1")
    r.append(("decoder4/Conv_0", "decoder4.0", "conv"))
    r.append(("decoder5/Conv_0", "decoder5.0", "conv"))
    for i in (1, 2, 3, 4, 5):
        r.append((f"ebn{i}/GroupNorm_0", f"ebn{i}", "gn"))
        r.append((f"dbn{i}/GroupNorm_0", f"dbn{i}", "gn"))
    # SC_Att_Bridge (malunet.py:114-195)
    r.append(("scab/satt/shared_conv/Conv_0", "scab.satt.shared_conv2d.0", "conv"))
    r.append(("scab/catt/get_all_att", "scab.catt.get_all_att", "conv1d"))
    for i in (1, 2, 3, 4, 5):
        r.append((f"scab/catt/att{i}", f"scab.catt.att{i}", "dense"))
    r.append(("final/Conv_0", "final", "conv"))
    return r


RULES = {
    "unet": _unet_rules,
    "eelunet": _eelunet_rules,
    "unext": _unext_rules,
    "unext_s": _unext_rules,  # identical names, smaller dims (unext.py:328-462)
    "egeunet": _egeunet_rules,
    "malunet": _malunet_rules,
}


# ------------------------------------------------------------------- applier

def _set(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def port_state_dict(model_name: str, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a reference state_dict (numpy arrays) into flax ``variables``
    ({'params': ..., 'batch_stats': ...}). Raises if any torch tensor is
    unconsumed or any expected tensor is missing."""
    if model_name not in RULES:
        raise KeyError(
            f"no torch import mapping for model '{model_name}' "
            f"(supported: {sorted(RULES)})"
        )
    sd = dict(sd)
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def take(name: str) -> np.ndarray:
        if name not in sd:
            raise KeyError(f"{model_name}: reference state_dict is missing '{name}'")
        return np.asarray(sd.pop(name), dtype=np.float32)

    for flax_dir, tp, kind in RULES[model_name]():
        if kind in ("conv", "conv_il"):
            w = _conv_w(take(f"{tp}.weight"))
            if kind == "conv_il":
                w = _interleave_to_concat(w)
            _set(params, f"{flax_dir}/kernel", w)
            if f"{tp}.bias" in sd:
                _set(params, f"{flax_dir}/bias", take(f"{tp}.bias"))
        elif kind == "convt":
            _set(params, f"{flax_dir}/kernel", _convt_w(take(f"{tp}.weight")))
            _set(params, f"{flax_dir}/bias", take(f"{tp}.bias"))
        elif kind == "conv1d":
            _set(params, f"{flax_dir}/kernel", _conv1d_w(take(f"{tp}.weight")))
            if f"{tp}.bias" in sd:
                _set(params, f"{flax_dir}/bias", take(f"{tp}.bias"))
        elif kind == "dense":
            _set(params, f"{flax_dir}/kernel", take(f"{tp}.weight").T)
            _set(params, f"{flax_dir}/bias", take(f"{tp}.bias"))
        elif kind == "ea_dense":
            _set(params, flax_dir, take(f"{tp}.weight")[:, :, 0].T)
        elif kind == "ghpa_param":
            _set(params, flax_dir, np.transpose(take(tp), (0, 2, 3, 1)))
        elif kind in ("ln", "gn"):
            _set(params, f"{flax_dir}/scale", take(f"{tp}.weight"))
            _set(params, f"{flax_dir}/bias", take(f"{tp}.bias"))
        elif kind == "bn":
            _set(params, f"{flax_dir}/scale", take(f"{tp}.weight"))
            _set(params, f"{flax_dir}/bias", take(f"{tp}.bias"))
            _set(batch_stats, f"{flax_dir}/mean", take(f"{tp}.running_mean"))
            _set(batch_stats, f"{flax_dir}/var", take(f"{tp}.running_var"))
        else:  # pragma: no cover
            raise ValueError(f"unknown rule kind {kind}")

    leftovers = [k for k in sd if not k.endswith("num_batches_tracked")]
    if leftovers:
        raise ValueError(
            f"{model_name}: {len(leftovers)} reference tensors were not mapped: "
            f"{leftovers[:8]}{'...' if len(leftovers) > 8 else ''}"
        )
    return {"params": params, "batch_stats": batch_stats}


def _concat_to_interleave(kernel):
    """Inverse of _interleave_to_concat: cin [d...|e...] -> [d0,e0,d1,e1,..]."""
    n = kernel.shape[-2] // 2
    out = np.empty_like(kernel)
    out[..., 0::2, :] = kernel[..., :n, :]
    out[..., 1::2, :] = kernel[..., n:, :]
    return out


def export_state_dict(model_name: str, variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`port_state_dict`: flax ``variables`` -> a reference
    ``state_dict`` (name -> numpy) that ``load_state_dict(strict=True)`` s
    into the reference torch model.

    This is the MIGRATION-OUT surface the reference lacks entirely: weights
    trained here (e.g. at resolutions the reference's single-core training
    could never reach) drop back into the upstream eval/serving stack
    (evaluate.py:172-176, test.py:82-86). Every layout conversion documented
    in the module docstring is applied in reverse; ``num_batches_tracked``
    buffers are emitted as zeros (torch ``_BatchNorm`` state that has no
    flax counterpart and does not affect eval-mode math).

    Round-trip identity (port(export(v)) == v bit-for-bit) and torch
    forward parity are pinned by tests/test_torch_export.py.
    """
    if model_name not in RULES:
        raise KeyError(
            f"no torch export mapping for model '{model_name}' "
            f"(supported: {sorted(RULES)})"
        )
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})

    def grab(tree: Dict[str, Any], path: str) -> np.ndarray:
        node = tree
        for p in path.split("/"):
            if not isinstance(node, dict) or p not in node:
                raise KeyError(f"{model_name}: flax tree is missing '{path}'")
            node = node[p]
        return np.asarray(node, dtype=np.float32)

    def has(tree: Dict[str, Any], path: str) -> bool:
        node = tree
        for p in path.split("/"):
            if not isinstance(node, dict) or p not in node:
                return False
            node = node[p]
        return True

    sd: Dict[str, np.ndarray] = {}
    for flax_dir, tp, kind in RULES[model_name]():
        if kind in ("conv", "conv_il"):
            w = grab(params, f"{flax_dir}/kernel")
            if kind == "conv_il":
                w = _concat_to_interleave(w)
            sd[f"{tp}.weight"] = np.transpose(w, (3, 2, 0, 1))
            if has(params, f"{flax_dir}/bias"):
                sd[f"{tp}.bias"] = grab(params, f"{flax_dir}/bias")
        elif kind == "convt":
            w = grab(params, f"{flax_dir}/kernel")[::-1, ::-1]
            sd[f"{tp}.weight"] = np.transpose(w, (2, 3, 0, 1)).copy()
            sd[f"{tp}.bias"] = grab(params, f"{flax_dir}/bias")
        elif kind == "conv1d":
            w = grab(params, f"{flax_dir}/kernel")  # (k,1,I,O)
            sd[f"{tp}.weight"] = np.transpose(w, (3, 2, 0, 1))[:, :, :, 0].copy()
            if has(params, f"{flax_dir}/bias"):
                sd[f"{tp}.bias"] = grab(params, f"{flax_dir}/bias")
        elif kind == "dense":
            sd[f"{tp}.weight"] = grab(params, f"{flax_dir}/kernel").T.copy()
            sd[f"{tp}.bias"] = grab(params, f"{flax_dir}/bias")
        elif kind == "ea_dense":
            sd[f"{tp}.weight"] = grab(params, flax_dir).T[:, :, None].copy()
        elif kind == "ghpa_param":
            sd[tp] = np.transpose(grab(params, flax_dir), (0, 3, 1, 2)).copy()
        elif kind in ("ln", "gn"):
            sd[f"{tp}.weight"] = grab(params, f"{flax_dir}/scale")
            sd[f"{tp}.bias"] = grab(params, f"{flax_dir}/bias")
        elif kind == "bn":
            sd[f"{tp}.weight"] = grab(params, f"{flax_dir}/scale")
            sd[f"{tp}.bias"] = grab(params, f"{flax_dir}/bias")
            sd[f"{tp}.running_mean"] = grab(batch_stats, f"{flax_dir}/mean")
            sd[f"{tp}.running_var"] = grab(batch_stats, f"{flax_dir}/var")
            sd[f"{tp}.num_batches_tracked"] = np.zeros((), dtype=np.int64)
        else:  # pragma: no cover
            raise ValueError(f"unknown rule kind {kind}")
    return sd


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth`` into a name->numpy dict (CPU, no grads)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def validate_against_model(model_name: str, variables: Dict[str, Any], image_size: int = 64,
                           in_channels: int = 3) -> None:
    """Cheap structural check: ported trees must exactly match the flax
    model's own init structure (paths + shapes), via ``jax.eval_shape``."""
    import jax
    import jax.numpy as jnp

    from eelunet_tpu.registry import _build

    model = _build(model_name)()
    x = jnp.zeros((1, image_size, image_size, in_channels))
    want = jax.eval_shape(lambda k: model.init(k, x, train=False), jax.random.PRNGKey(0))
    for col in ("params", "batch_stats"):
        w = want.get(col, {})
        g = variables.get(col, {})
        wf = {"/".join(str(getattr(k, "key", k)) for k in p): v.shape
              for p, v in jax.tree_util.tree_flatten_with_path(w)[0]}
        gf = {"/".join(str(getattr(k, "key", k)) for k in p): np.shape(v)
              for p, v in jax.tree_util.tree_flatten_with_path(g)[0]}
        missing = sorted(set(wf) - set(gf))
        extra = sorted(set(gf) - set(wf))
        bad = sorted(k for k in wf.keys() & gf.keys() if tuple(wf[k]) != tuple(gf[k]))
        if missing or extra or bad:
            raise ValueError(
                f"{model_name} {col} mismatch: missing={missing[:5]} "
                f"extra={extra[:5]} shape-mismatch={[(k, wf[k], gf[k]) for k in bad[:5]]}"
            )
