"""Import reference PyTorch model classes from /root/reference for parity
tests, stubbing the heavyweight deps the reference imports but never needs at
inference time (timm/mmcv/torchvision/torchsummary — SURVEY.md §2.9).

The reference tree is read-only PUBLIC content: we instantiate its nn.Modules
to produce golden outputs, nothing more.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def install_stubs() -> None:
    import torch.nn as nn

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with __import__("torch").no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    class DropPath(nn.Identity):
        def __init__(self, drop_prob=0.0):
            super().__init__()

    timm = _stub("timm")
    timm_models = _stub("timm.models")
    layers = _stub(
        "timm.models.layers",
        DropPath=DropPath, to_2tuple=to_2tuple, trunc_normal_=trunc_normal_,
    )
    timm.models = timm_models
    timm_models.layers = layers

    mmcv = _stub("mmcv")
    mmcv.cnn = _stub("mmcv.cnn", ConvModule=object)

    tv = _stub("torchvision")
    tv.transforms = _stub("torchvision.transforms", Resize=object, ToTensor=object)
    tv.utils = _stub("torchvision.utils", save_image=lambda *a, **k: None)

    _stub("torchsummary", summary=lambda *a, **k: None)


def load_reference_module(module: str):
    """Import e.g. 'models.EELUnet' from the reference tree with stubs."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    mod = __import__(module, fromlist=["*"])
    # The reference EELUnet forward writes 10 matplotlib PNGs per call
    # (EELUnet.py:389-462); neutralize the debug side effect.
    if hasattr(mod, "visualize_feature_maps"):
        mod.visualize_feature_maps = lambda *a, **k: None
    if hasattr(mod, "visualize_images"):
        mod.visualize_images = lambda *a, **k: None
    return mod
