"""Helpers to load the reference PyTorch implementation as a parity oracle.

Used ONLY by tests, and only when ``/root/reference`` is mounted. The
reference's vendored timm snapshot imports a handful of symbols from the
real ``timm`` package (not installed here); a minimal shim supplies them.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def install_timm_shim() -> None:
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    timm.__version__ = "0.4.5-shim"

    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    data.IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
    data.IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)
    data.IMAGENET_DPN_MEAN = (124 / 255, 117 / 255, 104 / 255)
    data.IMAGENET_DPN_STD = tuple(1 / (0.0167 * 255) for _ in range(3))

    models = types.ModuleType("timm.models")

    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn

    helpers = types.ModuleType("timm.models.helpers")
    helpers.load_pretrained = lambda *a, **k: None
    helpers.build_model_with_cfg = lambda *a, **k: None

    layers = types.ModuleType("timm.models.layers")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(mean + a * std, mean + b * std)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    layers.DropPath = DropPath
    layers.trunc_normal_ = trunc_normal_
    layers.to_2tuple = to_2tuple

    vt = types.ModuleType("timm.models.vision_transformer")

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    vt.Mlp = Mlp

    timm.data = data
    timm.models = models
    models.registry = registry
    models.helpers = helpers
    models.layers = layers
    models.vision_transformer = vt

    for name, mod in [
        ("timm", timm), ("timm.data", data), ("timm.models", models),
        ("timm.models.registry", registry), ("timm.models.helpers", helpers),
        ("timm.models.layers", layers), ("timm.models.vision_transformer", vt),
    ]:
        sys.modules[name] = mod


def install_tool_imutils_shim() -> None:
    """``tool/torchutils.py:7`` imports ``tool.imutils`` at module scope,
    which pulls in pydensecrf + torchvision (not installed here). The parity
    tests only need ``tool.torchutils``'s PolyOptimizer, which never touches
    imutils — an empty stub satisfies the import."""
    if "tool.imutils" in sys.modules:
        return
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import tool  # the reference's namespace package

    stub = types.ModuleType("tool.imutils")
    sys.modules["tool.imutils"] = stub
    tool.imutils = stub


def load_reference_acr(backbone_name: str, num_classes: int = 20):
    """Instantiate the reference torch ACR model with random weights."""
    install_timm_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import numpy as np  # noqa: F401
    # reference myTool/np compat: np.float/np.bool were removed in numpy>=1.24
    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]
    if not hasattr(np, "bool"):
        np.bool = bool  # type: ignore[attr-defined]
    import torch

    torch.manual_seed(0)
    from DPT.ACR import ACR as RefACR  # type: ignore

    model = RefACR(num_classes=num_classes, backbone_name=backbone_name,
                   use_pretrain=False)
    model.eval()
    return model
