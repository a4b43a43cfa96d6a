"""Pretrained-weight zoo: fetch + convert timm checkpoints to native npz.

The reference auto-downloads ImageNet-pretrained timm checkpoints at model
build time (``models/helpers.py:24-49``; URL tables
``models/vision_transformer.py:49-132``, ``vision_transformer_hybrid.py:45``).
This module is the TPU-native equivalent:

* the same upstream URLs for every backbone the ACR model wires;
* :func:`fetch` downloads the torch checkpoint (where the environment has
  egress), converts it through ``models/convert.py`` and stores a flat
  **npz zoo file** — the framework's native checkpoint format, loadable
  without torch;
* :func:`load_backbone_params` reads a zoo npz back into a flax param
  tree; :func:`init_with_pretrained` grafts it under a freshly-initialized
  ACR model (classifier head stays random, matching the reference's
  ``load_pretrained`` classifier-filtering behavior).

Zero-egress environments: run ``python -m acr_wsss_tpu.models.zoo fetch
<backbone>`` on a connected machine (or pass ``--url file://...`` for an
already-downloaded .pth) and ship the npz.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional


# Upstream checkpoint URLs for the wired backbones (reference cfg tables).
ZOO_URLS: Dict[str, str] = {
    "vitb_hybrid": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_base_resnet50_384-9fd3c705.pth",
    "vitb": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_base_p16_384-83fb41ba.pth",
    "vitl": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_large_p16_384-b3be5167.pth",
    "deit": "https://dl.fbaipublicfiles.com/deit/deit_base_patch16_384-8de9b5d1.pth",
    "deit_distilled": "https://dl.fbaipublicfiles.com/deit/deit_base_distilled_patch16_384-d0272ac0.pth",
}


def zoo_dir() -> str:
    return os.environ.get(
        "ACR_WSSS_ZOO",
        os.path.join(os.path.expanduser("~"), ".cache", "acr_wsss_tpu", "zoo"),
    )


def npz_path(backbone: str, directory: Optional[str] = None) -> str:
    return os.path.join(directory or zoo_dir(), f"{backbone}_in21k.npz")


def fetch(backbone: str, directory: Optional[str] = None,
          url: Optional[str] = None, timeout: float = 600.0) -> str:
    """Download + convert a pretrained checkpoint into the npz zoo.

    Returns the npz path. Raises a clear error when the environment has no
    egress — conversion from a local .pth works via ``url='file://...'``.
    """
    import urllib.error
    import urllib.request

    from acr_wsss_tpu.models.acr import resolve_backbone
    from acr_wsss_tpu.models.convert import torch_state_dict_to_flax
    from acr_wsss_tpu.utils.checkpoint import save_params_npz

    spec = resolve_backbone(backbone)
    url = url or ZOO_URLS.get(backbone)
    if not url:
        raise ValueError(f"no zoo URL for backbone {backbone!r}")
    directory = directory or zoo_dir()
    os.makedirs(directory, exist_ok=True)
    out = npz_path(backbone, directory)
    if os.path.exists(out):
        return out

    pth = os.path.join(directory, os.path.basename(url))
    if not os.path.exists(pth):
        try:
            urllib.request.urlretrieve(url, pth)  # noqa: S310
        except (urllib.error.URLError, OSError) as e:
            raise RuntimeError(
                f"cannot download {url} (no egress?): {e}. Fetch the file "
                f"on a connected machine and re-run with --url file://<path>."
            ) from e

    import torch

    state = torch.load(pth, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]  # deit checkpoints nest under 'model'
    # Raw timm checkpoints are unprefixed; the converter expects the
    # reference ACR layout (``pretrained.model.<timm name>``).
    state = {f"pretrained.model.{k}": v for k, v in state.items()}
    params = torch_state_dict_to_flax(
        state, num_prefix_tokens=spec.num_prefix_tokens)
    save_params_npz(out, params)
    return out


def load_backbone_params(backbone: str, directory: Optional[str] = None):
    """Zoo npz -> ``{'params': {'trunk': ...}}`` tree (no torch needed)."""
    from acr_wsss_tpu.utils.checkpoint import load_params_npz

    path = npz_path(backbone, directory)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found; run `python -m acr_wsss_tpu.models.zoo "
            f"fetch {backbone}` first (see module docstring for zero-egress "
            f"environments)")
    return load_params_npz(path)


def init_with_pretrained(model, rng, dummy_input,
                         directory: Optional[str] = None):
    """model.init with the trunk grafted from the zoo; head stays random
    (reference classifier-filtered ``load_pretrained``)."""
    params = model.init(rng, dummy_input)
    pretrained = load_backbone_params(model.backbone_name, directory)
    params = dict(params)
    inner = dict(params["params"])
    inner["trunk"] = pretrained["params"]["trunk"]
    params["params"] = inner
    return params


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="pretrained-weight zoo")
    sub = parser.add_subparsers(dest="cmd", required=True)
    f = sub.add_parser("fetch", help="download + convert to npz")
    f.add_argument("backbone", choices=sorted(ZOO_URLS))
    f.add_argument("--dir", default=None)
    f.add_argument("--url", default=None,
                   help="override source (file://... for local .pth)")
    ls = sub.add_parser("list", help="show zoo contents")
    ls.add_argument("--dir", default=None)
    args = parser.parse_args(argv)
    if args.cmd == "fetch":
        print(fetch(args.backbone, args.dir, args.url))
    else:
        d = args.dir or zoo_dir()
        for fn in sorted(os.listdir(d)) if os.path.isdir(d) else []:
            print(os.path.join(d, fn))


if __name__ == "__main__":
    main()
