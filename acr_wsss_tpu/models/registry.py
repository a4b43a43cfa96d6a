"""Model registry/factory.

Same developer surface as the reference's timm-style registry
(``models/registry.py:21-46`` + ``models/factory.py:25-86``): builders
register under a name, ``create_model(name, **kwargs)`` resolves and
constructs. Checkpoint loading is explicit (see
``acr_wsss_tpu/models/convert.py`` and ``utils/checkpoint.py``) rather than
hidden behind URL downloads.
"""

from __future__ import annotations

import fnmatch
import re
from collections import defaultdict
from typing import Callable, Dict, List, Optional, Sequence, Set, Union

_model_entrypoints: Dict[str, Callable] = {}
_module_to_models: Dict[str, Set[str]] = defaultdict(set)
_model_to_module: Dict[str, str] = {}


def register_model(fn: Callable) -> Callable:
    name = fn.__name__
    if name in _model_entrypoints:
        raise ValueError(f"model {name!r} already registered")
    _model_entrypoints[name] = fn
    module = fn.__module__.rsplit(".", 1)[-1]
    _module_to_models[module].add(name)
    _model_to_module[name] = module
    return fn


def is_model(name: str) -> bool:
    return name in _model_entrypoints

def model_entrypoint(name: str) -> Callable:
    try:
        return _model_entrypoints[name]
    except KeyError:
        raise ValueError(
            f"Unknown model {name!r}. Known: {sorted(_model_entrypoints)}"
        ) from None


def _natural_key(s: str):
    # 'resnet101' sorts after 'resnet50' (reference models/registry.py:49-50)
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s.lower())]


def list_models(filter: str = "", module: str = "", pretrained: bool = False,
                exclude_filters: Union[str, Sequence[str]] = "") -> List[str]:
    """Query the registry (reference ``models/registry.py:53-81`` surface):
    fnmatch include/exclude filters, per-module restriction, and
    ``pretrained=True`` for names the weight zoo can actually fetch+convert
    (the reference's ``_model_has_pretrained`` = names with a cfg URL)."""
    names: Sequence[str] = (
        sorted(_module_to_models.get(module, ())) if module
        else list(_model_entrypoints)
    )
    if filter:
        names = fnmatch.filter(names, filter)
    if exclude_filters:
        if isinstance(exclude_filters, str):
            exclude_filters = [exclude_filters]
        for xf in exclude_filters:
            excluded = set(fnmatch.filter(names, xf))
            if excluded:
                names = [n for n in names if n not in excluded]
    if pretrained:
        names = [n for n in names if is_model_pretrained(n)]
    return sorted(names, key=_natural_key)


def list_modules() -> List[str]:
    return sorted(_module_to_models)


def is_model_in_modules(name: str, module_names) -> bool:
    assert isinstance(module_names, (tuple, list, set))
    return _model_to_module.get(name) in set(module_names)


def is_model_pretrained(name: str) -> bool:
    from acr_wsss_tpu.models import zoo
    return bool(zoo.ZOO_URLS.get(name))


def get_default_cfg(name: str) -> Optional[Dict]:
    """Data cfg (input_size/crop_pct/interpolation/mean/std/url/num_classes)
    for a registered name; see :mod:`acr_wsss_tpu.models.cfg`."""
    if not is_model(name):
        return None
    from acr_wsss_tpu.models.cfg import default_cfg
    return default_cfg(name)


def has_model_default_key(name: str, cfg_key: str) -> bool:
    cfg = get_default_cfg(name)
    return cfg is not None and cfg_key in cfg


def is_model_default_key(name: str, cfg_key: str) -> bool:
    cfg = get_default_cfg(name)
    return bool(cfg and cfg.get(cfg_key, False))


def get_model_default_value(name: str, cfg_key: str):
    cfg = get_default_cfg(name)
    return None if cfg is None else cfg.get(cfg_key, None)


def split_model_name(model_name: str):
    """'hf_hub:org/name' -> ('hf_hub', 'org/name'); bare names -> ('', name)
    (reference ``models/factory.py:7-14``)."""
    parts = model_name.split(":", 1)
    if len(parts) == 1:
        return "", parts[0]
    source, name = parts
    assert source in ("timm", "hf_hub")
    return source, name


def safe_model_name(model_name: str, remove_source: bool = True) -> str:
    if remove_source:
        model_name = split_model_name(model_name)[-1]
    return "".join(c if c.isalnum() else "_" for c in model_name).rstrip("_")


def create_model(name: str, pretrained: bool = False,
                 features_only: bool = False, out_indices=None,
                 feature_cls: str = "list", out_map=None,
                 checkpoint_path: str = "", scriptable=None, exportable=None,
                 no_jit=None, **kwargs):
    """Build a registered backbone; the factory of the reference
    (``models/factory.py:create_model``).

    With ``pretrained=True`` (reference ``models/helpers.py:24-49``
    semantics) returns ``(model, variables)`` where ``variables`` is the
    converted checkpoint tree from the weight zoo (fetched/cached via
    ``models/zoo.py``; ``file://`` URLs serve zero-egress hosts). The
    tree is directly ``model.apply``-able at the checkpoint's class
    count; to change ``num_classes``, init the model and graft with
    ``zoo.graft_standalone(init_tree, variables)`` — shape-mismatched
    leaves (the classifier) keep their fresh initialization, exactly as
    timm's ``load_pretrained`` classifier filtering.

    With ``features_only=True`` (reference ``models/helpers.py:446-460``
    → ``models/features.py:FeatureListNet``) the model is wrapped in a
    :class:`~acr_wsss_tpu.models.features.FeatureExtractor` whose
    ``apply`` returns the pyramid taps as a list (optionally selected by
    ``out_indices``) and which exposes ``feature_info()``. Pretrained
    variables graft unchanged — the wrapper delegates ``init``.

    ``checkpoint_path`` (reference ``models/factory.py:84-85``) loads an
    explicit checkpoint after build instead of the zoo URL: a ``.npz``
    native tree, or a torch ``.pth``/``.tar`` routed through the
    converter. ``scriptable``/``exportable``/``no_jit`` are the
    reference's torchscript layer-config toggles — meaningless for flax
    modules under jit (everything is traceable by construction), accepted
    so migrating call sites don't break. ``None``-valued kwargs are
    dropped before construction (reference ``models/factory.py:66-69``:
    CLI args default to None to mean "keep the model default")."""
    source, name = split_model_name(name)
    hf_ref = None
    if source == "hf_hub":
        # Reference flow (models/factory.py:69-73 + models/hub.py:85-91):
        # the repo's config.json names the architecture; the model is
        # built from that entrypoint and, with pretrained=True, weighted
        # from the repo's pytorch_model.bin. Zero-egress environments
        # point ACR_WSSS_HF_ENDPOINT at a file:// mirror of the repo tree.
        from acr_wsss_tpu.models import zoo

        hf_ref, hub_cfg = name, zoo.load_hf_model_config(name)
        arch = hub_cfg.get("architecture")
        if not arch or not is_model(arch):
            raise ValueError(
                f"hf_hub:{hf_ref} config.json architecture {arch!r} is not "
                "a registered model")
        name = arch
    kwargs = {k: v for k, v in kwargs.items() if v is not None}
    if hf_ref is not None:
        # Reference external_default_cfg semantics (models/factory.py:
        # 69-73 + hub.py:85-91): repo-specified build fields take effect
        # as defaults, so a hub repo with its own num_classes builds a
        # matching head without the caller re-specifying it. Explicit
        # kwargs still win. Only fields the entrypoint accepts are
        # applied (entrypoints without **kwargs would otherwise raise).
        import inspect

        ep = model_entrypoint(name)
        sig = inspect.signature(ep)
        has_var_kw = any(p.kind is inspect.Parameter.VAR_KEYWORD
                         for p in sig.parameters.values())
        for key in ("num_classes", "in_chans", "img_size"):
            if key not in hub_cfg:
                continue
            if has_var_kw or key in sig.parameters:
                kwargs.setdefault(key, hub_cfg[key])
    model = model_entrypoint(name)(**kwargs)
    if features_only:
        from acr_wsss_tpu.models.features import FeatureExtractor
        model = FeatureExtractor(model, out_indices=out_indices, name=name,
                                 as_dict=(feature_cls == "dict"),
                                 out_map=out_map)
    if checkpoint_path:
        from acr_wsss_tpu.utils.checkpoint import load_params_npz
        if checkpoint_path.endswith(".npz"):
            return model, load_params_npz(checkpoint_path)
        import torch
        from acr_wsss_tpu.models import zoo
        state = torch.load(checkpoint_path, map_location="cpu",
                           weights_only=True)
        for key in ("model", "state_dict"):
            if isinstance(state, dict) and key in state:
                state = state[key]
        return model, zoo.convert_state_dict(name, state)
    if not pretrained:
        return model
    from acr_wsss_tpu.models import zoo
    from acr_wsss_tpu.utils.checkpoint import load_params_npz

    if hf_ref is not None:
        return model, zoo.convert_state_dict(name,
                                             zoo.load_hf_state_dict(hf_ref))
    return model, load_params_npz(zoo.fetch(name))


# ---------------------------------------------------------------------------
# Named stubs for the breadth of the reference's vendored timm zoo
# (SURVEY.md §2.3 / §7 step 10: "out of scope except as named registry
# stubs"). Requesting one raises with a pointer to the implemented
# families so the nominal surface is discoverable.
# ---------------------------------------------------------------------------

# Every family of the reference zoo now has a real implementation
# (cnn.py, cnn_mobile.py, cnn_attn.py, cnn_misc.py, inception.py,
# hrnet.py, nfnet.py, tnt_coat.py, byob.py, nasnet.py, hybrid.py,
# swin.py, pit.py, vit.py); the stub mechanism remains for forward
# compatibility but the list is empty.
_STUB_FAMILIES = ()


def _make_stub(family: str):
    def stub(**kwargs):
        raise NotImplementedError(
            f"backbone family {family!r} is registered as a named stub "
            "and not implemented; see list_models() for the implemented "
            "zoo."
        )

    stub.__name__ = family
    return stub


for _family in _STUB_FAMILIES:
    if _family not in _model_entrypoints:
        _model_entrypoints[_family] = _make_stub(_family)
