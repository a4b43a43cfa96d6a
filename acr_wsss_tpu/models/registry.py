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
from typing import Callable, Dict, List

_model_entrypoints: Dict[str, Callable] = {}


def register_model(fn: Callable) -> Callable:
    name = fn.__name__
    if name in _model_entrypoints:
        raise ValueError(f"model {name!r} already registered")
    _model_entrypoints[name] = fn
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


def list_models(filter: str = "") -> List[str]:
    names = sorted(_model_entrypoints)
    if filter:
        names = fnmatch.filter(names, filter)
    return names


def create_model(name: str, pretrained: bool = False,
                 features_only: bool = False, out_indices=None,
                 feature_cls: str = "list", out_map=None, **kwargs):
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
    variables graft unchanged — the wrapper delegates ``init``."""
    model = model_entrypoint(name)(**kwargs)
    if features_only:
        from acr_wsss_tpu.models.features import FeatureExtractor
        model = FeatureExtractor(model, out_indices=out_indices, name=name,
                                 as_dict=(feature_cls == "dict"),
                                 out_map=out_map)
    if not pretrained:
        return model
    from acr_wsss_tpu.models import zoo
    from acr_wsss_tpu.utils.checkpoint import load_params_npz

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
