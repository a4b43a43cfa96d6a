"""Feature-pyramid extraction wrappers (``features_only`` parity).

The reference turns any registered CNN backbone into a pyramid-feature
extractor via ``create_model(name, features_only=True)`` —
``build_model_with_cfg`` wraps the torch module in a ``FeatureListNet``
that replays forward hooks and exposes a ``feature_info`` table of
(reduction, channels) per tap (``/root/reference/models/features.py``,
wiring at ``models/helpers.py:446-460``). ViT-family models refuse the
flag (``models/vision_transformer.py:616-617``).

Here the backbones are functional and already *return* their pyramid
taps (``{"logits", "features", "taps"}`` contract, four stage outputs),
so no hook machinery is needed: this wrapper selects and orders the
taps, and derives ``feature_info`` from an abstract ``jax.eval_shape``
trace — zero FLOPs, zero device memory — instead of module bookkeeping.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp


def _ordered_taps(out: Any, name: str) -> List[Any]:
    """The taps of one model output, deepest-last.

    Mirrors the reference's refusal for models that expose no pyramid
    (``models/vision_transformer.py:616-617``)."""
    if not isinstance(out, dict) or "taps" not in out:
        raise RuntimeError(
            f"features_only not implemented for {name!r}: the model does "
            "not export pyramid taps (the reference raises the same for "
            "its ViT/Swin families)")
    taps = out["taps"]
    if isinstance(taps, dict):
        vals = [taps[k] for k in sorted(taps)]
    else:
        vals = list(taps)
    if not vals or any(v.ndim != 4 for v in vals):
        # Token-sequence taps (B, N, C) are not a spatial pyramid —
        # the reference's features_only likewise refuses ViT-family
        # models (models/vision_transformer.py:616-617).
        raise RuntimeError(
            f"features_only not implemented for {name!r}: taps are not "
            "spatial NHWC pyramid maps (token-sequence backbones refuse "
            "features_only, as in the reference)")
    return vals


class FeatureExtractor:
    """A backbone reduced to its feature pyramid (``FeatureListNet``).

    ``init`` delegates to the wrapped model (the full variable tree —
    pretrained checkpoints graft unchanged); ``apply`` returns the
    selected taps as a list, threading flax's ``mutable`` tuple form
    through untouched so BN-stat updates still work.

    ``as_dict=True`` gives the reference's ``FeatureDictNet`` shape
    (``models/features.py:153``): ``{key: tap}`` keyed by tap index, or
    by ``out_map`` names when given (``FeatureDictNet(out_map=...)``).
    """

    def __init__(self, model: Any, out_indices: Optional[Sequence[int]]
                 = None, name: str = "?", as_dict: bool = False,
                 out_map: Optional[Sequence[Any]] = None):
        self.model = model
        self.out_indices = (tuple(out_indices)
                            if out_indices is not None else None)
        self.name = name
        self.as_dict = as_dict or out_map is not None
        self.out_map = tuple(out_map) if out_map is not None else None

    def init(self, rngs, x, **kwargs):
        return self.model.init(rngs, x, **kwargs)

    def apply(self, variables, x, **kwargs):
        out = self.model.apply(variables, x, **kwargs)
        if isinstance(out, tuple):  # (out, mutated-collections)
            return self._select(out[0]), out[1]
        return self._select(out)

    def _select(self, out):
        vals = _ordered_taps(out, self.name)
        idx = list(self.out_indices if self.out_indices is not None
                   else range(len(vals)))
        picked = [vals[i] for i in idx]
        if self.as_dict:
            keys = self.out_map if self.out_map is not None else idx
            if len(keys) != len(picked):
                raise ValueError(
                    f"out_map has {len(keys)} names for {len(picked)} taps")
            return dict(zip(keys, picked))
        return picked

    def feature_info(self, input_size: int = 224) -> List[Dict[str, int]]:
        """(reduction, num_chs) per selected tap, like the reference's
        ``model.feature_info`` (``models/features.py:FeatureInfo``),
        computed by abstract evaluation at ``input_size``²."""
        x = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda k: self.model.init(k, x, train=True), jax.random.key(0))

        def fwd(v):
            return self._select(self.model.apply(v, x, train=False))

        feats = jax.eval_shape(fwd, variables)
        if isinstance(feats, dict):
            feats = list(feats.values())
        return [{"reduction": input_size // int(f.shape[1]),
                 "num_chs": int(f.shape[-1])} for f in feats]
