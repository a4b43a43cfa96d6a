"""Serving export: package the CAM-inference program as a portable,
ahead-of-time-compiled artifact via ``jax.export`` (StableHLO).

The reference has no deployment story — serving its CAMs means shipping
the torch checkpoint plus the whole Python model zoo and paying eager
per-class backwards at request time (``infer_cam.py:102-247``). Here the
ENTIRE inference computation — trunk forward, the one-vjp GETAM backward
for all requested class slots, affinity refinement, patch-CAM head —
is a single traced program (``infer_cam.build_infer_fn``), so it exports
losslessly to a self-describing StableHLO module that any PJRT runtime
(TPU serving container, CPU box) can load WITHOUT this package or its
Python dependencies:

    # producer (this repo)
    python -m acr_wsss_tpu.serving --weights weight/acr_tpu_last.npz \
        --backbone vitb_hybrid --crop 384 --out acr_cam.jaxexp

    # consumer (any jax-present runtime; no acr_wsss_tpu import)
    exported = jax.export.deserialize(pathlib.Path("acr_cam.jaxexp").read_bytes())
    out = exported.call(params, images, class_ids)

Weights stay OUTSIDE the artifact by default (passed as the first call
argument, loaded from the companion npz) — closing over them would bake
hundreds of MB of constants into the HLO and break remote/AOT compile
paths (see ``infer_cam.build_infer_fn``). ``--embed_weights`` produces a
single-file artifact for deployments that prefer it.

Export targets the XLA attention path: the Pallas kernels are
TPU-specific custom calls, while ``platforms=('tpu','cpu')`` keeps one
artifact loadable on both (``ops/attention.py``; the tap/export policy —
truncated gradient taps, func-aware probs export — is shared with the
live path via ``getam.tap_config``).

Round-trip parity (export → serialize → deserialize → call == the live
``build_infer_fn``) is tested in ``tests/test_serving.py``.
"""

from __future__ import annotations

import argparse
import pathlib
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from acr_wsss_tpu.configs import ModelConfig, parse_bool as _parse_bool
from acr_wsss_tpu.getam import (GETAM_FUNCS, getam_cams,
                                make_forward_for_getam, tap_config)


def export_infer(
    model,
    params: Any,
    crop_size: int,
    batch: int = 2,
    *,
    start_layer: int = 10,
    getam_func: str = "grad",
    use_aff: bool = True,
    num_classes: int = 20,
    class_slots: int = 0,
    platforms: Sequence[str] = ("tpu", "cpu"),
    embed_weights: bool = False,
) -> "jax.export.Exported":
    """Trace + lower the CAM-inference program for serving.

    The exported calling convention is ``call(params, x, class_ids)`` —
    or ``call(x, class_ids)`` with ``embed_weights=True`` — where ``x`` is
    the (batch, crop, crop, 3) normalized image stack (batch=2 serves the
    reference's flip-TTA pair) and ``class_ids`` the (K,) class slots to
    backprop (K = class_slots or num_classes).
    """
    if getam_func not in GETAM_FUNCS:
        raise ValueError(f"getam_func must be one of {GETAM_FUNCS}")
    spec = model.spec
    grid = crop_size // 16
    n_tokens = grid * grid + spec.num_prefix_tokens
    k = class_slots or num_classes

    # Tap policy (truncated gradient taps + func-aware probs export) is
    # SHARED with infer_cam.build_infer_fn via getam.tap_config, so the
    # exported artifact cannot desynchronize from the live path.
    off_start, export = tap_config(model, start_layer, getam_func)

    def infer(p, x, class_ids):
        offsets_shape = (spec.depth - off_start, x.shape[0], spec.num_heads,
                         n_tokens, n_tokens)
        forward = make_forward_for_getam(model, p, x, export=export,
                                         with_patch_cam=True)
        cams, logits, _, patch_cam = getam_cams(
            forward, offsets_shape, num_classes=num_classes,
            start_layer=start_layer, func=getam_func,
            start_index=spec.num_prefix_tokens, use_aff=use_aff,
            class_ids=class_ids, offsets_start=off_start)
        return {"cams": cams, "patch_cam": patch_cam, "logits": logits}

    x_spec = jax.ShapeDtypeStruct((batch, crop_size, crop_size, 3),
                                  jnp.float32)
    ids_spec = jax.ShapeDtypeStruct((k,), jnp.int32)
    if embed_weights:
        fn = jax.jit(lambda x, ids: infer(params, x, ids))
        return jax.export.export(fn, platforms=tuple(platforms))(
            x_spec, ids_spec)
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        params)
    return jax.export.export(jax.jit(infer), platforms=tuple(platforms))(
        p_spec, x_spec, ids_spec)


def save_exported(path: str, exported: "jax.export.Exported") -> None:
    pathlib.Path(path).write_bytes(exported.serialize())


def load_exported(path: str) -> "jax.export.Exported":
    return jax.export.deserialize(bytearray(pathlib.Path(path).read_bytes()))


def main(argv: Optional[Sequence[str]] = None) -> None:
    from acr_wsss_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--weights", required=True, help="npz param file")
    parser.add_argument("--backbone", default="vitb_hybrid")
    parser.add_argument("--crop", default=384, type=int)
    parser.add_argument("--batch", default=2, type=int,
                        help="images per call (2 = the flip-TTA pair)")
    parser.add_argument("--start_layer", default=10, type=int)
    parser.add_argument("--getam_func", default="grad", choices=GETAM_FUNCS)
    parser.add_argument("--aff", default=True, type=_parse_bool)
    parser.add_argument("--num_classes", default=20, type=int)
    parser.add_argument("--class_slots", default=0, type=int)
    parser.add_argument("--platforms", default="tpu,cpu")
    parser.add_argument("--embed_weights", action="store_true")
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    from acr_wsss_tpu.train import build_model
    from acr_wsss_tpu.utils.checkpoint import load_params_npz

    loaded = load_params_npz(args.weights)
    params = loaded if "params" in loaded else {"params": loaded}
    model = build_model(ModelConfig(backbone=args.backbone,
                                    num_classes=args.num_classes,
                                    attn_impl="xla"))
    exported = export_infer(
        model, params, args.crop, args.batch,
        start_layer=args.start_layer, getam_func=args.getam_func,
        use_aff=args.aff, num_classes=args.num_classes,
        class_slots=args.class_slots,
        platforms=tuple(args.platforms.split(",")),
        embed_weights=args.embed_weights)
    save_exported(args.out, exported)
    size = pathlib.Path(args.out).stat().st_size
    print(f"exported {args.out} ({size / 1e6:.1f} MB, "
          f"platforms={args.platforms}, "
          f"calling convention: call({'x' if args.embed_weights else 'params, x'}, class_ids))")


if __name__ == "__main__":
    main()
