"""CAM/GETAM inference: batched TTA, one jit program per image-independent part.

Reference pipeline (``infer_cam.py:128-249``): per image, per TTA view, per
present class — a full backward pass with ``retain_graph=True``, then
host-side upsample/normalize/save. The TPU redesign:

* both TTA views (identity + hflip) run as ONE batch of 2;
* the present classes' probability-gradients come from one ``jax.vjp``
  vmapped over class one-hots (see ``getam.py``) — a single K-stacked
  backward, no Python-loop backwards;
* everything at the fixed 384-crop resolution is jit-compiled once; only
  the per-image native-size resize + min-max normalization runs on host
  (shape-varying, bandwidth-trivial);
* the flipped view's CAM is un-flipped on the token grid (exact: bilinear
  resize commutes with mirroring on a symmetric grid).

Outputs are bit-compatible with the reference artifacts: per-image ``.npy``
dicts ``{class_id: HxW float32}`` consumed by ``evaluate.py``, optional
dense-CRF variants, optional JET heatmap JPEGs.
"""

from __future__ import annotations

import argparse
import functools
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from acr_wsss_tpu.configs import (InferConfig, ModelConfig, VOC_CLASSES,
                                  parse_bool)
from acr_wsss_tpu.data import transforms, voc as voc_data
from acr_wsss_tpu.getam import getam_cams, make_forward_for_getam, tap_config
from acr_wsss_tpu.models.acr import ACR
from acr_wsss_tpu.ops import imops
from acr_wsss_tpu.utils.checkpoint import load_params_npz


def build_infer_fn(model: ACR, params, crop_size: int, start_layer: int,
                   getam_func: str, use_aff: bool, num_classes: int,
                   class_slots: int = 0, mesh=None):
    """jit-compiled: (2, crop, crop, 3)[, slot ids] -> dict of device arrays.

    ``class_slots`` > 0 backprops only that many class slots per call (the
    reference loops present classes only, ``infer_cam.py:171-172``; typical
    VOC images carry 1-3 labels, so 4-8 slots cut the dominant per-class
    backward cost vs sweeping all 20).

    ``mesh`` (a 1-axis ``jax.sharding.Mesh`` named ``data``) runs the pass
    data-parallel across chips: each image's forward + GETAM vjp is
    independent along the batch (TTA-view) axis, so params are replicated
    and the view batch is sharded — GSPMD inserts no cross-chip collectives
    on the compute path. The batch size must divide by the mesh size
    (``run`` rounds ``batch_images`` up to guarantee it). The reference
    scales inference by launching one process per GPU over a file-list
    split; here one process drives the whole mesh with identical outputs.
    """
    spec = model.spec
    grid = crop_size // 16
    n_tokens = grid * grid + spec.num_prefix_tokens

    # Truncated gradient taps + func-aware probs export — the policy is
    # shared with serving.export_infer via getam.tap_config.
    off_start, export = tap_config(model, start_layer, getam_func)

    jit_kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        jit_kwargs["in_shardings"] = (
            NamedSharding(mesh, PartitionSpec()),        # params: replicated
            NamedSharding(mesh, PartitionSpec("data")),  # views: batch-sharded
            NamedSharding(mesh, PartitionSpec()),        # class ids: replicated
        )

    @functools.partial(jax.jit, **jit_kwargs)
    def infer_with_params(p, x, class_ids):
        # params are a jit ARGUMENT, not a closure: closed-over arrays get
        # baked into the serialized program as giant constants (hundreds
        # of MB of HLO), which breaks AOT/remote compilation paths.
        offsets_shape = (spec.depth - off_start, x.shape[0], spec.num_heads,
                         n_tokens, n_tokens)
        # One trunk evaluation serves GETAM (via vjp) AND the per-patch
        # CAM head (reference runs forward_cam separately,
        # infer_cam.py:155, on top of the per-class backwards).
        forward = make_forward_for_getam(model, p, x, export=export,
                                         with_patch_cam=True)
        cams, logits, _, patch_cam = getam_cams(
            forward, offsets_shape, num_classes=num_classes,
            start_layer=start_layer, func=getam_func,
            start_index=spec.num_prefix_tokens, use_aff=use_aff,
            class_ids=class_ids, offsets_start=off_start)
        return {
            "cams": cams,                    # (K, B, grid*grid)
            "patch_cam": patch_cam,          # (B, grid*grid, C)
            "logits": logits,
        }

    def infer(x, class_ids=None):
        if class_ids is None:
            class_ids = jnp.arange(class_slots or num_classes)
        return infer_with_params(params, x, jnp.asarray(class_ids))

    infer.class_slots = class_slots
    infer._cache_size = infer_with_params._cache_size
    return infer


def process_image(
    infer_fn,
    img_path: str,
    label: np.ndarray,
    crop_size: int,
    flip_tta: bool = True,
    scales: Sequence[float] = (1.0,),
    infer_fns_by_scale: Optional[Dict[float, Any]] = None,
    pamr_fn: Optional[Any] = None,
) -> Tuple[Dict[int, np.ndarray], Dict[int, np.ndarray], np.ndarray]:
    """Returns (getam cam_dict, patch cam_dict, original RGB image).

    ``pamr_fn`` (``ops.pamr.pamr_jit``) optionally refines each view's CAM
    with pixel-adaptive affinities of the crop at crop resolution — a
    capability the reference imports but never invokes
    (``infer_cam.py:14``, SURVEY.md §2.5); opt-in here via ``--pamr``.

    Multi-scale TTA (reference ``infer_cam.py:145-146`` scale hook /
    ``DPT/DPT.py:400-417``): each scale runs through its own fixed-shape
    compiled program (``infer_fns_by_scale``); CAMs are upsampled to native
    size and summed across scales and flips before normalization.
    """
    rgb = transforms.load_image_rgb(img_path)
    H, W = rgb.shape[:2]
    mask = (label > 1e-5)[:, None, None]
    num_classes = label.shape[0]
    present = [c for c in range(num_classes) if label[c] > 1e-5]
    if not present:
        return {}, {}, rgb

    cam_acc = None
    patch_acc = None
    for scale in scales:
        size = int(crop_size * scale)
        fn = (infer_fns_by_scale or {}).get(scale, infer_fn)
        x = transforms.val_transform(rgb, size)            # (size, size, 3)
        views = [x]
        if flip_tta:
            views.append(x[:, ::-1])
        batch = jnp.asarray(np.stack(views))
        grid = size // 16

        slots = getattr(fn, "class_slots", 0)
        if slots and present:
            # Backprop only the present classes, padded to the slot count
            # (multiple passes for the rare many-label image).
            cam_rows = np.zeros((num_classes, len(views), grid * grid),
                                np.float32)
            out = None
            for pos in range(0, len(present), slots):
                chunk = present[pos:pos + slots]
                ids = chunk + [chunk[-1]] * (slots - len(chunk))
                out = jax.device_get(fn(batch, np.asarray(ids, np.int32)))
                for row, cls in enumerate(chunk):
                    cam_rows[cls] = out["cams"][row]
            out = dict(out)
            out["cams"] = cam_rows
        else:
            out = jax.device_get(fn(batch))

        cams = out["cams"].reshape(num_classes, -1, grid, grid).copy()
        patch = out["patch_cam"].transpose(0, 2, 1).reshape(
            -1, num_classes, grid, grid).copy()
        if pamr_fn is not None:
            # guidance = the normalized crop views, reusing the device
            # array already uploaded for the infer pass (NHWC -> NCHW on
            # device; no second H2D copy); pamr upsamples the grid-res
            # CAM to crop res internally (align_corners=True)
            x_views = jnp.transpose(batch, (0, 3, 1, 2))
            refined = jax.device_get(
                pamr_fn(x_views, jnp.asarray(cams.transpose(1, 0, 2, 3))))
            cams = np.ascontiguousarray(refined.transpose(1, 0, 2, 3))
        if flip_tta:
            cams[:, 1] = cams[:, 1, :, ::-1]
            patch[1] = patch[1, :, :, ::-1]

        cam_up = imops.resize_bilinear_np(cams.sum(axis=1), (H, W),
                                          align_corners=True)
        patch_up = imops.resize_bilinear_np(patch.sum(axis=0), (H, W),
                                            align_corners=False)
        cam_acc = cam_up if cam_acc is None else cam_acc + cam_up
        patch_acc = patch_up if patch_acc is None else patch_acc + patch_up

    norm_cam = imops.minmax_normalize(cam_acc * mask)
    patch_norm = imops.minmax_normalize(patch_acc * mask, eps=1e-5)
    num_classes = norm_cam.shape[0]

    present = [c for c in range(num_classes) if label[c] > 1e-5]
    cam_dict = {c: norm_cam[c].astype(np.float32) for c in present}
    patch_dict = {c: patch_norm[c].astype(np.float32) for c in present}
    return cam_dict, patch_dict, rgb


def process_images_batched(
    infer_fn,
    img_paths: Sequence[str],
    labels_list: Sequence[np.ndarray],
    crop_size: int,
    flip_tta: bool = True,
    scales: Sequence[float] = (1.0,),
    infer_fns_by_scale: Optional[Dict[float, Any]] = None,
    pamr_fn: Optional[Any] = None,
):
    """Batched :func:`process_image`: V images per compiled pass.

    Measured per-image DEVICE time is nearly flat in V (59.8 ms at V=1 vs
    58.1 at V=4 on v5e; the vjp sweep scales with batch) — the win from
    batching is on the HOST side: per-group dispatch overhead and image
    loading/preprocessing overlap the device pass. Class slots sweep the
    UNION of the group's present classes, so grouping images with similar
    label sets is preferable. Outputs are identical to V single-image calls
    (asserted in tests).

    Returns a list of (cam_dict, patch_cam_dict, rgb) per image.
    """
    V = len(img_paths)
    rgbs = [transforms.load_image_rgb(p) for p in img_paths]
    num_classes = labels_list[0].shape[0]
    present_sets = [
        [c for c in range(num_classes) if lab[c] > 1e-5]
        for lab in labels_list
    ]
    union_present = sorted(set().union(*map(set, present_sets)))

    cam_accs: list = [None] * V
    patch_accs: list = [None] * V
    for scale in scales:
        size = int(crop_size * scale)
        fn = (infer_fns_by_scale or {}).get(scale, infer_fn)
        xs = [transforms.val_transform(rgb, size) for rgb in rgbs]
        views = list(xs)
        if flip_tta:
            views += [x[:, ::-1] for x in xs]
        batch = jnp.asarray(np.stack(views))
        grid = size // 16
        nB = len(views)

        slots = getattr(fn, "class_slots", 0)
        if slots and union_present:
            cam_rows = np.zeros((num_classes, nB, grid * grid), np.float32)
            out = None
            for pos in range(0, len(union_present), slots):
                chunk = union_present[pos:pos + slots]
                ids = chunk + [chunk[-1]] * (slots - len(chunk))
                out = jax.device_get(fn(batch, np.asarray(ids, np.int32)))
                for row, cls in enumerate(chunk):
                    cam_rows[cls] = out["cams"][row]
            out = dict(out)
            out["cams"] = cam_rows
        else:
            out = jax.device_get(fn(batch))

        cams = out["cams"].reshape(num_classes, nB, grid, grid)
        patch = out["patch_cam"].transpose(0, 2, 1).reshape(
            nB, num_classes, grid, grid)
        if pamr_fn is not None:
            # reuse the already-uploaded device batch as guidance (NHWC ->
            # NCHW on device; no second H2D copy)
            x_views = jnp.transpose(batch, (0, 3, 1, 2))
            refined = jax.device_get(
                pamr_fn(x_views, jnp.asarray(cams.transpose(1, 0, 2, 3))))
            cams = np.ascontiguousarray(refined.transpose(1, 0, 2, 3))
        for v in range(V):
            cam_v = cams[:, v]
            patch_v = patch[v]
            if flip_tta:
                cam_v = cam_v + cams[:, V + v, :, ::-1]
                patch_v = patch_v + patch[V + v, :, :, ::-1]
            H, W = rgbs[v].shape[:2]
            cam_up = imops.resize_bilinear_np(cam_v, (H, W),
                                              align_corners=True)
            patch_up = imops.resize_bilinear_np(patch_v, (H, W),
                                                align_corners=False)
            cam_accs[v] = cam_up if cam_accs[v] is None else cam_accs[v] + cam_up
            patch_accs[v] = (patch_up if patch_accs[v] is None
                             else patch_accs[v] + patch_up)

    results = []
    for v in range(V):
        if not present_sets[v]:
            results.append(({}, {}, rgbs[v]))
            continue
        mask = (labels_list[v] > 1e-5)[:, None, None]
        norm_cam = imops.minmax_normalize(cam_accs[v] * mask)
        patch_norm = imops.minmax_normalize(patch_accs[v] * mask, eps=1e-5)
        results.append((
            {c: norm_cam[c].astype(np.float32) for c in present_sets[v]},
            {c: patch_norm[c].astype(np.float32) for c in present_sets[v]},
            rgbs[v],
        ))
    return results


def crf_with_alpha(cam_dict: Dict[int, np.ndarray], alpha: float,
                   orig_img: np.ndarray) -> Dict[int, np.ndarray]:
    """Background-power CRF fusion (reference ``infer_cam.py:27-40``)."""
    from acr_wsss_tpu.ops import crf as crf_ops

    if not cam_dict:
        # No present classes: everything is background with certainty 1
        # (the reference never hits this — its label files always carry
        # >=1 class — but an empty dict must not crash the np.max below).
        return {0: np.ones(orig_img.shape[:2], np.float32)}
    v = np.array(list(cam_dict.values()))
    bg_score = np.power(1 - np.max(v, axis=0, keepdims=True), alpha)
    bgcam_score = np.concatenate((bg_score, v), axis=0)
    crf_score = crf_ops.crf_inference(
        orig_img, bgcam_score, labels=bgcam_score.shape[0])
    out = {0: crf_score[0]}
    for i, key in enumerate(cam_dict.keys()):
        out[key + 1] = crf_score[i + 1]
    return out


def make_crf_device_fn(pad: int):
    """jit-compiled on-device dense-CRF at ONE padded shape.

    Compiling ``crf_inference_jax`` once at (pad, pad) with the full label
    slab keeps the whole inference run on a single executable despite
    per-image native resolutions (pad-to-bucket, the TPU answer to
    pydensecrf's per-shape host calls)."""
    import jax

    from acr_wsss_tpu.ops import crf as crf_ops

    return jax.jit(lambda img, probs: crf_ops.crf_inference_jax(img, probs))


def crf_with_alpha_device(cam_dict: Dict[int, np.ndarray], alpha: float,
                          orig_img: np.ndarray, crf_fn,
                          num_classes: int = 20,
                          pad: int = 512) -> Dict[int, np.ndarray]:
    """On-device variant of :func:`crf_with_alpha` (``--crf_device``).

    Same background-power fusion semantics; differences vs the host path:
    the label axis is the full (num_classes+1) slab with absent classes at
    ~0 probability (the mean-field renormalization sends them to ~0, as
    dropping them does), and image+probs are edge-replicated to the
    (pad, pad) bucket then cropped back. Images larger than the bucket
    fall back to the native host engine."""
    H, W = orig_img.shape[:2]
    if not cam_dict:
        return {0: np.ones((H, W), np.float32)}
    if H > pad or W > pad:
        return crf_with_alpha(cam_dict, alpha, orig_img)
    v = np.array(list(cam_dict.values()))
    bg_score = np.power(1 - np.max(v, axis=0), alpha)
    probs = np.full((num_classes + 1, H, W), 1e-7, np.float32)
    probs[0] = bg_score
    for i, key in enumerate(cam_dict):
        probs[key + 1] = v[i]
    probs_p = np.pad(probs, ((0, 0), (0, pad - H), (0, pad - W)), mode="edge")
    img_p = np.pad(orig_img.astype(np.float32),
                   ((0, pad - H), (0, pad - W), (0, 0)), mode="edge")
    out = np.asarray(crf_fn(img_p, probs_p))[:, :H, :W]
    result = {0: out[0]}
    for key in cam_dict:
        result[key + 1] = out[key + 1]
    return result


def save_heatmaps(heatmap_dir: str, name: str, rgb: np.ndarray,
                  cam_dict: Dict[int, np.ndarray]) -> None:
    os.makedirs(heatmap_dir, exist_ok=True)
    for c, mask in cam_dict.items():
        heat = imops.apply_colormap_jet(np.uint8(255 * mask))[..., ::-1]  # RGB
        blend = (heat * 0.5 + rgb * 0.5).astype(np.uint8)
        cls = VOC_CLASSES[c] if c < len(VOC_CLASSES) else f"class{c}"
        Image.fromarray(blend).save(
            os.path.join(heatmap_dir, f"{name}_{cls}_getam.jpg"))


def run(cfg: InferConfig) -> None:
    model = ACR(
        num_classes=cfg.model.num_classes,
        backbone_name=cfg.model.backbone,
        dtype=jnp.dtype(cfg.model.compute_dtype),
        attn_impl=cfg.model.attn_impl,
        scan_blocks=cfg.model.scan_blocks,
    )
    params = {"params": load_params_npz(cfg.weights)["params"]} \
        if cfg.weights.endswith(".npz") else load_params_npz(cfg.weights + ".npz")
    if "params" not in params:
        params = {"params": params}
    # Adapt checkpoint layout either way: standard training saves the
    # unrolled trunk, pipe-mesh training saves the scanned (stacked)
    # layout; inference defaults to the unrolled trunk (truncated GETAM
    # gradient taps, ~2.2x faster) with --scan opting into the ~12x
    # smaller compiled program.
    trunk_keys = params["params"].get("trunk", {})
    if cfg.model.scan_blocks and any(k.startswith("blocks_") and k != "blocks_scan"
                                     for k in trunk_keys):
        from acr_wsss_tpu.models.convert import unrolled_to_scanned

        params = unrolled_to_scanned(params)
    elif not cfg.model.scan_blocks and "blocks_scan" in trunk_keys:
        from acr_wsss_tpu.models.convert import scanned_to_unrolled

        params = scanned_to_unrolled(params)

    # --dp N: one process drives an N-chip data-parallel mesh (the
    # reference scales inference by one process per GPU over manual
    # file-list splits). The TTA-view batch axis is sharded; outputs are
    # identical to the single-device program.
    dp = max(int(getattr(cfg, "dp", 0) or 0), 0)
    mesh = None
    views_per_img = 2 if cfg.flip_tta else 1
    V = max(1, cfg.batch_images)
    if dp > 1:
        devices = jax.devices()
        if dp > len(devices):
            raise ValueError(
                f"--dp {dp} requested but only {len(devices)} devices "
                f"visible ({devices[0].platform})")
        mesh = jax.sharding.Mesh(np.asarray(devices[:dp]), ("data",))
        while (V * views_per_img) % dp:
            V += 1
        if V != max(1, cfg.batch_images):
            print(f"dp={dp}: batch_images {cfg.batch_images} -> {V} so the "
                  f"{views_per_img}-view batch divides the mesh", flush=True)

    infer_fns = {
        scale: build_infer_fn(
            model, params, int(cfg.crop_size * scale), cfg.start_layer,
            cfg.getam_func, cfg.use_aff, cfg.model.num_classes,
            class_slots=cfg.class_slots, mesh=mesh)
        for scale in cfg.scales
    }
    infer_fn = infer_fns[cfg.scales[0]]
    pamr_fn = None
    if getattr(cfg, "pamr_iters", 0):
        if mesh is not None:
            from acr_wsss_tpu.ops.pamr import pamr_sharded

            pamr_fn = pamr_sharded(cfg.pamr_iters,
                                   tuple(cfg.pamr_dilations), mesh)
        else:
            from acr_wsss_tpu.ops.pamr import pamr_jit

            # one jit fn serves every scale (recompiles per input shape)
            pamr_fn = pamr_jit(cfg.pamr_iters, tuple(cfg.pamr_dilations))

    num_classes = cfg.model.num_classes
    crf_device_fn = None
    if cfg.out_crf and getattr(cfg, "crf_device", False):
        crf_device_fn = make_crf_device_fn(getattr(cfg, "crf_pad", 512))

    if getattr(cfg, "dataset", "voc12") == "coco":
        from acr_wsss_tpu.data import coco as coco_data

        names = (voc_data.read_file(cfg.infer_list) if cfg.infer_list
                 else coco_data.list_image_names(cfg.image_dir))
        labels = coco_data.CocoLabelStore(cfg.cls_labels_path, names)
    else:
        # Two list formats exist (SURVEY.md §2.4): bare ids, and VOC
        # path-pair lines whose id lives at chars 12:23. Sniff by content
        # instead of the reference's per-call-site convention.
        with open(cfg.infer_list) as f:
            first_line = f.readline()
        names = (voc_data.read_file_2(cfg.infer_list)
                 if first_line.startswith("/")
                 else voc_data.read_file(cfg.infer_list))
        labels = voc_data.load_cls_labels(cfg.cls_labels_path)

    if cfg.out_cam:
        os.makedirs(cfg.out_cam, exist_ok=True)
    print("generating cam...", flush=True)
    for gi in range(0, len(names), V):
        group = names[gi:gi + V]
        # pad the final partial group (repeat the last name) so the whole
        # run uses ONE compiled batch shape; duplicates are not re-saved.
        padded = group + [group[-1]] * (V - len(group))
        if V == 1:
            results = [process_image(
                infer_fn, os.path.join(cfg.image_dir, f"{group[0]}.jpg"),
                labels[group[0]], cfg.crop_size, cfg.flip_tta,
                scales=cfg.scales, infer_fns_by_scale=infer_fns,
                pamr_fn=pamr_fn)]
        else:
            results = process_images_batched(
                infer_fn,
                [os.path.join(cfg.image_dir, f"{n}.jpg") for n in padded],
                [labels[n] for n in padded], cfg.crop_size, cfg.flip_tta,
                scales=cfg.scales, infer_fns_by_scale=infer_fns,
                pamr_fn=pamr_fn)
        for name, (cam_dict, patch_dict, rgb) in zip(group, results):
            if cfg.out_cam:
                np.save(os.path.join(cfg.out_cam, f"{name}.npy"), cam_dict)  # type: ignore[arg-type]
            if cfg.out_crf:
                for t in (cfg.low_alpha, cfg.high_alpha):
                    if crf_device_fn is not None:
                        crf = crf_with_alpha_device(
                            cam_dict, t, rgb, crf_device_fn,
                            num_classes=num_classes,
                            pad=getattr(cfg, "crf_pad", 512))
                    else:
                        crf = crf_with_alpha(cam_dict, t, rgb)
                    folder = f"{cfg.out_crf}_{t}"
                    os.makedirs(folder, exist_ok=True)
                    np.save(os.path.join(folder, f"{name}.npy"), crf)  # type: ignore[arg-type]
            if cfg.heatmap:
                save_heatmaps(cfg.heatmap, name, rgb, cam_dict)
        if gi % 50 < V:
            print(gi, flush=True)


def parse_args(argv=None) -> InferConfig:
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", required=True)
    parser.add_argument("--backbone", default="vitb_hybrid")
    parser.add_argument("--LISTpath", default="voc12/train_id.txt")
    parser.add_argument("--IMpath", default="voc/image/path")
    parser.add_argument("--cls_labels", default="voc12/cls_labels.npy")
    parser.add_argument("--out_cam", default=None)
    parser.add_argument("--out_crf", default=None)
    parser.add_argument("--heatmap", default=None)
    parser.add_argument("--start_layer", default=10, type=int)
    parser.add_argument("--getam_func", default="grad",
                        choices=["grad", "grad_s", "cam_grad", "cam_grad_s"])
    parser.add_argument("--aff", default=True, type=parse_bool)
    parser.add_argument("--crop_size", default=384, type=int)
    parser.add_argument("--low_alpha", default=1, type=int)
    parser.add_argument("--high_alpha", default=12, type=int)
    parser.add_argument("--crf_device", action="store_true",
                        help="run the --out_crf stage on device "
                             "(jit bilateral-grid mean-field at one padded "
                             "bucket) instead of the host C++ engine")
    parser.add_argument("--crf_pad", default=512, type=int,
                        help="pad-to-bucket size for --crf_device; larger "
                             "images fall back to the host engine")
    parser.add_argument("--attn_impl", default="xla", choices=["xla", "pallas"])
    parser.add_argument("--class_slots", default=4, type=int,
                        help="present-class backprop slots per pass (0 = all classes)")
    parser.add_argument("--batch_images", default=4, type=int,
                        help="images per compiled pass (overlaps host-side "
                             "loading with the device pass; outputs "
                             "identical to one-at-a-time)")
    parser.add_argument("--pamr", default=0, type=int, metavar="ITERS",
                        help="PAMR refinement iterations (0 = off, the "
                             "reference behavior; it imports PAMR but "
                             "never calls it). 10 is the usual setting.")
    parser.add_argument("--pamr_dilations", default="1,2,4,8,12,24",
                        help="comma-separated PAMR dilation list")
    parser.add_argument("--scales", default="1.0",
                        help="comma-separated multi-scale TTA factors "
                             "(reference infer_cam.py:145-146 scale hook); "
                             "each crop_size*scale must be a multiple of 16 "
                             "(the patch stride), e.g. 0.5,0.75,1.0,1.25,1.5 "
                             "at crop 384. Per-scale CAMs are upsampled to "
                             "native size and summed before normalization.")
    parser.add_argument("--dp", default=0, type=int,
                        help="data-parallel device count (0/1 = single "
                             "device): shard the TTA-view batch across a "
                             "dp-chip mesh from one process; outputs are "
                             "identical to the single-device run")
    parser.add_argument("--scan", action="store_true",
                        help="use the scanned trunk: ~12x smaller compiled "
                             "program, but the GETAM backward then covers "
                             "every layer (~2.2x slower per image than the "
                             "default unrolled trunk, whose gradient taps "
                             "truncate at --start_layer)")
    parser.add_argument("--no_scan", action="store_true",
                        help="deprecated: the unrolled trunk is the default")
    args = parser.parse_args(argv)
    scales = tuple(float(s) for s in args.scales.split(",") if s.strip())
    for s in scales:
        if int(args.crop_size * s) % 16:
            raise SystemExit(
                f"--scales {s}: crop_size*scale = {args.crop_size * s:g} is "
                f"not a multiple of the 16-pixel patch stride; pick scales "
                f"that keep the token grid integral (e.g. multiples of 1/6 "
                f"at crop 384)")
    return InferConfig(
        model=ModelConfig(backbone=args.backbone, attn_impl=args.attn_impl,
                          scan_blocks=args.scan),
        weights=args.weights,
        crop_size=args.crop_size,
        start_layer=args.start_layer,
        getam_func=args.getam_func,
        use_aff=args.aff,
        scales=scales,
        out_cam=args.out_cam,
        out_crf=args.out_crf,
        heatmap=args.heatmap,
        low_alpha=args.low_alpha,
        high_alpha=args.high_alpha,
        crf_device=args.crf_device,
        crf_pad=args.crf_pad,
        image_dir=args.IMpath,
        infer_list=args.LISTpath,
        cls_labels_path=args.cls_labels,
        class_slots=args.class_slots,
        batch_images=args.batch_images,
        dp=args.dp,
        pamr_iters=args.pamr,
        pamr_dilations=tuple(
            int(d) for d in args.pamr_dilations.split(",") if d.strip()),
    )


def main(argv=None) -> None:
    """Console entry point (``acr-infer-cam``): parse flags, run inference."""
    from acr_wsss_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    run(parse_args(argv))


if __name__ == "__main__":
    main()
