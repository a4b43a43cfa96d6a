"""End-to-end smoke: weights -> CAM inference -> evaluation, tiny and CPU.

The integration test the reference never had (SURVEY.md §4): synthetic
images + random-init weights through the full ``infer_cam`` pipeline
(GETAM + flip TTA + affinity refinement), producing reference-format npy
dicts, scored by the evaluation harness.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run with --runslow

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from acr_wsss_tpu import evaluate
from acr_wsss_tpu.infer_cam import build_infer_fn, process_image
from acr_wsss_tpu.models.acr import ACR

CROP = 64  # grid 4x4


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    (root / "img").mkdir()
    (root / "gt").mkdir()
    rng = np.random.default_rng(5)
    names = []
    for i in range(2):
        name = f"syn{i}"
        names.append(name)
        img = rng.integers(0, 255, size=(60, 72, 3), dtype=np.uint8)
        img[15:45, 20:55] = [30, 200, 40]
        Image.fromarray(img).save(root / "img" / f"{name}.jpg")
        gt = np.zeros((60, 72), np.uint8)
        gt[15:45, 20:55] = i + 1
        Image.fromarray(gt).save(root / "gt" / f"{name}.png")
    return root, names


def test_infer_to_eval(fixture_dir):
    root, names = fixture_dir
    model = ACR(backbone_name="vitb", dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, CROP, CROP, 3)))

    infer_fn = build_infer_fn(model, params, CROP, start_layer=10,
                              getam_func="grad", use_aff=True, num_classes=20)

    out_cam = root / "cams"
    out_cam.mkdir()
    for i, name in enumerate(names):
        label = np.zeros(20, np.float32)
        label[i] = 1.0
        cam_dict, patch_dict, rgb = process_image(
            infer_fn, str(root / "img" / f"{name}.jpg"), label, CROP)
        # reference artifact contract: {class_id: native HxW float32 in [0,1]}
        assert sorted(cam_dict) == [i]
        cam = cam_dict[i]
        assert cam.shape == (60, 72) and cam.dtype == np.float32
        assert 0.0 <= cam.min() and cam.max() <= 1.0 + 1e-5
        assert sorted(patch_dict) == [i]
        np.save(out_cam / f"{name}.npy", cam_dict)  # type: ignore[arg-type]

    loglist = evaluate.do_python_eval(
        str(out_cam), str(root / "gt"), names, 21, "npy", 0.5, num_workers=1)
    assert 0.0 <= loglist["mIoU"] <= 100.0


def test_infer_fn_is_jit_cached(fixture_dir):
    """The per-image loop must reuse one compiled program (fixed shapes)."""
    root, names = fixture_dir
    model = ACR(backbone_name="vitb", dtype=jnp.float32)
    params = model.init(jax.random.key(1), jnp.zeros((1, CROP, CROP, 3)))
    infer_fn = build_infer_fn(model, params, CROP, 10, "grad", False, 20)
    x = jnp.zeros((2, CROP, CROP, 3))
    infer_fn(x)
    misses_before = infer_fn._cache_size()
    infer_fn(x + 1.0)
    assert infer_fn._cache_size() == misses_before


def test_class_slots_match_full_sweep(fixture_dir):
    """Present-class slot sweeping must produce the identical cam_dict."""
    root, names = fixture_dir
    model = ACR(backbone_name="vitb", dtype=jnp.float32)
    params = model.init(jax.random.key(2), jnp.zeros((1, CROP, CROP, 3)))

    full = build_infer_fn(model, params, CROP, 10, "grad", True, 20,
                          class_slots=0)
    slotted = build_infer_fn(model, params, CROP, 10, "grad", True, 20,
                             class_slots=3)
    label = np.zeros(20, np.float32)
    label[[1, 4, 9, 13]] = 1.0  # 4 present classes > 3 slots -> two passes
    img = str(root / "img" / f"{names[0]}.jpg")
    cams_full, _, _ = process_image(full, img, label, CROP)
    cams_slot, _, _ = process_image(slotted, img, label, CROP)
    assert sorted(cams_full) == sorted(cams_slot) == [1, 4, 9, 13]
    for c in cams_full:
        # Different vmap widths (3-slot vs 20-class sweep) tile the batched
        # vjp matmuls differently; fp32 reassociation drifts a few 1e-5.
        np.testing.assert_allclose(cams_slot[c], cams_full[c],
                                   atol=2e-4, rtol=2e-3)


def test_batched_inference_matches_single(tmp_path, rng):
    """process_images_batched == V independent process_image calls."""
    import jax.numpy as jnp
    from PIL import Image

    from acr_wsss_tpu.infer_cam import (
        build_infer_fn, process_image, process_images_batched,
    )
    from acr_wsss_tpu.models.acr import ACR

    model = ACR(backbone_name="vitb", dtype=jnp.float32, attn_impl="xla")
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    fn = build_infer_fn(model, params, 32, start_layer=10, getam_func="grad",
                        use_aff=True, num_classes=20, class_slots=2)

    paths, labs = [], []
    for i in range(3):
        p = tmp_path / f"im{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, size=(40 + 4 * i, 50, 3), dtype=np.uint8)
        ).save(p)
        lab = np.zeros(20, np.float32)
        lab[[i, i + 4]] = 1.0
        paths.append(str(p))
        labs.append(lab)

    batched = process_images_batched(fn, paths, labs, 32, flip_tta=True)
    for path, lab, (cam_b, patch_b, _) in zip(paths, labs, batched):
        cam_s, patch_s, _ = process_image(fn, path, lab, 32, flip_tta=True)
        assert sorted(cam_b) == sorted(cam_s)
        for c in cam_s:
            # 1e-4: batch-size-dependent XLA fusion order shifts fp32
            # rounding by ~1e-5 after min-max normalization
            np.testing.assert_allclose(cam_b[c], cam_s[c], atol=1e-4,
                                       err_msg=f"{path} cls {c}")
            np.testing.assert_allclose(patch_b[c], patch_s[c], atol=1e-4)


def test_multiscale_inference_sums_scales(fixture_dir):
    """scales=(1.0, 1.5): per-scale CAMs are upsampled to native size and
    summed before normalization — the two-scale result must differ from
    single-scale but agree when the extra scale's contribution is the same
    program run at its own fixed shape."""
    root, names = fixture_dir
    model = ACR(backbone_name="vitb", dtype=jnp.float32)
    params = model.init(jax.random.key(4), jnp.zeros((1, CROP, CROP, 3)))
    fns = {
        1.0: build_infer_fn(model, params, CROP, 10, "grad", True, 20),
        1.5: build_infer_fn(model, params, int(CROP * 1.5), 10, "grad",
                            True, 20),
    }
    label = np.zeros(20, np.float32)
    label[[2, 7]] = 1.0
    img = str(root / "img" / f"{names[0]}.jpg")
    cams_ms, _, rgb = process_image(fns[1.0], img, label, CROP,
                                    scales=(1.0, 1.5),
                                    infer_fns_by_scale=fns)
    cams_ss, _, _ = process_image(fns[1.0], img, label, CROP)
    assert sorted(cams_ms) == [2, 7]
    for c in cams_ms:
        assert cams_ms[c].shape == rgb.shape[:2]
        assert np.isfinite(cams_ms[c]).all()
        assert 0.0 <= cams_ms[c].min() and cams_ms[c].max() <= 1.0 + 1e-6
    # the 1.5x scale genuinely contributes (not silently dropped)
    assert any(not np.allclose(cams_ms[c], cams_ss[c]) for c in cams_ms)


def test_dp_mesh_inference_matches_single_device(tmp_path, rng):
    """--dp data-parallel inference: a 4-device ('data',) mesh sharding the
    TTA-view batch produces the same CAM artifacts as the single-device
    program (params replicated, per-image compute independent along the
    view axis — no cross-chip collectives on the compute path)."""
    import jax.numpy as jnp
    from PIL import Image

    from acr_wsss_tpu.infer_cam import build_infer_fn, process_images_batched
    from acr_wsss_tpu.models.acr import ACR

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:4]), ("data",))
    model = ACR(backbone_name="vitb", dtype=jnp.float32, attn_impl="xla")
    params = model.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)))
    # V=2 images x 2 TTA views = batch 4 over 4 devices; class_slots
    # exercises the replicated class-ids operand too.
    plain = build_infer_fn(model, params, 32, start_layer=10,
                           getam_func="grad", use_aff=True, num_classes=20,
                           class_slots=2)
    sharded = build_infer_fn(model, params, 32, start_layer=10,
                             getam_func="grad", use_aff=True, num_classes=20,
                             class_slots=2, mesh=mesh)

    paths, labs = [], []
    for i in range(2):
        p = tmp_path / f"dp{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, size=(40, 52, 3), dtype=np.uint8)).save(p)
        lab = np.zeros(20, np.float32)
        lab[[i, i + 5]] = 1.0
        paths.append(str(p))
        labs.append(lab)

    ref = process_images_batched(plain, paths, labs, 32, flip_tta=True)
    got = process_images_batched(sharded, paths, labs, 32, flip_tta=True)
    for (cam_r, patch_r, _), (cam_g, patch_g, _) in zip(ref, got):
        assert sorted(cam_r) == sorted(cam_g)
        for c in cam_r:
            # 1e-4: GSPMD partitioning shifts fp32 fusion rounding ~1e-5,
            # amplified by min-max normalization (same bound as the
            # batched-vs-single test above)
            np.testing.assert_allclose(cam_g[c], cam_r[c], atol=1e-4)
            np.testing.assert_allclose(patch_g[c], patch_r[c], atol=1e-4)
