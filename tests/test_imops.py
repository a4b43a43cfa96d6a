"""Host image-op parity: bilinear resize vs torch, JET colormap vs OpenCV."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from acr_wsss_tpu.ops import imops


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("shape", [((24, 24), (100, 130)), ((50, 70), (24, 24))])
def test_resize_matches_torch(align_corners, shape, rng):
    (h_in, w_in), (h_out, w_out) = shape
    x = rng.normal(size=(3, h_in, w_in)).astype(np.float32)
    ours = imops.resize_bilinear_np(x, (h_out, w_out), align_corners)
    theirs = F.interpolate(
        torch.from_numpy(x)[None], size=(h_out, w_out), mode="bilinear",
        align_corners=align_corners,
    )[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_jet_colormap_close_to_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    gray = np.arange(256, dtype=np.uint8).reshape(16, 16)
    ours = imops.apply_colormap_jet(gray).astype(np.int32)
    theirs = cv2.applyColorMap(gray, cv2.COLORMAP_JET).astype(np.int32)
    # piecewise-linear approximations agree within a small band
    assert np.abs(ours - theirs).mean() < 8


def test_voc_colormap_known_colors():
    cmap = imops.voc_colormap()
    assert tuple(cmap[0]) == (0, 0, 0)          # background: black
    assert tuple(cmap[1]) == (128, 0, 0)        # aeroplane: dark red
    assert tuple(cmap[15]) == (192, 128, 128)   # person
    assert tuple(cmap[255]) == (224, 224, 192)  # VOC 'void' color


def test_minmax_normalize(rng):
    cam = rng.normal(size=(3, 8, 8)).astype(np.float32)
    out = imops.minmax_normalize(cam)
    assert out.min() >= 0 and out.max() <= 1.0 + 1e-6
