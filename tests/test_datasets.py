"""Affinity-label extraction + pair-index parity vs the reference."""

import numpy as np
import pytest

from acr_wsss_tpu.data.datasets import (
    ExtractAffinityLabelInRadius,
    get_indices_of_pairs,
)
from tests.conftest import requires_reference


@requires_reference
def test_pair_indices_match_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    from tool.pyutils import get_indices_of_pairs as ref_pairs  # type: ignore

    for radius, size in [(5, (16, 16)), (3, (10, 12))]:
        f_ref, t_ref = ref_pairs(radius, size)
        f_ours, t_ours = get_indices_of_pairs(radius, size)
        np.testing.assert_array_equal(f_ours, f_ref)
        np.testing.assert_array_equal(t_ours, t_ref)


@requires_reference
def test_affinity_labels_match_reference(rng):
    import sys

    sys.path.insert(0, "/root/reference")
    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]
    from voc12.data import ExtractAffinityLabelInRadius as RefExtract  # type: ignore

    label = rng.integers(0, 4, size=(24, 24)).astype(np.uint8)
    label[label == 3] = 255  # some ignore pixels

    ref = RefExtract(cropsize=24, radius=5)
    bg_r, fg_r, neg_r = (t.numpy() for t in ref(label))
    bg_o, fg_o, neg_o = ExtractAffinityLabelInRadius(24, 5)(label)
    np.testing.assert_array_equal(bg_o, bg_r)
    np.testing.assert_array_equal(fg_o, fg_r)
    np.testing.assert_array_equal(neg_o, neg_r)


def test_la_ha_fusion_semantics(rng):
    from acr_wsss_tpu.data.datasets import VOC12AffDataset

    ds = VOC12AffDataset.__new__(VOC12AffDataset)
    h = w = 8
    # la: confident fg for class 2 upper half; ha: bg everywhere lower half
    la = {0: np.full((h, w), 0.3, np.float32), 2: np.zeros((h, w), np.float32)}
    la[2][: h // 2] = 0.9
    ha = {0: np.full((h, w), 0.8, np.float32), 2: np.zeros((h, w), np.float32)}
    ha[2][: h // 4] = 0.95
    fused = ds.fuse_la_ha(la, ha)
    # upper quarter: both agree on fg -> class index 1 (argmax over dict order)
    assert (fused[: h // 4] == 1).all()
    # la fg not confirmed by ha -> stays fg from la? no: la==fg -> candidate,
    # ha==bg -> forced 0
    assert (fused[h // 4: h // 2] == 0).all()
    # la bg -> 255 then ha bg -> 0
    assert (fused[h // 2:] == 0).all()
