"""Meters, timer, metric writer, visualization utilities."""

import json
import time

import numpy as np

from acr_wsss_tpu.utils.meters import AverageMeter, Timer
from acr_wsss_tpu.utils.logging import MetricWriter
from acr_wsss_tpu.utils import visualization as viz
from acr_wsss_tpu.utils.metrics import pred_acc


def test_average_meter_add_get_pop():
    m = AverageMeter("loss")
    m.add({"loss": 1.0})
    m.add({"loss": 3.0})
    assert m.get("loss") == 2.0
    assert m.pop("loss") == 2.0
    assert m.get("loss") == 0.0  # reset
    m.add({"loss": 5.0, "acc": 0.5})  # new key on the fly
    assert m.get("acc") == 0.5
    popped = m.pop()
    assert popped["loss"] == 5.0 and popped["acc"] == 0.5


def test_timer_eta():
    t = Timer()
    assert t.str_est_finish() == "unknown"
    time.sleep(0.05)
    t.update_progress(0.5)
    assert t.est_total is not None and t.est_total >= 0.05
    assert t.get_stage_elapsed() >= 0.05
    t.reset_stage()
    assert t.get_stage_elapsed() < 0.05


def test_metric_writer_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with MetricWriter(path) as w:
        w.write(10, {"loss": 1.5, "imps": 100.0})
        w.write(20, {"loss": 1.2}, kind="val")
    records = [json.loads(line) for line in open(path)]
    assert records[0]["step"] == 10 and records[0]["loss"] == 1.5
    assert records[1]["kind"] == "val"
    assert all("time" in r for r in records)


def test_decode_segmap_and_palette():
    mask = np.array([[0, 1], [15, 255]], np.uint8)
    rgb = viz.decode_segmap(mask)
    assert rgb.shape == (2, 2, 3)
    assert (rgb[0, 0] == 0).all()                       # background black
    assert tuple((rgb[0, 1] * 255).astype(int)) == (128, 0, 0)
    assert (rgb[1, 1] == 0).all()                       # ignore -> black


def test_voc_label_png_roundtrip(tmp_path):
    label = np.array([[0, 3], [20, 255]], np.uint8)
    img = viz.voc_label_to_colormap_png(label)
    p = tmp_path / "lab.png"
    img.save(p)
    from PIL import Image

    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, label)


def test_color_pro_blend(rng):
    pro = rng.uniform(size=(8, 8)).astype(np.float32)
    img = rng.integers(0, 255, size=(8, 8, 3), dtype=np.uint8)
    out = viz.color_pro(pro, img)
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8


def test_max_norm():
    cam = np.array([[[-1.0, 2.0], [4.0, 0.0]]], np.float32)
    out = viz.max_norm(cam)
    assert out.max() <= 1.0 and out.min() >= 0.0
    assert abs(out[0, 1, 0] - 1.0) < 1e-4  # 4.0 -> ~1.0 (eps in denominator)


def test_pred_acc_topk():
    target = np.array([1, 0, 1, 0], np.float32)
    assert pred_acc(target, np.array([0.9, 0.0, 0.8, 0.1])) == 1.0
    assert pred_acc(target, np.array([0.0, 0.9, 0.0, 0.8])) == 0.0
    assert pred_acc(np.zeros(4, np.float32), np.zeros(4)) == 1.0


def test_step_watchdog_fires_on_stall():
    """No beat within the budget -> exit_fn called exactly once with a
    diagnosis; beats keep it quiet; stop() disarms it."""
    import time

    from acr_wsss_tpu.utils.watchdog import StepWatchdog

    fired = []
    wd = StepWatchdog(0.3, exit_fn=fired.append)
    for _ in range(4):  # steady beats: stays quiet
        wd.beat()
        time.sleep(0.1)
    assert not fired
    time.sleep(1.0)  # stall past the budget
    assert len(fired) == 1 and "watchdog" in fired[0]
    wd.stop()


def test_step_watchdog_disabled_and_clock_starts_at_first_beat():
    import time

    from acr_wsss_tpu.utils.watchdog import StepWatchdog

    fired = []
    off = StepWatchdog(0.0, exit_fn=fired.append)
    off.beat()
    time.sleep(0.3)
    assert not fired and not off.enabled
    off.stop()

    # armed but never beaten: the clock has not started -> no fire
    armed = StepWatchdog(0.1, exit_fn=fired.append)
    time.sleep(0.3)
    assert not fired
    armed.stop()
