"""One-command pipeline (python -m acr_wsss_tpu.pipeline): train -> infer
-> eval on a tiny synthetic VOC, checking every stage's artifact.

Reference equivalent: ``train_acr.sh:1-49`` chaining train_acr.py,
infer_cam.py and evaluation.py.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run with --runslow

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def tiny_voc(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipevoc")
    (root / "img").mkdir()
    (root / "gt").mkdir()
    rng = np.random.default_rng(3)
    names = []
    labels = {}
    for i in range(4):
        name = f"p{i}"
        names.append(name)
        Image.fromarray(
            rng.integers(0, 255, size=(48, 56, 3), dtype=np.uint8)
        ).save(root / "img" / f"{name}.jpg")
        Image.fromarray(
            rng.integers(0, 3, size=(48, 56), dtype=np.uint8)
        ).save(root / "gt" / f"{name}.png")
        lab = np.zeros(20, np.float32)
        lab[i % 3] = 1.0
        labels[name] = lab
    np.save(root / "cls_labels.npy", labels)  # type: ignore[arg-type]
    (root / "list.txt").write_text("\n".join(names) + "\n")
    return root, names


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    """4 synthetic COCO-shaped images: names from the image dir, labels
    from bbox txts whose third field is the (gappy) COCO category id."""
    root = tmp_path_factory.mktemp("pipecoco")
    (root / "img").mkdir()
    (root / "val").mkdir()
    (root / "bbox").mkdir()
    (root / "gt").mkdir()
    rng = np.random.default_rng(7)
    names = []
    for i in range(4):
        name = f"COCO_train2014_{i:012d}"
        names.append(name)
        Image.fromarray(
            rng.integers(0, 255, size=(48, 56, 3), dtype=np.uint8)
        ).save(root / "img" / f"{name}.jpg")
        # category ids 1 and 2 -> dense classes 0 and 1 -> gt labels 1, 2
        cid = 1 + (i % 2)
        (root / "bbox" / f"{name}.txt").write_text(f"10 10 {cid} 30 30\n")
        Image.fromarray(
            ((rng.uniform(size=(48, 56)) > 0.5) * cid).astype(np.uint8)
        ).save(root / "gt" / f"{name}.png")
    Image.fromarray(
        rng.integers(0, 255, size=(48, 56, 3), dtype=np.uint8)
    ).save(root / "val" / "COCO_val2014_000000000000.jpg")
    (root / "bbox" / "COCO_val2014_000000000000.txt").write_text("0 0 3 5 5\n")
    return root, names


def test_pipeline_coco_all_stages(tiny_coco, tmp_path):
    """--dataset coco end to end: 80-class train (bbox-txt labels, separate
    val dir), CAM inference over the generated image-dir listing, 81-class
    threshold eval (reference train_acr_coco.sh + the toolbox COCO branch)."""
    from acr_wsss_tpu.pipeline import main

    root, names = tiny_coco
    out_cam = tmp_path / "cams"
    logfile = tmp_path / "evallog.txt"
    main([
        "--dataset", "coco",
        "--session_name", "pipe_coco",
        "--backbone", "vitb",
        "--attn_impl", "xla",
        "--IMpath", str(root / "img"),
        "--bbox_dir", str(root / "bbox"),
        "--valpath", str(root / "val"),
        "--gt_dir", str(root / "gt"),
        "--crop_size", "32",
        "--batch_size", "4",
        "--max_epoches", "1",
        "--lr", "0.001",
        "--alpha", "1",
        "--weight_dir", str(tmp_path / "weight"),
        "--out_cam", str(out_cam),
        "--logfile", str(logfile),
        "--eval_threshold", "0.3",
    ])
    assert os.path.exists(tmp_path / "weight" / "pipe_coco_last.npz")
    # the generated infer list covers the image-dir names
    listed = (tmp_path / "weight" / "pipe_coco_infer_list.txt") \
        .read_text().split()
    assert listed == names
    for i, name in enumerate(names):
        cam = np.load(out_cam / f"{name}.npy", allow_pickle=True).item()
        assert (i % 2) in cam  # dense class index of category id 1+(i%2)
    text = logfile.read_text()
    assert "pipe_coco" in text and "mIoU" in text


def test_pipeline_all_stages(tiny_voc, tmp_path):
    from acr_wsss_tpu.pipeline import main

    root, names = tiny_voc
    out_cam = tmp_path / "cams"
    logfile = tmp_path / "evallog.txt"
    main([
        "--session_name", "pipe_test",
        "--backbone", "vitb",
        "--attn_impl", "xla",
        "--IMpath", str(root / "img"),
        "--gt_dir", str(root / "gt"),
        "--cls_labels", str(root / "cls_labels.npy"),
        "--crop_size", "32",
        "--train_list", str(root / "list.txt"),
        "--val_list", str(root / "list.txt"),
        "--infer_list", str(root / "list.txt"),
        "--batch_size", "4",
        "--max_epoches", "1",
        "--lr", "0.001",
        "--alpha", "1",
        "--weight_dir", str(tmp_path / "weight"),
        "--out_cam", str(out_cam),
        "--logfile", str(logfile),
        "--eval_threshold", "0.3",
    ])
    # train artifact
    assert os.path.exists(tmp_path / "weight" / "pipe_test_last.npz")
    # infer artifacts: one CAM dict per image with the present class
    for i, name in enumerate(names):
        cam = np.load(out_cam / f"{name}.npy", allow_pickle=True).item()
        assert (i % 3) in cam
    # eval artifact: evallog entry with mIoU
    text = logfile.read_text()
    assert "pipe_test" in text and "mIoU" in text


def test_strict_bool_flags():
    """CLI booleans follow the reference's ``--flag True/False`` string
    convention (``train_acr.sh:37,46``) with STRICT parsing: ``type=bool``
    (and the old ``s != "False"`` lambda) silently treated "false"/"0" as
    True — the exported/deployed program would include affinity refinement
    the operator disabled."""
    import pytest as _pytest

    from acr_wsss_tpu.configs import parse_bool

    for s in ("True", "true", "1", "yes", "on"):
        assert parse_bool(s) is True
    for s in ("False", "false", "0", "no", "off"):
        assert parse_bool(s) is False
    with _pytest.raises(ValueError):
        parse_bool("affirmative")

    # wired into the argparse surfaces that take bool-valued strings
    import acr_wsss_tpu.evaluate as ev
    import acr_wsss_tpu.infer_cam as ic
    import acr_wsss_tpu.serving as sv

    for mod, flag in ((ic, "--aff"), (sv, "--aff"), (ev, "--curve")):
        src = open(mod.__file__).read()
        assert "type=bool" not in src, (mod.__name__, flag)


def test_console_entry_points_resolve():
    """Every [project.scripts] entry in pyproject.toml names an importable
    module attribute that is callable — a pip-installed console script
    crashes at launch otherwise (setuptools generates
    ``from mod import attr; attr()``)."""
    import importlib
    import pathlib
    import re

    pyproject = pathlib.Path(__file__).resolve().parents[1] / "pyproject.toml"
    text = pyproject.read_text()
    block = re.search(r"\[project\.scripts\](.*?)(\n\[|\Z)", text, re.S)
    assert block, "no [project.scripts] table found"
    entries = re.findall(r'^\s*([\w-]+)\s*=\s*"([\w.]+):(\w+)"',
                         block.group(1), re.M)
    assert len(entries) >= 6, entries
    for script, module, attr in entries:
        mod = importlib.import_module(module)
        fn = getattr(mod, attr, None)
        assert callable(fn), f"{script} -> {module}:{attr} is not callable"


def test_infer_cli_dp_mesh(tiny_voc, tmp_path):
    """``acr-infer-cam --dp 2``: the data-parallel mesh path through the
    CLI (mesh construction, batch_images rounding, sharded PAMR) writes
    the same artifact set as the tests above expect."""
    import jax
    import jax.numpy as jnp

    from acr_wsss_tpu import infer_cam
    from acr_wsss_tpu.models.acr import ACR
    from acr_wsss_tpu.utils.checkpoint import save_params_npz

    root, names = tiny_voc
    model = ACR(backbone_name="vitb", dtype=jnp.float32, attn_impl="xla")
    params = model.init(jax.random.key(2), jnp.zeros((1, 32, 32, 3)))
    weights = tmp_path / "dp_w.npz"
    save_params_npz(str(weights), params)

    out_cam = tmp_path / "dp_cams"
    infer_cam.main([
        "--weights", str(weights),
        "--backbone", "vitb",
        "--attn_impl", "xla",
        "--LISTpath", str(root / "list.txt"),
        "--IMpath", str(root / "img"),
        "--cls_labels", str(root / "cls_labels.npy"),
        "--crop_size", "32",
        "--out_cam", str(out_cam),
        "--dp", "2",
        "--batch_images", "2",
        "--pamr", "1",
        "--scales", "1.0,1.5",   # 32, 48: multi-scale TTA composed with dp
    ])
    for i, name in enumerate(names):
        cam = np.load(out_cam / f"{name}.npy", allow_pickle=True).item()
        assert (i % 3) in cam
        assert cam[i % 3].shape == (48, 56)


def test_infer_cli_rejects_non_integral_scale():
    """--scales validation: crop_size*scale off the 16-pixel patch stride
    is a config error caught at parse time, not a shape error deep in jit."""
    import pytest as _pytest

    from acr_wsss_tpu.infer_cam import parse_args

    cfg = parse_args(["--weights", "w.npz", "--crop_size", "384",
                      "--scales", "0.5,1.25"])
    assert cfg.scales == (0.5, 1.25)
    with _pytest.raises(SystemExit):
        parse_args(["--weights", "w.npz", "--crop_size", "384",
                    "--scales", "1.1"])
