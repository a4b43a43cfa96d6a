"""Pipeline parallelism (GPipe over the scanned trunk) on the CPU mesh.

The pipelined training step — stages over the 'pipe' axis, microbatches
hopping between them with ppermute, in-stage consistency-loss folding —
must reproduce the serial step exactly: same loss parts, same parameter
tree after one SGD update. This is simultaneously the drift guard for the
stage-local re-implementations of the embed/head fragments
(``parallel/pipeline.py``).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acr_wsss_tpu.configs import ModelConfig, TrainConfig
from acr_wsss_tpu.parallel import batch_sharding, make_mesh, replicated
from acr_wsss_tpu.parallel.pipeline import (
    make_train_step_pp, param_shardings_pp,
)
from acr_wsss_tpu.train import create_train_state, make_train_step

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
    pytest.mark.slow,  # heavy tier: run with --runslow
]

CROP = 64
GRID = (CROP // 16, CROP // 16)


def _cfg(backbone="vit_small"):
    return TrainConfig(
        model=ModelConfig(backbone=backbone, attn_impl="xla",
                          compute_dtype="float32", scan_blocks=True),
        crop_size=CROP, batch_size=8, lr=0.01, alpha=1.0,
    )


def _batch(rng):
    return {
        "image": jnp.asarray(
            rng.normal(size=(8, CROP, CROP, 3)).astype(np.float32)),
        "label": jnp.zeros((8, 20), jnp.float32).at[:, 2].set(1.0)
                 .at[:4, 7].set(1.0),
    }


@pytest.mark.parametrize("pipe,microbatches", [(2, 2), (4, 2)])
def test_pipelined_train_step_matches_serial(pipe, microbatches, rng):
    cfg = _cfg()
    model, state0 = create_train_state(cfg, 100, jax.random.key(0),
                                       crop=CROP)
    batch = _batch(rng)

    state_ref, parts_ref = jax.jit(
        make_train_step(model, cfg, GRID))(state0, batch)

    mesh = make_mesh((-1, pipe), ("data", "pipe"))
    state_pp = state0.replace(
        params=jax.device_put(state0.params,
                              param_shardings_pp(mesh, state0.params)),
        opt_state=jax.device_put(state0.opt_state, replicated(mesh)),
    )
    sharded_batch = {k: jax.device_put(v, batch_sharding(mesh))
                     for k, v in batch.items()}
    step_pp = jax.jit(make_train_step_pp(
        model, cfg, GRID, mesh, n_microbatches=microbatches))
    state_out, parts = step_pp(state_pp, sharded_batch)

    for k in ("cls_loss_1", "cls_loss_2", "cls_align_loss",
              "aff_align_loss", "loss"):
        assert abs(float(parts[k]) - float(parts_ref[k])) < 1e-5, k

    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.device_get(state_out.params), jax.device_get(state_ref.params))
    assert max(jax.tree.leaves(diff)) < 1e-4


def test_pipelined_step_hybrid_stem(rng):
    """The flagship (hybrid R50 stem) backbone through the pipelined step:
    replicated stem, pipe-sharded blocks."""
    cfg = _cfg("vitb_hybrid")
    model, state0 = create_train_state(cfg, 100, jax.random.key(0),
                                       crop=CROP)
    batch = _batch(rng)
    state_ref, parts_ref = jax.jit(
        make_train_step(model, cfg, GRID))(state0, batch)

    mesh = make_mesh((2, 4), ("data", "pipe"))
    state_pp = state0.replace(
        params=jax.device_put(state0.params,
                              param_shardings_pp(mesh, state0.params)),
        opt_state=jax.device_put(state0.opt_state, replicated(mesh)),
    )
    sharded_batch = {k: jax.device_put(v, batch_sharding(mesh))
                     for k, v in batch.items()}
    step_pp = jax.jit(make_train_step_pp(
        model, cfg, GRID, mesh, n_microbatches=2))
    state_out, parts = step_pp(state_pp, sharded_batch)
    assert abs(float(parts["loss"]) - float(parts_ref["loss"])) < 1e-5
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.device_get(state_out.params), jax.device_get(state_ref.params))
    assert max(jax.tree.leaves(diff)) < 1e-4


def test_train_loop_end_to_end_on_pipe_mesh(rng, tmp_path):
    """The FULL train() loop — iterator, pp step selection via
    cfg.mesh_axes, orbax checkpointing of pipe-sharded params, final npz —
    on a ('data','pipe') mesh (what `train --mesh data=2,pipe=4` runs)."""
    import os

    from PIL import Image

    from acr_wsss_tpu.train import train

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    names, labels = [], {}
    for i in range(8):
        name = f"t{i}"
        names.append(name)
        Image.fromarray(
            rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8)
        ).save(img_dir / f"{name}.jpg")
        lab = np.zeros(20, np.float32)
        lab[i % 20] = 1.0
        labels[name] = lab
    np.save(tmp_path / "cls_labels.npy", labels)  # type: ignore[arg-type]
    (tmp_path / "train.txt").write_text("\n".join(names) + "\n")
    (tmp_path / "val.txt").write_text("")

    cfg = TrainConfig(
        model=ModelConfig(backbone="vit_small", attn_impl="xla",
                          compute_dtype="float32", scan_blocks=True),
        crop_size=32, batch_size=4, max_epochs=1, lr=0.001, alpha=1.0,
        log_every=2, val_every=1000, checkpoint_every=1000,
        checkpoint_dir=str(tmp_path / "weight"), session_name="pp_e2e",
        image_dir=str(img_dir), train_list=str(tmp_path / "train.txt"),
        val_list=str(tmp_path / "val.txt"),
        cls_labels_path=str(tmp_path / "cls_labels.npy"),
        num_workers=2,
        mesh_shape=(2, 4), mesh_axes=("data", "pipe"), pp_microbatches=2,
    )
    state = train(cfg)
    assert int(state.step) == 3  # 2 steps/epoch -> steps 0..2
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "pp_e2e_last.npz"))


def test_pp_constructor_validation():
    cfg = _cfg()
    model, _ = create_train_state(cfg, 10, jax.random.key(0), crop=CROP)
    mesh = make_mesh((2, 4), ("data", "pipe"))
    bad = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, scan_blocks=False))
    with pytest.raises(ValueError, match="scan_blocks"):
        make_train_step_pp(model, bad, GRID, mesh, n_microbatches=2)
    with pytest.raises(ValueError, match="microbatches"):
        make_train_step_pp(model, cfg, GRID, mesh, n_microbatches=3)


def test_pipelined_loop_with_device_aug(tmp_path):
    """The FULL train() loop on a ('data','pipe') mesh fed by --device_aug
    packed batches ({image_u8, aug, label}): the crops must materialize
    inside the jit program before the GPipe shard_map (whose in_specs
    consume {image, label}) — the round-3 fix; previously this combination
    raised a pytree mismatch deep inside the first step. Equivalence
    anchor: the data-only mesh loop on the SAME device_aug stream."""
    import dataclasses as dc

    from PIL import Image

    from acr_wsss_tpu.train import train

    root = tmp_path / "data"
    root.mkdir()
    nrng = np.random.default_rng(0)
    names, labels = [], {}
    for i in range(8):
        names.append(f"t{i}")
        Image.fromarray(nrng.integers(
            0, 255, size=(70, 90, 3), dtype=np.uint8)
        ).save(root / f"t{i}.jpg")
        lab = np.zeros(20, np.float32)
        lab[i % 20] = 1.0
        labels[f"t{i}"] = lab
    np.save(tmp_path / "cls_labels.npy", labels)  # type: ignore[arg-type]
    (tmp_path / "train.txt").write_text("\n".join(names) + "\n")
    (tmp_path / "val.txt").write_text(names[0] + "\n")

    base = TrainConfig(
        model=ModelConfig(backbone="vit_small", attn_impl="xla",
                          compute_dtype="float32", scan_blocks=True),
        crop_size=CROP, batch_size=4, max_epochs=1, lr=0.001, alpha=1.0,
        log_every=10, val_every=1000, checkpoint_every=10**6,
        image_dir=str(root), train_list=str(tmp_path / "train.txt"),
        val_list=str(tmp_path / "val.txt"),
        cls_labels_path=str(tmp_path / "cls_labels.npy"),
        num_workers=2, device_aug=True, aug_pad=128,
    )
    state_serial = train(dc.replace(
        base, checkpoint_dir=str(tmp_path / "w_serial")))
    state_pp = train(dc.replace(
        base, mesh_shape=(2, 4), mesh_axes=("data", "pipe"),
        pp_microbatches=2, checkpoint_dir=str(tmp_path / "w_pp")))

    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.device_get(state_serial.params), jax.device_get(state_pp.params))
    assert max(jax.tree.leaves(diff)) < 1e-4
