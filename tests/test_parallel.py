"""Distributed tests on the virtual 8-device CPU mesh.

The same jit programs the TPU runs, executed under real shardings —
data-parallel and data x tensor-parallel — including gradient consistency
against a single-device run.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from acr_wsss_tpu.configs import ModelConfig, TrainConfig
from acr_wsss_tpu.parallel import batch_sharding, make_mesh, param_shardings, replicated
from acr_wsss_tpu.train import create_train_state, make_train_step

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
    pytest.mark.slow,  # heavy tier: run with --runslow
]

CROP = 64


def _tiny_cfg():
    return TrainConfig(
        model=ModelConfig(backbone="vitb", attn_impl="xla",
                          compute_dtype="float32"),
        crop_size=CROP, batch_size=8, lr=0.01, alpha=1.0,
    )


def _batch(rng):
    return {
        "image": jnp.asarray(rng.normal(size=(8, CROP, CROP, 3)).astype(np.float32)),
        "label": jnp.zeros((8, 20), jnp.float32).at[:, 2].set(1.0),
    }


def test_param_sharding_rules():
    mesh = make_mesh((-1, 2), ("data", "model"))
    cfg = _tiny_cfg()
    model, state = create_train_state(cfg, 100, jax.random.key(0), crop=CROP)
    shardings = param_shardings(mesh, state.params)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    qkv = [s for p, s in flat if "qkv" in "/".join(str(k.key) for k in p)
           and "kernel" in str(p[-1].key)]
    assert qkv and all(s.spec == P(None, "model") for s in qkv)
    mlp2 = [s for p, s in flat if "fc2" in "/".join(str(k.key) for k in p)
            and "kernel" in str(p[-1].key)]
    assert mlp2 and all(s.spec == P("model", None) for s in mlp2)


@pytest.mark.parametrize("mesh_spec", [((-1,), ("data",)),
                                       ((-1, 2), ("data", "model"))])
def test_sharded_train_step_matches_single_device(mesh_spec, rng):
    cfg = _tiny_cfg()
    model, state0 = create_train_state(cfg, 100, jax.random.key(0), crop=CROP)
    batch = _batch(rng)
    step_fn = jax.jit(make_train_step(model, cfg, (CROP // 16, CROP // 16)))

    # single device
    state_ref, parts_ref = step_fn(state0, batch)
    loss_ref = float(parts_ref["loss"])

    # sharded
    mesh = make_mesh(*mesh_spec)
    state_sh = state0.replace(
        params=jax.device_put(state0.params, param_shardings(mesh, state0.params)),
        opt_state=jax.device_put(state0.opt_state, replicated(mesh)),
    )
    sharded_batch = {
        "image": jax.device_put(batch["image"], batch_sharding(mesh)),
        "label": jax.device_put(batch["label"], batch_sharding(mesh)),
    }
    state_out, parts = step_fn(state_sh, sharded_batch)
    assert abs(float(parts["loss"]) - loss_ref) < 1e-4

    # updated params agree with the single-device update
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.device_get(state_out.params), jax.device_get(state_ref.params))
    assert max(jax.tree.leaves(diff)) < 1e-4


def test_train_loop_end_to_end_on_seq_mesh(rng, tmp_path):
    """The FULL train() loop under a ('data','model','seq') mesh with the
    sequence-parallel trunk (what `train --mesh data=2,model=2,seq=2`
    runs) — exercises the ambient-mesh context around the step loop."""
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
                          compute_dtype="float32", seq_axis="seq"),
        crop_size=32, batch_size=4, max_epochs=1, lr=0.001, alpha=1.0,
        log_every=2, val_every=1000, checkpoint_every=1000,
        checkpoint_dir=str(tmp_path / "weight"), session_name="sp_e2e",
        image_dir=str(img_dir), train_list=str(tmp_path / "train.txt"),
        val_list=str(tmp_path / "val.txt"),
        cls_labels_path=str(tmp_path / "cls_labels.npy"),
        num_workers=2,
        mesh_shape=(2, 2, 2), mesh_axes=("data", "model", "seq"),
    )
    state = train(cfg)
    assert int(state.step) == 3
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "sp_e2e_last.npz"))


def test_fsdp_train_step_matches_single_device(rng):
    """ZeRO-3 / FSDP placement: params AND optimizer state sharded over
    'data' (largest dim per leaf); XLA all-gathers weights at use sites and
    reduce-scatters grads. Numerically identical to the replicated step."""
    from acr_wsss_tpu.parallel import fsdp_shardings

    cfg = _tiny_cfg()
    model, state0 = create_train_state(cfg, 100, jax.random.key(0), crop=CROP)
    batch = _batch(rng)
    step_fn = jax.jit(make_train_step(model, cfg, (CROP // 16, CROP // 16)))
    state_ref, parts_ref = step_fn(state0, batch)

    mesh = make_mesh((-1,), ("data",))
    p_sh = fsdp_shardings(mesh, state0.params)
    state_sh = state0.replace(
        params=jax.device_put(state0.params, p_sh),
        opt_state=jax.device_put(state0.opt_state,
                                 fsdp_shardings(mesh, state0.opt_state)),
    )
    # the big leaves really are distributed, not replicated
    qkv_sh = p_sh["params"]["trunk"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv_sh.spec != jax.sharding.PartitionSpec()
    sharded_batch = {k: jax.device_put(v, batch_sharding(mesh))
                     for k, v in batch.items()}
    state_out, parts = step_fn(state_sh, sharded_batch)
    assert abs(float(parts["loss"]) - float(parts_ref["loss"])) < 1e-4
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.device_get(state_out.params), jax.device_get(state_ref.params))
    assert max(jax.tree.leaves(diff)) < 1e-4


def test_elastic_resume_across_mesh_sizes(rng, tmp_path):
    """Elastic training: a checkpoint written under one mesh resumes under
    a DIFFERENT device count (checkpoints are logical arrays; placement is
    chosen at restore). 1 step on 8 devices + checkpoint + 1 step on 2
    devices == 2 uninterrupted single-device steps."""
    from acr_wsss_tpu.utils.checkpoint import CheckpointManager

    cfg = _tiny_cfg()
    model, state0 = create_train_state(cfg, 100, jax.random.key(0), crop=CROP)
    batch = _batch(rng)
    batch2 = {"image": batch["image"][::-1], "label": batch["label"]}
    step_fn = jax.jit(make_train_step(model, cfg, (CROP // 16, CROP // 16)))

    s_ref, _ = step_fn(state0, batch)
    s_ref, _ = step_fn(s_ref, batch2)

    mesh_a = make_mesh((8,), ("data",))
    state_a = state0.replace(
        params=jax.device_put(state0.params,
                              param_shardings(mesh_a, state0.params)),
        opt_state=jax.device_put(state0.opt_state, replicated(mesh_a)),
    )
    state_a, _ = step_fn(state_a, {
        k: jax.device_put(v, batch_sharding(mesh_a)) for k, v in batch.items()})
    ckpt = CheckpointManager(str(tmp_path / "elastic"))
    ckpt.save(1, jax.device_get({"params": state_a.params,
                                 "opt_state": state_a.opt_state, "step": 1}))
    ckpt.close()

    ckpt2 = CheckpointManager(str(tmp_path / "elastic"))
    restored = ckpt2.restore({"params": jax.device_get(state0.params),
                              "opt_state": jax.device_get(state0.opt_state),
                              "step": 0})
    ckpt2.close()
    mesh_b = make_mesh((2,), ("data",),
                       devices=jax.devices()[:2])
    state_b = state0.replace(
        params=jax.device_put(restored["params"],
                              param_shardings(mesh_b, restored["params"])),
        opt_state=jax.device_put(restored["opt_state"], replicated(mesh_b)),
        step=restored["step"],
    )
    state_b, _ = step_fn(state_b, {
        k: jax.device_put(v, batch_sharding(mesh_b)) for k, v in batch2.items()})

    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.device_get(state_b.params), jax.device_get(s_ref.params))
    assert max(jax.tree.leaves(diff)) < 1e-4


@pytest.mark.parametrize("mesh_spec", [((2, 4), ("data", "seq")),
                                       ((2, 2, 2), ("data", "model", "seq"))])
def test_seq_parallel_train_step_matches_single_device(mesh_spec, rng):
    """Sequence parallelism: token-axis sharding constraints in the trunk
    (ModelConfig.seq_axis) leave the training step numerically unchanged —
    GSPMD inserts the all-gathers around attention; dp x tp x sp composes.

    N = (64/16)^2 + 1 = 17 tokens over a seq axis of 2/4 also exercises the
    uneven-dimension (padded) partition path."""
    cfg = _tiny_cfg()
    model_ref, state0 = create_train_state(cfg, 100, jax.random.key(0),
                                           crop=CROP)
    batch = _batch(rng)
    state_ref, parts_ref = jax.jit(
        make_train_step(model_ref, cfg, (CROP // 16, CROP // 16)))(
            state0, batch)

    sp_cfg = TrainConfig(
        model=dataclasses.replace(cfg.model, seq_axis="seq"),
        crop_size=CROP, batch_size=8, lr=0.01, alpha=1.0)
    model_sp, state0_sp = create_train_state(sp_cfg, 100, jax.random.key(0),
                                             crop=CROP)
    step_sp = jax.jit(make_train_step(model_sp, sp_cfg,
                                      (CROP // 16, CROP // 16)))

    mesh = make_mesh(*mesh_spec)
    state_sh = state0_sp.replace(
        params=jax.device_put(state0_sp.params,
                              param_shardings(mesh, state0_sp.params)),
        opt_state=jax.device_put(state0_sp.opt_state, replicated(mesh)),
    )
    sharded_batch = {k: jax.device_put(v, batch_sharding(mesh))
                     for k, v in batch.items()}
    with jax.set_mesh(mesh):
        state_out, parts = step_sp(state_sh, sharded_batch)
        assert abs(float(parts["loss"]) - float(parts_ref["loss"])) < 1e-4
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            jax.device_get(state_out.params),
            jax.device_get(state_ref.params))
    assert max(jax.tree.leaves(diff)) < 1e-4
