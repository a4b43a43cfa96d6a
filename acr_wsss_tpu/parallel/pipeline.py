"""Pipeline parallelism: a GPipe-style ACR training step over a
('data', 'pipe') mesh.

The reference has no pipeline parallelism (its only strategy is DDP,
``train_acr.py:83-99``); this is a TPU-native capability upgrade for
models/chips where the trunk's weights do not fit (or do not scale) on one
device: the transformer depth is partitioned into contiguous stages, one
per device along the 'pipe' mesh axis, and microbatches stream through the
stages with ``jax.lax.ppermute`` hops over ICI.

Design (scaling-book "pipelining as a collective-permute loop" recipe, on
top of the repo's scanned-trunk param layout):

* The scan-trunk parameters (``trunk/blocks_scan/block/*`` with a leading
  depth axis, see ``models/vit.py::VisionTransformer.scan_blocks``) are
  sharded over 'pipe' on that leading axis — each device physically holds
  only its ``depth/P`` layers. Everything else (stem, patch embed, head)
  is replicated.
* The whole step runs inside ONE ``jax.shard_map``: per device, the local
  batch shard is embedded (stem + patchify + pos-embed + the aligned
  siamese mirror), split into ``M`` microbatches of stacked (view, mirror)
  halves, and pushed through a ``lax.scan`` over ``M + P - 1`` pipeline
  ticks. Each tick runs the device's own layer stack (an inner
  ``lax.scan`` over its stacked params) and hands its activations to the
  next stage with a single ``ppermute``.
* The all-pairs consistency loss is computed IN-STAGE: every layer's
  head-mean probs are reduced to the per-layer CLS/affinity L1 terms the
  moment they exist (the views are pre-aligned by the mirror trick, so
  the comparison is a masked elementwise difference of the microbatch's
  halves), and only two scalars per layer survive the tick. The (B, N, N)
  probability tensors never cross stages. ``psum('pipe')`` assembles the
  layer sum, ``pmean('data')`` the batch mean — identical math to
  ``losses.acr_total_loss_layers(aligned=True)``.
* The classification (MLSM) losses are computed on the LAST stage as
  microbatches retire, masked by pipeline validity.
* Autodiff runs OUTSIDE the shard_map: JAX transposes the ppermute hops
  (reverse pipeline for the backward), the psum/pmean reductions, and the
  replicated-in-spec broadcasts (grad psums for shared params) — no
  hand-written backward schedule.

Equivalence with the serial step (loss parts and the updated parameter
tree after an SGD step) is tested on the virtual CPU mesh in
``tests/test_pipeline_parallel.py``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from acr_wsss_tpu import losses
from acr_wsss_tpu.models.hybrid import ResNetV2Stem
from acr_wsss_tpu.models.vit import Block, PatchEmbed, resize_pos_embed

_BLOCKS_KEY = "blocks_scan"


def _is_block_path(path) -> bool:
    return any(str(getattr(k, "key", k)) == _BLOCKS_KEY for k in path)


def param_shardings_pp(mesh: Mesh, params: Any, pipe_axis: str = "pipe") -> Any:
    """Placement tree: stage-stacked block params sharded over 'pipe' on the
    leading (depth) axis, everything else replicated."""
    def spec_for(path, leaf):
        if _is_block_path(path):
            return NamedSharding(mesh, P(pipe_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _param_specs_pp(params: Any, pipe_axis: str) -> Any:
    def spec_for(path, leaf):
        return P(pipe_axis) if _is_block_path(path) else P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _mirror_second_half(tok: jnp.ndarray, gh: int, gw: int,
                        start: int) -> jnp.ndarray:
    """Un-mirror the flipped view's token ORDER (rows [b:2b]) — the aligned
    siamese trick of ``VisionTransformer.__call__`` (stacked mode)."""
    b2 = tok.shape[0] // 2
    d = tok.shape[-1]
    patches2 = tok[b2:, start:].reshape(b2, gh, gw, d)
    patches2 = jnp.flip(patches2, axis=2).reshape(b2, gh * gw, d)
    return jnp.concatenate(
        [tok[:b2], jnp.concatenate([tok[b2:, :start], patches2], axis=1)],
        axis=0)


def make_train_step_pp(model, cfg, grid: Tuple[int, int], mesh: Mesh,
                       n_microbatches: int, data_axis: str = "data",
                       pipe_axis: str = "pipe"):
    """Build the pipelined (state, batch) -> (state, parts) training step.

    Requirements (asserted): ``cfg.model.scan_blocks`` (the stage-sliceable
    param layout), a single CLS prefix token, the aligned-mirror loss path,
    final tap == last block (true for every wired ACR backbone), depth
    divisible by the 'pipe' extent, and per-device batch divisible by
    ``n_microbatches``.
    """
    spec = model.spec
    depth, dim = spec.depth, spec.embed_dim
    n_stages = mesh.shape[pipe_axis]
    n_data = mesh.shape[data_axis]
    M = n_microbatches
    alpha = cfg.alpha

    if not cfg.model.scan_blocks:
        raise ValueError("pipeline parallelism needs scan_blocks=True "
                         "(stage-sliceable stacked block params)")
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    if spec.num_prefix_tokens != 1:
        raise ValueError("pipelined step supports the single-CLS trunk")
    if spec.taps[-1] != depth - 1:
        raise ValueError("pipelined head expects the final tap at the last "
                         "block (true for all wired ACR backbones)")
    if (cfg.batch_size // n_data) % M or cfg.batch_size % n_data:
        raise ValueError(
            f"per-device batch {cfg.batch_size}/{n_data} must divide into "
            f"{M} microbatches")

    dtype = jnp.dtype(cfg.model.compute_dtype)
    block = Block(dim, spec.num_heads, 4.0, True, dtype,
                  attn_impl=cfg.model.attn_impl,
                  probs_dtype=jnp.dtype(cfg.model.probs_dtype))
    gh, gw = grid
    n_tokens = gh * gw + 1

    def embed(trunk_params, x):
        """Stem + patchify + CLS/pos-embed + aligned mirror (the pre-trunk
        part of ``VisionTransformer.__call__``, restricted to the training
        path; the equivalence test guards against drift)."""
        x = x.astype(dtype)
        if spec.hybrid:
            x, _ = ResNetV2Stem(dtype=dtype).apply(
                {"params": trunk_params["backbone"]}, x)
            patch = 1
        else:
            patch = 16
        x = PatchEmbed(dim, patch, dtype=dtype).apply(
            {"params": trunk_params["patch_embed"]}, x)
        cls = jnp.broadcast_to(trunk_params["cls_token"],
                               (x.shape[0], 1, dim))
        x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
        pe = resize_pos_embed(trunk_params["pos_embed"], 1, (gh, gw))
        x = x + pe.astype(x.dtype)
        return _mirror_second_half(x, gh, gw, 1)

    def run_stage(block_params_local, x):
        """One stage's layer stack; folds each layer's probs into the two
        consistency scalars immediately (nothing (N, N)-sized survives)."""
        mb = x.shape[0] // 2

        def body(h, layer_params):
            h, probs = block.apply({"params": layer_params}, h, None, "mean")
            a1, a2 = probs[:mb], probs[mb:]
            cls_l1 = losses.l1_loss(a1[:, 0, 1:], a2[:, 0, 1:])
            aff_l1 = losses.l1_loss(a1[:, 1:, 1:], a2[:, 1:, 1:])
            return h, (cls_l1, aff_l1)

        y, (cls_ls, aff_ls) = jax.lax.scan(body, x, block_params_local)
        return y, jnp.sum(cls_ls), jnp.sum(aff_ls)

    def local_fn(params, batch):
        p = params["params"]
        stage = jax.lax.axis_index(pipe_axis)
        x1 = batch["image"]
        labels = batch["label"]
        b_l = x1.shape[0]
        mb = b_l // M
        x2 = x1[:, :, ::-1, :]  # hflip view (train_acr.py:135)
        tok = embed(p["trunk"], jnp.concatenate([x1, x2], axis=0))

        # (M, 2mb, N, D) microbatches of stacked (view-1, view-2) halves
        v1 = tok[:b_l].reshape(M, mb, n_tokens, dim)
        v2 = tok[b_l:].reshape(M, mb, n_tokens, dim)
        mbs = jnp.concatenate([v1, v2], axis=1)
        labels_m = labels.reshape(M, mb, -1)

        wc = p["cls_head"]["kernel"].astype(jnp.float32)
        bc = p["cls_head"]["bias"].astype(jnp.float32)
        blocks_local = p["trunk"][_BLOCKS_KEY]["block"]
        fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            recv, cls_acc, aff_acc, l1_acc, l2_acc = carry
            j = t - stage  # microbatch id at this stage (valid in [0, M))
            valid = (j >= 0) & (j < M)
            inp0 = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, M - 1), axis=0, keepdims=False)
            x_in = jnp.where(stage == 0, inp0, recv)
            y, cls_s, aff_s = run_stage(blocks_local, x_in)
            cls_acc = cls_acc + jnp.where(valid, cls_s, 0.0)
            aff_acc = aff_acc + jnp.where(valid, aff_s, 0.0)

            # Last stage: classification heads on the retiring microbatch
            # (logits = cls_head(CLS token of the PRE-norm final block
            # output) — reference forward_cls, DPT/ACR.py:92-116).
            logits = y[:, 0, :].astype(jnp.float32) @ wc + bc
            lbl = jax.lax.dynamic_index_in_dim(
                labels_m, jnp.clip(j, 0, M - 1), axis=0, keepdims=False)
            on_head = valid & (stage == n_stages - 1)
            l1_acc = l1_acc + jnp.where(
                on_head,
                losses.multilabel_soft_margin_loss(logits[:mb], lbl), 0.0)
            l2_acc = l2_acc + jnp.where(
                on_head,
                losses.multilabel_soft_margin_loss(logits[mb:], lbl), 0.0)

            recv_next = (jax.lax.ppermute(y, pipe_axis, fwd_perm)
                         if n_stages > 1 else y)
            return (recv_next, cls_acc, aff_acc, l1_acc, l2_acc), None

        # Promote the carry inits to "varying over both mesh axes" — the
        # loop outputs are (recv via ppermute varies over 'pipe'; the
        # accumulators mix batch- and stage-dependent values), and scan
        # requires carry-in/carry-out type equality under shard_map's
        # varying-axis tracking.
        zero = jnp.zeros((), jnp.float32)
        _pvary = (  # lax.pvary deprecated in favor of pcast (jax >= 0.9)
            (lambda v, axes: jax.lax.pcast(v, axes, to="varying"))
            if hasattr(jax.lax, "pcast") else jax.lax.pvary)
        carry0 = jax.tree.map(
            lambda v: _pvary(v, (data_axis, pipe_axis)),
            (jnp.zeros((2 * mb, n_tokens, dim), tok.dtype),
             zero, zero, zero, zero))
        ticks = jnp.arange(M + n_stages - 1)
        (_, cls_acc, aff_acc, l1_acc, l2_acc), _ = jax.lax.scan(
            tick, carry0, ticks)

        # Assemble: layer sums live per stage, head sums on the last stage.
        cls_align = jax.lax.psum(cls_acc, pipe_axis) / (depth * M)
        aff_align = jax.lax.psum(aff_acc, pipe_axis) / (depth * M)
        cls_loss_1 = jax.lax.psum(l1_acc, pipe_axis) / M
        cls_loss_2 = jax.lax.psum(l2_acc, pipe_axis) / M
        total = (cls_loss_1 + cls_loss_2
                 + alpha * cls_align + alpha * aff_align)
        parts = {
            "cls_loss_1": cls_loss_1,
            "cls_loss_2": cls_loss_2,
            "cls_align_loss": cls_align,
            "aff_align_loss": aff_align,
            "loss": total,
        }
        # Global batch mean over the data shards; replicates every output.
        return jax.tree.map(lambda v: jax.lax.pmean(v, data_axis), parts)

    def train_step(state, batch):
        param_specs = _param_specs_pp(state.params, pipe_axis)
        mapped = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(param_specs,
                      {"image": P(data_axis), "label": P(data_axis)}),
            out_specs=P())

        def loss_fn(params):
            parts = mapped(params, batch)
            return parts["loss"], parts

        grads, parts = jax.grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, parts

    return train_step
