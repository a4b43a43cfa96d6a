"""Training losses for ACR: multilabel classification + all-pairs attention consistency.

Reference semantics (``train_acr.py:137-168``):

* ``multilabel_soft_margin_loss`` on both siamese views' CLS logits.
* L1 between view-1 and *un-flipped* view-2 CLS-to-patch attention rows.
* L1 between view-1 and un-flipped view-2 patch-to-patch affinity blocks.

The reference un-flips view 2 with three Python loops of per-row ``flip``
slices over the attention tensor (``train_acr.py:151-158``) — O(p) kernel
launches per step. Here the horizontal flip of the token grid is a single
static permutation, applied with ``jnp.take`` (one fused gather per axis),
which XLA folds into the surrounding elementwise graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def hflip_token_permutation(grid_h: int, grid_w: int) -> np.ndarray:
    """Permutation p with ``tokens_flipped[i] = tokens[p[i]]`` for a
    horizontally flipped image's patch grid, row-major order.

    Patch (r, c) of the flipped image shows the content of patch
    (r, w-1-c) of the original, so un-flipping view-2 attention indexed by
    flipped-grid tokens is a gather with this (self-inverse) permutation.
    """
    idx = np.arange(grid_h * grid_w).reshape(grid_h, grid_w)
    return idx[:, ::-1].reshape(-1).copy()


def unflip_attention(attn: jnp.ndarray, perm: jnp.ndarray,
                     axes: tuple = (-2, -1)) -> jnp.ndarray:
    """Apply the flip permutation along the given token axes."""
    for ax in axes:
        attn = jnp.take(attn, perm, axis=ax)
    return attn


def multilabel_soft_margin_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """torch ``F.multilabel_soft_margin_loss`` semantics:

    ``mean_b( mean_c( -[y log sigmoid(x) + (1-y) log sigmoid(-x)] ) )``

    computed with the numerically stable log-sigmoid.
    """
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    loss = -(labels * jax.nn.log_sigmoid(logits)
             + (1.0 - labels) * jax.nn.log_sigmoid(-logits))
    return jnp.mean(loss)


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def _unflip_token_axis(x: jnp.ndarray, grid: tuple, axis: int) -> jnp.ndarray:
    """Un-mirror a row-major token axis of length p*q by reversing the
    column dimension — a reshape + ``rev`` instead of a gather (and its
    scatter transpose in the backward), which is substantially cheaper on
    TPU for the (B, L, N, N) affinity stacks."""
    p, q = grid
    axis = axis % x.ndim
    shape = x.shape[:axis] + (p, q) + x.shape[axis + 1:]
    return jnp.flip(x.reshape(shape), axis=axis + 1).reshape(x.shape)


# (A single multi-dim rev over a (..., p, q, p, q) view measured SLOWER
# than two sequential single-axis reversals on v5e — 94.4 vs 96.8 img/s on
# the train step; the interleaved stride pattern defeats the rev's tiling.)


def acr_consistency_losses(
    attn1: jnp.ndarray,
    attn2: jnp.ndarray,
    perm: jnp.ndarray = None,
    grid: tuple = None,
) -> tuple:
    """CLS-alignment and affinity-alignment L1 losses.

    Args:
      attn1: (B, L, N, N) head-mean attention stack of the original view.
      attn2: (B, L, N, N) stack of the horizontally flipped view.
      perm:  (N-1,) hflip token permutation (gather path; used when no
        grid is given).
      grid:  (p, q) patch grid; enables the cheap reshape+rev un-flip.

    Returns:
      (cls_align_loss, aff_align_loss) — reference ``train_acr.py:143-161``:
      cls rows are ``attn[:, :, 0, 1:]``, affinity is ``attn[:, :, 1:, 1:]``;
      view 2 is un-flipped before comparison (one axis for the cls row,
      both axes for the affinity block).
    """
    attn1_cls = attn1[:, :, 0, 1:]
    attn1_aff = attn1[:, :, 1:, 1:]
    attn2_cls = attn2[:, :, 0, 1:]
    attn2_aff = attn2[:, :, 1:, 1:]

    if grid is not None:
        attn2_cls = _unflip_token_axis(attn2_cls, grid, -1)
        attn2_aff = _unflip_token_axis(
            _unflip_token_axis(attn2_aff, grid, -2), grid, -1)
    else:
        attn2_cls = jnp.take(attn2_cls, perm, axis=-1)
        attn2_aff = unflip_attention(attn2_aff, perm, axes=(-2, -1))

    return l1_loss(attn1_cls, attn2_cls), l1_loss(attn1_aff, attn2_aff)


def acr_consistency_losses_layers(
    probs_layers,
    b: int,
    grid: tuple,
    aligned: bool = False,
) -> tuple:
    """Per-layer formulation of :func:`acr_consistency_losses` over the
    UNSTACKED per-layer exports.

    Materializing the (B, L, N, N) stack costs ~1 GB of pure data movement
    per step at the flagship shape (stack + slice + rev each read+write the
    whole tensor, and the backward mirrors them; measured ~30 ms/step plus
    the remat pressure of holding multiple copies). Consuming the per-layer
    (2b, N, N) exports directly keeps every tensor at 1/L size, fuses per
    layer, and skips the stack/unstack entirely. Identical math: each layer
    contributes its mean; layers are averaged (all layers have equal
    element counts, so this equals the stacked global mean).

    ``aligned=True`` means the trunk already un-mirrored view 2's token
    order (``mirror_second_half``), so its exports arrive as P.A.P^T and no
    per-layer un-flip is needed — the dominant data-movement term of the
    loss (two full (2b, N, N) reversal passes per layer, plus their
    backward scatters) disappears.
    """
    cls_sum = 0.0
    aff_sum = 0.0
    for probs in probs_layers:
        a1, a2 = probs[:b], probs[b:]
        a1_cls, a2_cls = a1[:, 0, 1:], a2[:, 0, 1:]
        a1_aff, a2_aff = a1[:, 1:, 1:], a2[:, 1:, 1:]
        if not aligned:
            a2_cls = _unflip_token_axis(a2_cls, grid, -1)
            a2_aff = _unflip_token_axis(
                _unflip_token_axis(a2_aff, grid, -2), grid, -1)
        cls_sum = cls_sum + l1_loss(a1_cls, a2_cls)
        aff_sum = aff_sum + l1_loss(a1_aff, a2_aff)
    n = len(probs_layers)
    return cls_sum / n, aff_sum / n


def acr_total_loss_layers(
    logits1: jnp.ndarray,
    logits2: jnp.ndarray,
    probs_layers,
    labels: jnp.ndarray,
    grid: tuple,
    alpha: float,
    aligned: bool = False,
) -> tuple:
    """ACR objective over per-layer attention exports (see
    :func:`acr_consistency_losses_layers`); both views stacked on the batch
    axis of each layer's (2b, N, N) export."""
    b = labels.shape[0]
    cls_loss_1 = multilabel_soft_margin_loss(logits1, labels)
    cls_loss_2 = multilabel_soft_margin_loss(logits2, labels)
    cls_align, aff_align = acr_consistency_losses_layers(
        probs_layers, b, grid, aligned=aligned)
    total = cls_loss_1 + cls_loss_2 + alpha * cls_align + alpha * aff_align
    return total, {
        "cls_loss_1": cls_loss_1,
        "cls_loss_2": cls_loss_2,
        "cls_align_loss": cls_align,
        "aff_align_loss": aff_align,
        "loss": total,
    }


def acr_total_loss_fused(
    logits1: jnp.ndarray,
    logits2: jnp.ndarray,
    consistency_sums,
    labels: jnp.ndarray,
    n_tokens: int,
    alpha: float,
) -> tuple:
    """ACR objective over IN-KERNEL consistency partial sums (see
    ``ops.attn_pallas.fused_attention_pair_consistency``): each layer
    contributes per-pair un-normalized sums of |p1 - p2| over the CLS row
    and the affinity block; normalizing by pairs*(N-1) / pairs*(N-1)^2 and
    averaging layers reproduces :func:`acr_consistency_losses_layers`
    (aligned) exactly."""
    b = labels.shape[0]
    n1 = n_tokens - 1
    cls_loss_1 = multilabel_soft_margin_loss(logits1, labels)
    cls_loss_2 = multilabel_soft_margin_loss(logits2, labels)
    cls_align = 0.0
    aff_align = 0.0
    for cls_s, aff_s in consistency_sums:
        cls_align = cls_align + jnp.sum(cls_s) / (b * n1)
        aff_align = aff_align + jnp.sum(aff_s) / (b * n1 * n1)
    L = len(consistency_sums)
    cls_align = cls_align / L
    aff_align = aff_align / L
    total = cls_loss_1 + cls_loss_2 + alpha * cls_align + alpha * aff_align
    return total, {
        "cls_loss_1": cls_loss_1,
        "cls_loss_2": cls_loss_2,
        "cls_align_loss": cls_align,
        "aff_align_loss": aff_align,
        "loss": total,
    }


def acr_total_loss(
    logits1: jnp.ndarray,
    logits2: jnp.ndarray,
    attn1: jnp.ndarray,
    attn2: jnp.ndarray,
    labels: jnp.ndarray,
    perm: jnp.ndarray,
    alpha: float,
) -> tuple:
    """Full ACR objective (reference ``train_acr.py:160-168``).

    Returns (total, dict of components).
    """
    cls_loss_1 = multilabel_soft_margin_loss(logits1, labels)
    cls_loss_2 = multilabel_soft_margin_loss(logits2, labels)
    n_patches = attn1.shape[-1] - 1
    p = int(round(n_patches ** 0.5))
    grid = (p, p) if p * p == n_patches else None
    cls_align, aff_align = acr_consistency_losses(attn1, attn2, perm, grid)
    total = cls_loss_1 + cls_loss_2 + alpha * cls_align + alpha * aff_align
    return total, {
        "cls_loss_1": cls_loss_1,
        "cls_loss_2": cls_loss_2,
        "cls_align_loss": cls_align,
        "aff_align_loss": aff_align,
        "loss": total,
    }


def softmax_cross_entropy_ignore(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = 255
) -> jnp.ndarray:
    """Mean softmax cross-entropy over (B, C, H, W) logits with an ignore
    label (reference ``tool/loss.py:14-26``, CrossEntropyLoss semantics:
    mean over non-ignored pixels)."""
    num_classes = logits.shape[1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    picked = jnp.take_along_axis(
        log_probs, safe_labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    loss = -jnp.where(valid, picked, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)


def focal_loss_ignore(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.5,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Focal loss (reference ``tool/loss.py:28-51``): per-pixel CE modulated
    by alpha * (1 - p_t)^gamma; the reference computes -((1-pt)^gamma) * logpt
    with pt = exp(-ce) then multiplies by alpha, mean-reduced."""
    num_classes = logits.shape[1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    logpt = jnp.take_along_axis(
        log_probs, safe_labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    pt = jnp.exp(logpt)
    loss = -alpha * (1.0 - pt) ** gamma * logpt
    loss = jnp.where(valid, loss, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)


def hflip_window_permutations(n_cols: int, ws: int, shift: int = 0):
    """Permutations un-mirroring window-attention exports.

    Non-shifted blocks (``shift=0``): on a horizontally flipped image,
    window (r, c) shows the content of original window (r, n_cols-1-c),
    tokens inside a window permute by column reversal.

    Shifted blocks (roll-aware un-indexing): with roll -s, flipped-view
    rolled column j equals original rolled column (W-1-2s-j) mod W. When
    ``2*shift`` is a multiple of ``ws`` (true for even window sizes with
    the standard shift = ws//2) this modular reversal maps ws-aligned
    column blocks onto ws-aligned column blocks: window c -> window
    (n_cols - 1 - 2*shift//ws - c) mod n_cols, with the same within-window
    column reversal. The wrap-around window maps to itself and its two
    attention-mask zones (each of width shift = ws/2) swap exactly, so the
    masked structure corresponds entry-for-entry. Rows are untouched by a
    horizontal flip, so the row roll is common to both views.

    Raises for odd window sizes with a nonzero shift, where the mirrored
    shifted partition genuinely straddles window boundaries.

    Extends the ACR all-pairs consistency (train_acr.py:143-161) to Swin
    backbones; requires the padded grid to be divisible by ws with no
    actual padding (the config-of-record swin_base_384 grids all are).
    """
    if shift and (2 * shift) % ws != 0:
        raise ValueError(
            f"shifted-window flip un-indexing needs 2*shift % ws == 0 "
            f"(got shift={shift}, ws={ws}); skip consistency on this block")
    offset = (2 * shift) // ws
    window_perm = (n_cols - 1 - offset - np.arange(n_cols)) % n_cols
    token_perm = hflip_token_permutation(ws, ws)
    return window_perm, token_perm


def swin_window_consistency_loss(
    probs1: jnp.ndarray,
    probs2: jnp.ndarray,
    n_rows: int,
    n_cols: int,
    ws: int,
    shift: int = 0,
) -> jnp.ndarray:
    """L1 all-pairs consistency between a view and its mirror for one Swin
    block's window-attention export (shifted blocks included when the
    roll-aware un-indexing applies — see ``hflip_window_permutations``).

    Args:
      probs1, probs2: (B, nW, ws*ws, ws*ws) head-mean window probs of the
        original and the horizontally flipped view; nW = n_rows * n_cols.
    """
    wperm, tperm = hflip_window_permutations(n_cols, ws, shift)
    full_wperm = (
        np.arange(n_rows)[:, None] * n_cols + wperm[None, :]
    ).reshape(-1)
    p2 = jnp.take(probs2, jnp.asarray(full_wperm), axis=1)
    p2 = jnp.take(p2, jnp.asarray(tperm), axis=2)
    p2 = jnp.take(p2, jnp.asarray(tperm), axis=3)
    return l1_loss(probs1, p2)


def _masked_cos(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Cosine similarity matrix between row sets a (N,D) and b (M,D)."""
    na = jnp.linalg.norm(a, axis=1, keepdims=True)
    nb = jnp.linalg.norm(b, axis=1, keepdims=True)
    return (a @ b.T) / (na @ nb.T + eps)


def prototype_contrast_loss(
    seg_logits: jnp.ndarray,
    features: jnp.ndarray,
    num_classes: int = 21,
) -> jnp.ndarray:
    """Prototype contrast regularizer (reference ``compute_dis_no_batch``,
    ``myTool.py:1624-1710``), jit-friendly masked formulation:

    * pixel term: mean (1 - cos) distance of background pixels to their
      per-sample background centroid, and of each present foreground
      class's pixels to its (batch-global) class centroid;
    * center term: 0.5 * mean (1 + cos) between distinct fg centroids
      + 0.5 * mean (1 + cos) between fg centroids and bg centroids.

    The reference's Python branching on empty classes becomes masked
    averaging over present classes (class present iff it wins >= 1 pixel).

    Args:
      seg_logits: (B, C, N) per-pixel class scores.
      features:   (B, D, N) per-pixel features.
    """
    B, C, N = seg_logits.shape
    D = features.shape[1]
    labels = jnp.argmax(seg_logits, axis=1)             # (B, N)
    feats = jnp.transpose(features, (0, 2, 1))          # (B, N, D)

    # ---- background: per-sample centroid + pixel distances
    bg_mask = (labels == 0).astype(jnp.float32)          # (B, N)
    bg_num = jnp.sum(bg_mask, axis=1) + 1e-7             # (B,)
    bg_center = jnp.einsum("bn,bnd->bd", bg_mask, feats) / bg_num[:, None]
    bg_cos = jnp.einsum("bnd,bd->bn", feats, bg_center) / (
        jnp.linalg.norm(feats, axis=-1) * jnp.linalg.norm(bg_center, axis=-1)[:, None]
        + 1e-7)
    bg_pixel_dis = jnp.sum((1.0 - bg_cos) * bg_mask, axis=1) / bg_num
    bg_present = (jnp.sum(bg_mask, axis=1) >= 1).astype(jnp.float32)
    pixel_dis = jnp.sum(jnp.where(bg_present > 0, bg_pixel_dis, 2.0))

    # ---- foreground: batch-global per-class centroids
    flat_feats = feats.reshape(B * N, D)
    flat_labels = labels.reshape(B * N)
    cls_ids = jnp.arange(1, num_classes)
    cls_mask = (flat_labels[None, :] == cls_ids[:, None]).astype(jnp.float32)
    cls_num = jnp.sum(cls_mask, axis=1)                  # (C-1,)
    present = (cls_num >= 1).astype(jnp.float32)
    centers = (cls_mask @ flat_feats) / (cls_num[:, None] + 1e-7)

    pix_cos = _masked_cos(flat_feats, centers)           # (BN, C-1)
    fg_pix_dis = jnp.sum((1.0 - pix_cos).T * cls_mask, axis=1) / (cls_num + 1e-7)
    pixel_dis = pixel_dis + jnp.sum(fg_pix_dis * present)
    n_centers = jnp.sum(present) + B  # fg centers + one bg center per sample
    pixel_dis = pixel_dis / jnp.maximum(n_centers, 1.0)

    # ---- center separation terms
    pm = present[:, None] * present[None, :]
    fg_fg = (1.0 + _masked_cos(centers, centers)) * pm
    off_diag = pm * (1.0 - jnp.eye(num_classes - 1))
    n_pairs = jnp.sum(off_diag)
    fg_fg_loss = jnp.where(
        n_pairs > 0, jnp.sum(fg_fg * (1.0 - jnp.eye(num_classes - 1))) / jnp.maximum(n_pairs, 1.0), 0.0)

    fg_bg = (1.0 + _masked_cos(centers, bg_center)) * present[:, None] * bg_present[None, :]
    n_fb = jnp.sum(present) * jnp.sum(bg_present)
    fg_bg_loss = jnp.where(n_fb > 0, jnp.sum(fg_bg) / jnp.maximum(n_fb, 1.0), 0.0)

    return pixel_dis + 0.5 * fg_fg_loss + 0.5 * fg_bg_loss


def compute_joint_ce(pred_logits: jnp.ndarray, seg_label: jnp.ndarray) -> jnp.ndarray:
    """bg/fg-split cross-entropy over pseudo labels with ignore=255
    (reference ``compute_joint_loss``, ``myTool.py:838-855``): the pseudo
    label is split into a background-only view (fg -> ignore) and a
    foreground-only view (bg -> ignore); both CE terms are summed."""
    seg_label = jnp.asarray(seg_label)
    bg_label = jnp.where(seg_label != 0, 255, seg_label)
    fg_label = jnp.where(seg_label == 0, 255, seg_label)
    return (softmax_cross_entropy_ignore(pred_logits, bg_label)
            + softmax_cross_entropy_ignore(pred_logits, fg_label))
