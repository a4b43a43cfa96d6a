"""Dataclass configs for every pipeline stage.

The reference drives each stage with argparse flags whose values of record
live in shell scripts (``train_acr.sh:8-19,26-37,40-47``). Here each stage
has one typed config object; CLIs build these from flags.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

VOC_CLASSES: Tuple[str, ...] = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)

VOC_CATEGORIES: Tuple[str, ...] = ("background",) + VOC_CLASSES

# ImageNet statistics used by the reference normalization
# (``myTool.py:1177-1179``).
IMAGENET_MEAN: Tuple[float, float, float] = (0.485, 0.456, 0.406)
IMAGENET_STD: Tuple[float, float, float] = (0.229, 0.224, 0.225)


def parse_bool(s: str) -> bool:
    """Strict argparse bool: the reference CLIs take ``--aff True/False``
    strings (``train_acr.sh:37``); ``type=bool`` would treat every
    non-empty string — including ``"False"`` — as True."""
    v = s.strip().lower()
    if v in ("true", "1", "yes", "on"):
        return True
    if v in ("false", "0", "no", "off"):
        return False
    raise ValueError(f"expected a boolean, got {s!r}")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """ACR task-model configuration (reference ``DPT/ACR.py:147-165``)."""

    backbone: str = "vitb_hybrid"  # vitb_hybrid | vitb | vitl | deit | deit_distilled
    num_classes: int = 20
    features: int = 256            # DPT scratch width (kept for decoder parity)
    # Which transformer blocks feed the DPT reassemble taps
    # (reference ``DPT/ACR.py:59-65``); resolved per backbone if None.
    hooks: Optional[Tuple[int, int, int, int]] = None
    # Compute dtype for matmul-heavy ops. Attention probabilities are always
    # computed/exported in float32 (the reference force-disables AMP,
    # ``train_acr.py:137``; fp32 probs on TPU keeps parity while bf16
    # matmuls keep the MXU fast).
    compute_dtype: str = "bfloat16"
    # Attention implementation: "xla" reference einsum path or "pallas"
    # fused kernel (kernel exports head-mean probs without materializing
    # per-head probs in HBM).
    attn_impl: str = "xla"
    # Scan the transformer depth (stacked per-layer params): ~12x smaller
    # compiled program; checkpoint layout differs from the unrolled trunk.
    scan_blocks: bool = False
    # Hybrid stem only: compute the 7x7/2 stem conv as space-to-depth +
    # folded 4x4/1 conv (exact same params/outputs; MLPerf-ResNet trick for
    # low-channel stride-2 convs on the MXU). See models/hybrid.py.
    s2d_stem: bool = False
    # dtype of the exported head-mean probabilities (the largest HBM stream
    # in training). "bfloat16" halves that traffic at ~0.4% relative error
    # on the L1 regularizer inputs; "float32" matches the reference.
    probs_dtype: str = "float32"
    # Compute the consistency L1 terms INSIDE the attention kernel
    # (training only; needs attn_impl='pallas' + aligned_mirror): the
    # head-mean probs never reach HBM — the kernel emits per-pair partial
    # sums plus a bf16 sign tensor for the backward. Exactly the same
    # gradients as the unfused path (tested); saves ~4.7 GB/step of
    # probability traffic at the flagship shape (109.4 -> 113.5 img/s on
    # the batch-24 v5e train step). False falls back to the HBM-export
    # path (always used by inference/GETAM and the xla impl).
    fuse_consistency: bool = True
    # Sequence parallelism: name of a mesh axis to shard the TOKEN axis of
    # every trunk activation over (scaling-book recipe: annotate with
    # ``with_sharding_constraint``, let GSPMD insert the all-gathers around
    # attention's all-pairs contraction). Composes with the 'data' and
    # 'model' axes — a ('data','model','seq') mesh runs dp x tp x sp.
    # Requires an ambient mesh (``jax.set_mesh``) carrying this axis and
    # the XLA attention path (the Pallas kernel is opaque to GSPMD's token
    # partitioner and stays batch-sharded). None (default) = off.
    seq_axis: Optional[str] = None
    # Note: the reference ACR also instantiates DPT scratch convs that its
    # forward never uses (torch needed find_unused_parameters=True,
    # ``train_acr.py:99``); the converter drops them on import and the DPT
    # decoder lives in models/dpt.py for the paths that do use it.


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """VOC/COCO training (reference ``train_acr.py:49-117``, ``train_acr.sh``)."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    dataset: str = "voc12"
    crop_size: int = 384
    batch_size: int = 4            # global batch (reference: 1/GPU x 4 GPUs)
    max_epochs: int = 10
    lr: float = 0.05
    weight_decay: float = 5e-4
    momentum: float = 0.9
    poly_power: float = 0.9        # lr * (1 - step/max_step) ** power
    alpha: float = 125.0           # consistency-loss weight (train_acr.sh:16)
    seed: int = 0
    log_every: int = 50
    val_every: int = 5000
    checkpoint_every: int = 5000
    checkpoint_dir: str = "weight"
    session_name: str = "acr_tpu"
    # Data locations
    voc12_root: str = "voc/path"
    image_dir: str = "voc/image/path"
    train_list: str = "voc12/train_aug_id.txt"
    val_list: str = "voc12/val_id.txt"
    # COCO: separate validation image directory (reference --valpath,
    # ``train_acr_coco.py:27,67``); None = validate from image_dir (VOC,
    # where train/val ids share one JPEGImages dir).
    val_image_dir: Optional[str] = None
    cls_labels_path: str = "voc12/cls_labels.npy"
    num_workers: int = 8
    # Mesh axes: data parallel is the reference's only strategy
    # (SURVEY.md §2.7); model axis enables tensor parallelism over heads/MLP.
    mesh_shape: Tuple[int, ...] = (-1,)          # -1: all devices on 'data'
    mesh_axes: Tuple[str, ...] = ("data",)
    # GPipe microbatches per step when the mesh carries a 'pipe' axis
    # (parallel/pipeline.py); ignored otherwise.
    pp_microbatches: int = 2
    # Initialize jax.distributed before building the mesh (multi-host
    # pods/slices; reference equivalent: the -n/-nr NCCL rendezvous flags,
    # ``train_acr.py:70-89``). Coordinator details are auto-detected on TPU
    # pods or taken from the JAX_COORDINATOR_* environment.
    multihost: bool = False
    # Reference quirk: PolyOptimizer passes weight_decay into torch SGD's
    # momentum slot (tool/torchutils.py:12), so the reference effectively
    # trains with momentum=5e-4 and no weight decay. Set True to reproduce.
    reference_optimizer_quirk: bool = False
    # Global-norm gradient clipping (0 = off, reference behavior).
    clip_grad_norm: float = 0.0
    # Gradient accumulation: parameters update every N train steps with
    # the mean gradient (1 = off, reference behavior — it has no
    # accumulation at all; SURVEY §2.7). max_epochs/steps count OPTIMIZER
    # updates, so the poly LR schedule is unaffected.
    accum_steps: int = 1
    # Graft ImageNet-pretrained trunk weights from the zoo npz before
    # training (the reference bakes this into its model constructor:
    # ``DPT/ACR.py`` use_pretrain=True -> timm load_pretrained). Run
    # ``python -m acr_wsss_tpu.models.zoo fetch <backbone>`` once first.
    pretrained: bool = False
    # TPU-native input pipeline (data/device_aug.py): host ships raw uint8
    # rasters + a 9-int augmentation descriptor; resize/flip/normalize/crop
    # run fused inside the jit train step. Same rng stream and (to float
    # tolerance) same crops as the host chain; removes the host float-math
    # bottleneck on thin TPU-VM hosts and quarters the H2D bytes.
    device_aug: bool = False
    # Static square the raw rasters are zero-padded to for device_aug —
    # must cover the corpus's largest image (VOC: 500).
    aug_pad: int = 512
    # Keep decoded uint8 rasters in RAM after first read (decoded VOC
    # train_aug ~6 GB): later epochs skip JPEG decode entirely.
    cache_decoded: bool = False
    # ZeRO-3 / FSDP placement (parallel.fsdp_shardings): shard every large
    # parameter AND optimizer-state leaf over the 'data' axis; XLA
    # all-gathers params at use sites and reduce-scatters gradients. Cuts
    # per-device state memory ~N_data-fold; step math is unchanged
    # (equivalence-tested). Not composable with a 'pipe' mesh axis (the
    # pipeline step carries its own stage-sharded placement).
    fsdp: bool = False
    # Un-mirror the flipped view's TOKEN ORDER once after the pos-embed
    # (the trunk is permutation-equivariant) instead of un-flipping every
    # layer's (B, N, N) attention export in the loss — identical math
    # (reference ``train_acr.py:149-158`` semantics), ~O(L*N^2) less fp32
    # data movement per step. False = literal reference ordering.
    aligned_mirror: bool = True
    # Write a JAX profiler trace of steps 10-20 here (None = off).
    profile_dir: Optional[str] = None
    # Hung-step watchdog (utils/watchdog.py): if no train step completes
    # within this many seconds AFTER the first step (compile exempt), the
    # process exits EX_TEMPFAIL so a relaunch resumes from the last
    # checkpoint. Guards against wedged remote-backend RPCs that block
    # forever without raising. 0 = off.
    step_timeout_s: float = 0.0


@dataclasses.dataclass(frozen=True)
class InferConfig:
    """CAM/GETAM inference (reference ``infer_cam.py:43-99``, ``train_acr.sh:26-37``)."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    # "voc12": names from infer_list + labels from the cls_labels npy.
    # "coco": names from infer_list (or the image-dir listing) + labels
    # parsed from bbox txts in cls_labels_path (reference COCO inference
    # flow, ``infer_cam.py`` + ``myTool.py:1497-1514``).
    dataset: str = "voc12"
    weights: str = "weight/acr_tpu_last"
    crop_size: int = 384
    start_layer: int = 10
    getam_func: str = "grad"       # grad | grad_s | cam_grad | cam_grad_s
    use_aff: bool = True           # patch-affinity refinement (infer_cam.py:183-185)
    scales: Sequence[float] = (1.0,)
    flip_tta: bool = True
    out_cam: Optional[str] = None
    out_crf: Optional[str] = None
    heatmap: Optional[str] = None
    low_alpha: int = 1
    high_alpha: int = 12
    # On-device CRF for the --out_crf stage: jit crf_inference_jax at one
    # (crf_pad, crf_pad) bucket instead of per-image host pydensecrf-style
    # calls (ops/crf.py; quantified agreement in tests/test_bilateral_crf.py).
    crf_device: bool = False
    crf_pad: int = 512
    image_dir: str = "voc/image/path"
    infer_list: str = "voc12/train_id.txt"
    cls_labels_path: str = "voc12/cls_labels.npy"
    # Per-pass class backprop slots (0 = sweep every class). The per-class
    # vjp is the dominant inference cost; present classes per image are
    # few, so padded slots cut wall-clock without changing any output.
    class_slots: int = 4
    # Images per compiled pass (2*batch_images TTA views per batch).
    # Device time per image is ~flat in the group size; batching overlaps
    # host-side loading/dispatch with the device pass. 1 = reference-style
    # one-image-at-a-time.
    batch_images: int = 1
    # PAMR refinement iterations (0 = off, the reference behavior — it
    # imports PAMR but never invokes it, ``infer_cam.py:14``). When on,
    # each TTA view's CAM is refined at crop resolution by the crop's
    # pixel-adaptive affinities (``ops/pamr.py``) before TTA summation.
    pamr_iters: int = 0
    pamr_dilations: Sequence[int] = (1, 2, 4, 8, 12, 24)
    # Data-parallel inference mesh size (0/1 = single device). One process
    # drives a dp-chip ('data',) mesh: the TTA-view batch axis is sharded,
    # params replicated, outputs identical. Replaces the reference's
    # scale-out story (one process per GPU over manual file-list splits).
    dp: int = 0


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Pseudo-mask mIoU evaluation (reference ``evaluation.py:106-133``)."""

    predict_dir: str = "output/cam_npy"
    gt_dir: str = "VOC2012/SegmentationClass"
    name_list: str = "voc12/train_id.txt"
    logfile: str = "evallog.txt"
    comment: str = ""
    input_type: str = "npy"        # npy | png
    threshold: Optional[float] = None
    curve: bool = False
    num_classes: int = 21
    num_workers: int = 8
