"""Pretrained-weight zoo: fetch + convert timm checkpoints to native npz.

The reference auto-downloads ImageNet-pretrained timm checkpoints at model
build time (``models/helpers.py:24-49``; URL tables
``models/vision_transformer.py:49-132``, ``vision_transformer_hybrid.py:45``).
This module is the TPU-native equivalent:

* the same upstream URLs for every backbone the ACR model wires;
* :func:`fetch` downloads the torch checkpoint (where the environment has
  egress), converts it through ``models/convert.py`` and stores a flat
  **npz zoo file** — the framework's native checkpoint format, loadable
  without torch;
* :func:`load_backbone_params` reads a zoo npz back into a flax param
  tree; :func:`init_with_pretrained` grafts it under a freshly-initialized
  ACR model (classifier head stays random, matching the reference's
  ``load_pretrained`` classifier-filtering behavior).

Zero-egress environments: run ``python -m acr_wsss_tpu.models.zoo fetch
<backbone>`` on a connected machine (or pass ``--url file://...`` for an
already-downloaded .pth) and ship the npz.
"""

from __future__ import annotations

import argparse
import os
import re
from typing import Dict, Optional

import numpy as np


# Upstream checkpoint URLs for the wired backbones (reference cfg tables:
# ViT ``models/vision_transformer.py:49-132``; Swin
# ``models/swin_transformer.py:42-83``; PiT ``models/pit.py:40-64``).
ZOO_URLS: Dict[str, str] = {
    "vitb_hybrid": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_base_resnet50_384-9fd3c705.pth",
    "vitb": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_base_p16_384-83fb41ba.pth",
    "vitl": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_large_p16_384-b3be5167.pth",
    "deit": "https://dl.fbaipublicfiles.com/deit/deit_base_patch16_384-8de9b5d1.pth",
    "deit_distilled": "https://dl.fbaipublicfiles.com/deit/deit_base_distilled_patch16_384-d0272ac0.pth",
    "deit_small": "https://dl.fbaipublicfiles.com/deit/deit_small_patch16_224-cd65a155.pth",
    # Swin (ImageNet-22k -> 1k finetunes where available, the reference cfgs)
    "swin_base_384": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_base_patch4_window12_384_22kto1k.pth",
    "swin_large_384": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_large_patch4_window12_384_22kto1k.pth",
    "swin_small": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_small_patch4_window7_224.pth",
    "swin_tiny": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_tiny_patch4_window7_224.pth",
    # timm full Swin names (reference cfg swin_transformer.py:45-90)
    "swin_tiny_patch4_window7_224": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_tiny_patch4_window7_224.pth",
    "swin_small_patch4_window7_224": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_small_patch4_window7_224.pth",
    "swin_base_patch4_window7_224": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_base_patch4_window7_224_22kto1k.pth",
    "swin_base_patch4_window12_384": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_base_patch4_window12_384_22kto1k.pth",
    "swin_large_patch4_window7_224": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_large_patch4_window7_224_22kto1k.pth",
    "swin_large_patch4_window12_384": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_large_patch4_window12_384_22kto1k.pth",
    "swin_base_patch4_window7_224_in22k": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_base_patch4_window7_224_22k.pth",
    "swin_base_patch4_window12_384_in22k": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_base_patch4_window12_384_22k.pth",
    "swin_large_patch4_window7_224_in22k": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_large_patch4_window7_224_22k.pth",
    "swin_large_patch4_window12_384_in22k": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_large_patch4_window12_384_22k.pth",
    # PiT (reference cfg pit.py:42-62; timm full names + distilled)
    "pit_b": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-pit-weights/pit_b_820.pth",
    "pit_s": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-pit-weights/pit_s_809.pth",
    "pit_b_224": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-pit-weights/pit_b_820.pth",
    "pit_s_224": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-pit-weights/pit_s_809.pth",
    "pit_xs_224": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-pit-weights/pit_xs_781.pth",
    "pit_ti_224": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-pit-weights/pit_ti_730.pth",
    "pit_b_distilled_224": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-pit-weights/pit_b_distill_840.pth",
    "pit_s_distilled_224": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-pit-weights/pit_s_distill_819.pth",
    "pit_xs_distilled_224": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-pit-weights/pit_xs_distill_791.pth",
    "pit_ti_distilled_224": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-pit-weights/pit_ti_distill_746.pth",
    # ResNet (timm 'ram' recipe where the reference cfg has one, else the
    # torchvision originals the empty-URL cfgs fall back to)
    "resnet50": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/resnet50_ram-a26f946b.pth",
    "resnet18": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
    "resnet34": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/resnet34-43635321.pth",
    "resnet101": "https://download.pytorch.org/models/resnet101-5d3b4d8f.pth",
    "resnet152": "https://download.pytorch.org/models/resnet152-b121ed2d.pth",
    # ResNeXt / wide-ResNet (same checkpoint layout; cfgs
    # models/resnet.py:80-96)
    "resnext50_32x4d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/resnext50_32x4d_ra-d733960d.pth",
    "resnext101_32x8d": "https://download.pytorch.org/models/resnext101_32x8d-8ba56ff5.pth",
    "wide_resnet50_2": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/wide_resnet50_racm-8234f177.pth",
    # EfficientNet (timm RandAugment recipes, reference cfg table
    # models/efficientnet.py:80-110)
    "efficientnet_b0": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/efficientnet_b0_ra-3dd342df.pth",
    "efficientnet_b1": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/efficientnet_b1-533bc792.pth",
    "efficientnet_b2": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/efficientnet_b2_ra-bcdf34b7.pth",
    "efficientnet_b3": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/efficientnet_b3_ra2-cf984f9c.pth",
    "mobilenetv3_large_100": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/mobilenetv3_large_100_ra-f55367f5.pth",
    # MobileNetV3 family breadth (reference cfg models/mobilenetv3.py:30-78)
    "mobilenetv3_large_100_miil": "https://miil-public-eu.oss-eu-central-1.aliyuncs.com/model-zoo/ImageNet_21K_P/models/timm/mobilenetv3_large_100_1k_miil_78_0.pth",
    "mobilenetv3_large_100_miil_in21k": "https://miil-public-eu.oss-eu-central-1.aliyuncs.com/model-zoo/ImageNet_21K_P/models/timm/mobilenetv3_large_100_in21k_miil.pth",
    "mobilenetv3_rw": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/mobilenetv3_100-35495452.pth",
    "tf_mobilenetv3_large_075": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_mobilenetv3_large_075-150ee8b0.pth",
    "tf_mobilenetv3_large_100": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_mobilenetv3_large_100-427764d5.pth",
    "tf_mobilenetv3_large_minimal_100": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_mobilenetv3_large_minimal_100-8596ae28.pth",
    "tf_mobilenetv3_small_075": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_mobilenetv3_small_075-da427f52.pth",
    "tf_mobilenetv3_small_100": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_mobilenetv3_small_100-37f49e2b.pth",
    "tf_mobilenetv3_small_minimal_100": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_mobilenetv3_small_minimal_100-922a7843.pth",
    # HardCoRe-NAS B-F (reference cfg models/hardcorenas.py:20-27)
    "hardcorenas_b": "https://miil-public-eu.oss-eu-central-1.aliyuncs.com/public/HardCoReNAS/HardCoreNAS_B_Green_40ms_76.5_1f882d1e.pth",
    "hardcorenas_c": "https://miil-public-eu.oss-eu-central-1.aliyuncs.com/public/HardCoReNAS/HardCoreNAS_C_Green_44ms_77.1_d4148c9e.pth",
    "hardcorenas_d": "https://miil-public-eu.oss-eu-central-1.aliyuncs.com/public/HardCoReNAS/HardCoreNAS_D_Green_50ms_77.4_23e3cdde.pth",
    "hardcorenas_e": "https://miil-public-eu.oss-eu-central-1.aliyuncs.com/public/HardCoReNAS/HardCoreNAS_E_Green_55ms_77.9_90f20e8a.pth",
    "hardcorenas_f": "https://miil-public-eu.oss-eu-central-1.aliyuncs.com/public/HardCoReNAS/HardCoreNAS_F_Green_60ms_78.1_2855edf1.pth",
    # NF-ResNet (reference cfg models/nfnet.py:129-130)
    "nf_resnet50": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/nf_resnet50_ra2-9f236009.pth",
    # dm-NFNet-F (DeepMind-compatible; reference cfg models/nfnet.py:46-67;
    # timm nfnet_f1-f7(+s) have no upstream URLs — parity)
    "dm_nfnet_f0": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-dnf-weights/dm_nfnet_f0-604f9c3a.pth",
    "dm_nfnet_f1": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-dnf-weights/dm_nfnet_f1-fc540f82.pth",
    "dm_nfnet_f2": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-dnf-weights/dm_nfnet_f2-89875923.pth",
    "dm_nfnet_f3": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-dnf-weights/dm_nfnet_f3-d74ab3aa.pth",
    "dm_nfnet_f4": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-dnf-weights/dm_nfnet_f4-0ac5b10b.pth",
    "dm_nfnet_f5": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-dnf-weights/dm_nfnet_f5-ecb20ab1.pth",
    "dm_nfnet_f6": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-dnf-weights/dm_nfnet_f6-e0f12116.pth",
    # timm NFNet-L / ECA-NFNet / NF-RegNet (reference cfg models/nfnet.py:103-117)
    "nfnet_l0": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/nfnet_l0_ra2-45c6688d.pth",
    "eca_nfnet_l0": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/ecanfnet_l0_ra2-e3e9ac50.pth",
    "eca_nfnet_l1": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/ecanfnet_l1_ra2-7dce93cd.pth",
    "nf_regnet_b1": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/nf_regnet_b1_256_ra2-ad85cfef.pth",
    # SK-ResNet (reference cfg models/sknet.py:29-39)
    "skresnet18": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/skresnet18_ra-4eec2804.pth",
    "skresnet34": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/skresnet34_ra-bdc0ccde.pth",
    "skresnext50_32x4d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/skresnext50_ra-f40e40bf.pth",
    # ese_vovnet19b_dw (reference cfg models/vovnet.py:152-153)
    "ese_vovnet19b_dw": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/ese_vovnet19b_dw-a8741004.pth",
    # DLA variant zoo (reference cfg models/dla.py:27-48)
    "dla46_c": "http://dl.yf.io/dla/models/imagenet/dla46_c-2bfd52c3.pth",
    "dla46x_c": "http://dl.yf.io/dla/models/imagenet/dla46x_c-d761bae7.pth",
    "dla60x_c": "http://dl.yf.io/dla/models/imagenet/dla60x_c-b870c45c.pth",
    "dla60": "http://dl.yf.io/dla/models/imagenet/dla60-24839fc4.pth",
    "dla60x": "http://dl.yf.io/dla/models/imagenet/dla60x-d15cacda.pth",
    "dla102": "http://dl.yf.io/dla/models/imagenet/dla102-d94d9790.pth",
    "dla102x": "http://dl.yf.io/dla/models/imagenet/dla102x-ad62be81.pth",
    "dla102x2": "http://dl.yf.io/dla/models/imagenet/dla102x2-262837b6.pth",
    "dla169": "http://dl.yf.io/dla/models/imagenet/dla169-0914e092.pth",
    "dla60_res2net": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-res2net/res2net_dla60_4s-d88db7f9.pth",
    "dla60_res2next": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-res2net/res2next_dla60_4s-d327927b.pth",
    # CoaT-Lite (reference cfg models/coat.py:37-44)
    "coat_lite_tiny": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-coat-weights/coat_lite_tiny-461b07a7.pth",
    "coat_lite_mini": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-coat-weights/coat_lite_mini-d7842000.pth",
    # TResNet (reference cfg models/tresnet.py:30-47)
    "tresnet_m": "https://miil-public-eu.oss-eu-central-1.aliyuncs.com/model-zoo/ImageNet_21K_P/models/timm/tresnet_m_1k_miil_83_1.pth",
    # DLA (reference cfg models/dla.py:27-48)
    "dla34": "http://dl.yf.io/dla/models/imagenet/dla34-ba72cf86.pth",
    # DPN (reference cfg models/dpn.py:35-49)
    "dpn68": "https://github.com/rwightman/pytorch-dpn-pretrained/releases/download/v0.1/dpn68-66bebafa7.pth",
    "dpn68b": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/dpn68b_ra-a31ca160.pth",
    # TNT (reference cfg models/tnt.py:30-36)
    "tnt_s_patch16_224": "https://github.com/contrastive/pytorch-image-models/releases/download/TNT/tnt_s_patch16_224.pth.tar",
    # ReXNet (reference cfg models/rexnet.py:23-49)
    "rexnet_100": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-rexnet/rexnetv1_100-1b4dddf4.pth",
    # CSPNet (reference cfg models/cspnet.py:38-44)
    "cspresnet50": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/cspresnet50_ra-d3e8d487.pth",
    "cspresnext50": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/cspresnext50_ra_224-648b4713.pth",
    "cspdarknet53": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/cspdarknet53_ra_256-d05c7c21.pth",
    # VoVNet V2 (reference cfg models/vovnet.py:151-156)
    "ese_vovnet39b": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/ese_vovnet39b-f912fe73.pth",
    # SelecSLS (reference cfg models/selecsls.py:41-43)
    "selecsls42b": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-selecsls/selecsls42b-8af30141.pth",
    # HardCoRe-NAS A (reference cfg models/hardcorenas.py:21)
    "hardcorenas_a": "https://miil-public-eu.oss-eu-central-1.aliyuncs.com/public/HardCoReNAS/HardCoreNAS_A_Green_38ms_75.9_23474aeb.pth",
    # HRNet (hrnetv2 weights; reference cfg table models/hrnet.py:40-60)
    "hrnet_w18_small": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-hrnet/hrnet_w18_small_v1-f460c6bc.pth",
    "hrnet_w18_small_v2": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-hrnet/hrnet_w18_small_v2-4c50a8cb.pth",
    "hrnet_w18": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-hrnet/hrnetv2_w18-8cb57bb9.pth",
    "hrnet_w30": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-hrnet/hrnetv2_w30-8d7f8dab.pth",
    "hrnet_w32": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-hrnet/hrnetv2_w32-90d8c5fb.pth",
    "hrnet_w40": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-hrnet/hrnetv2_w40-7cd397a4.pth",
    "hrnet_w44": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-hrnet/hrnetv2_w44-c9ac8c18.pth",
    "hrnet_w48": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-hrnet/hrnetv2_w48-abd2e6ab.pth",
    "hrnet_w64": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-hrnet/hrnetv2_w64-b47cc881.pth",
    # batch-2 variant URLs (reference cfgs: vgg.py:40-43,
    # inception_v3.py:27-46, tresnet.py:39-47, xception_aligned.py:33-40)
    "vgg11_bn": "https://download.pytorch.org/models/vgg11_bn-6002323d.pth",
    "vgg13_bn": "https://download.pytorch.org/models/vgg13_bn-abd245e5.pth",
    "vgg16_bn": "https://download.pytorch.org/models/vgg16_bn-6c64b313.pth",
    "vgg19_bn": "https://download.pytorch.org/models/vgg19_bn-c79401a0.pth",
    "tf_inception_v3": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_inception_v3-e0069de4.pth",
    "adv_inception_v3": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/adv_inception_v3-9e27bd63.pth",
    "gluon_inception_v3": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/gluon_inception_v3-9f746940.pth",
    "tresnet_m_448": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-tresnet/tresnet_m_448-bc359d10.pth",
    "tresnet_l_448": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-tresnet/tresnet_l_448-940d0cd1.pth",
    "tresnet_xl_448": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-tresnet/tresnet_xl_448-8c1815de.pth",
    "xception65": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_xception_65-c9ae96e8.pth",
    "xception71": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_xception_71-8eec7df1.pth",
    # Attention-ResNets (reference cfg tables: models/resnet.py:143-151,
    # models/res2net.py:25-44, models/resnest.py:29-52). sknet50 has NO
    # pretrained URL upstream either (models/sknet.py:38) — parity.
    "seresnet50": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/seresnet50_ra_224-8efdb4bb.pth",
    # Legacy SENet family (reference cfg models/senet.py:38-58)
    "legacy_seresnet18": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/seresnet18-4bb0ce65.pth",
    "legacy_seresnet34": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/seresnet34-a4004e63.pth",
    "legacy_seresnet50": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-cadene/se_resnet50-ce0d4300.pth",
    "legacy_seresnet101": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-cadene/se_resnet101-7e38fcc6.pth",
    "legacy_seresnet152": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-cadene/se_resnet152-d17c99b7.pth",
    "legacy_senet154": "http://data.lip6.fr/cadene/pretrainedmodels/senet154-c7b49a05.pth",
    "legacy_seresnext26_32x4d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/seresnext26_32x4d-65ebdb501.pth",
    "legacy_seresnext50_32x4d": "http://data.lip6.fr/cadene/pretrainedmodels/se_resnext50_32x4d-a260b3a4.pth",
    "legacy_seresnext101_32x4d": "http://data.lip6.fr/cadene/pretrainedmodels/se_resnext101_32x4d-3b2fe3d8.pth",
    "res2net50": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-res2net/res2net50_26w_4s-06e79181.pth",
    "resnest50d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-resnest/resnest50-528c19ca.pth",
    # Res2Net / ResNeSt variant sweep (reference cfg res2net.py:20-45,
    # resnest.py:28-53)
    "res2net50_26w_4s": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-res2net/res2net50_26w_4s-06e79181.pth",
    "res2net50_48w_2s": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-res2net/res2net50_48w_2s-afed724a.pth",
    "res2net50_14w_8s": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-res2net/res2net50_14w_8s-6527dddc.pth",
    "res2net50_26w_6s": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-res2net/res2net50_26w_6s-19041792.pth",
    "res2net50_26w_8s": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-res2net/res2net50_26w_8s-2c7c9f12.pth",
    "res2net101_26w_4s": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-res2net/res2net101_26w_4s-02a759a1.pth",
    "res2next50": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-res2net/res2next50_4s-6ef7e7bf.pth",
    "resnest14d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/gluon_resnest14-9c8fe254.pth",
    "resnest26d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/gluon_resnest26-50eb607c.pth",
    "resnest101e": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-resnest/resnest101-22405ba7.pth",
    "resnest200e": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-resnest/resnest200-75117900.pth",
    "resnest269e": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-resnest/resnest269-0cc87c48.pth",
    "resnest50d_4s2x40d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-resnest/resnest50_fast_4s2x40d-41d14ed0.pth",
    "resnest50d_1s4x24d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-resnest/resnest50_fast_1s4x24d-d4a4f76f.pth",
    # Inception v3 (torchvision weights; reference cfg
    # models/inception_v3.py:27-46)
    "inception_v3": "https://download.pytorch.org/models/inception_v3_google-1a9a5a14.pth",
    # Inception-v4 (Cadene weights; reference cfg models/inception_v4.py:16-25)
    "inception_v4": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-cadene/inceptionv4-8e4777a0.pth",
    # PNASNet-5-Large (Cadene port; reference cfg models/pnasnet.py:20-35)
    "pnasnet5large": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-cadene/pnasnet5large-bf079911.pth",
    # NASNet-A-Large (Cadene weights; reference cfg models/nasnet.py:16-31)
    "nasnetalarge": "http://data.lip6.fr/cadene/pretrainedmodels/nasnetalarge-a1897284.pth",
    # Inception-ResNet-v2 (reference cfg models/inception_resnet_v2.py:16-30;
    # the ens_adv alias is the same architecture with the adversarially
    # trained release, :26-30)
    "inception_resnet_v2": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/inception_resnet_v2-940b1cd6.pth",
    "ens_adv_inception_resnet_v2": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/ens_adv_inception_resnet_v2-2592a550.pth",
    # Xception (Cadene weights; reference cfg models/xception.py:30-48)
    "xception": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-cadene/xception-43020ad28.pth",
    # Gluon Xception65 (reference cfg models/gluon_xception.py:22-24)
    "gluon_xception65": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/gluon_xception-7015a15c.pth",
    # Aligned Xception (tf_ ports; reference cfg models/xception_aligned.py:33-40)
    "xception41": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_xception_41-e6439c97.pth",
    # Gluon ResNet-D (reference cfg models/gluon_resnet.py:37)
    "gluon_resnet50_v1d": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet50_v1d-818a1b1b.pth",
    # BiT preact ResNetV2 (reference cfg models/resnetv2.py:56-67; TF npz)
    "resnetv2_50x1_bitm": "https://storage.googleapis.com/bit_models/BiT-M-R50x1-ILSVRC2012.npz",
    "resnetv2_101x1_bitm": "https://storage.googleapis.com/bit_models/BiT-M-R101x1-ILSVRC2012.npz",
    "resnetv2_50x3_bitm": "https://storage.googleapis.com/bit_models/BiT-M-R50x3-ILSVRC2012.npz",
    "resnetv2_101x3_bitm": "https://storage.googleapis.com/bit_models/BiT-M-R101x3-ILSVRC2012.npz",
    "resnetv2_152x2_bitm": "https://storage.googleapis.com/bit_models/BiT-M-R152x2-ILSVRC2012.npz",
    "resnetv2_152x4_bitm": "https://storage.googleapis.com/bit_models/BiT-M-R152x4-ILSVRC2012.npz",
    "resnetv2_50x1_bitm_in21k": "https://storage.googleapis.com/bit_models/BiT-M-R50x1.npz",
    "resnetv2_50x3_bitm_in21k": "https://storage.googleapis.com/bit_models/BiT-M-R50x3.npz",
    "resnetv2_101x1_bitm_in21k": "https://storage.googleapis.com/bit_models/BiT-M-R101x1.npz",
    "resnetv2_101x3_bitm_in21k": "https://storage.googleapis.com/bit_models/BiT-M-R101x3.npz",
    "resnetv2_152x2_bitm_in21k": "https://storage.googleapis.com/bit_models/BiT-M-R152x2.npz",
    "resnetv2_152x4_bitm_in21k": "https://storage.googleapis.com/bit_models/BiT-M-R152x4.npz",
    # RepVGG + GENet (reference cfg models/byobnet.py:57-89)
    "repvgg_a2": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-repvgg-weights/repvgg_a2-c1ee6d2b.pth",
    "repvgg_b0": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-repvgg-weights/repvgg_b0-80ac3f1b.pth",
    "repvgg_b1": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-repvgg-weights/repvgg_b1-77ca2989.pth",
    "repvgg_b1g4": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-repvgg-weights/repvgg_b1g4-abde5d92.pth",
    "repvgg_b2": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-repvgg-weights/repvgg_b2-25b7494e.pth",
    "repvgg_b2g4": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-repvgg-weights/repvgg_b2g4-165a85f2.pth",
    "repvgg_b3": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-repvgg-weights/repvgg_b3-199bc50d.pth",
    "repvgg_b3g4": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-repvgg-weights/repvgg_b3g4-73c370bf.pth",
    "gernet_s": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-ger-weights/gernet_s-756b4751.pth",
    "gernet_m": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-ger-weights/gernet_m-0873c53a.pth",
    "gernet_l": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-ger-weights/gernet_l-f31e2e8d.pth",
    # RegNet (reference cfg models/regnet.py:71-96)
    "regnetx_002": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-regnet/regnetx_002-e7e85e5c.pth",
    "regnety_002": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-regnet/regnety_002-e68ca334.pth",
    "regnetx_032": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-regnet/regnetx_032-ed0c7f7e.pth",
    # GhostNet (huawei-noah weights; reference cfg models/ghostnet.py:35-40)
    "ghostnet_100": "https://github.com/huawei-noah/CV-backbones/releases/download/ghostnet_pth/ghostnet_1x.pth",
    "densenet121": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/densenet121_ra-50efcf5c.pth",
    "densenet169": "https://download.pytorch.org/models/densenet169-b2777c0a.pth",
    "densenet201": "https://download.pytorch.org/models/densenet201-c1103571.pth",
    "densenet161": "https://download.pytorch.org/models/densenet161-8d451a50.pth",
    "tv_densenet121": "https://download.pytorch.org/models/densenet121-a639ec97.pth",
    "densenetblur121d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/densenetblur121d_ra-100dcfbc.pth",
    "vgg11": "https://download.pytorch.org/models/vgg11-bbd30ac9.pth",
    "vgg13": "https://download.pytorch.org/models/vgg13-c768596a.pth",
    "vgg16": "https://download.pytorch.org/models/vgg16-397923af.pth",
    "vgg19": "https://download.pytorch.org/models/vgg19-dcbb9e9d.pth",
    # ResNet alias breadth (reference cfg models/resnet.py:46-134):
    # torchvision originals, Facebook SSL/SWSL releases, Instagram ResNeXts.
    "resnet26": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/resnet26-9aa10e23.pth",
    "wide_resnet101_2": "https://download.pytorch.org/models/wide_resnet101_2-32ee1156.pth",
    "tv_resnet34": "https://download.pytorch.org/models/resnet34-333f7ec4.pth",
    "tv_resnet50": "https://download.pytorch.org/models/resnet50-19c8e357.pth",
    "tv_resnet101": "https://download.pytorch.org/models/resnet101-5d3b4d8f.pth",
    "tv_resnet152": "https://download.pytorch.org/models/resnet152-b121ed2d.pth",
    "tv_resnext50_32x4d": "https://download.pytorch.org/models/resnext50_32x4d-7cdf4587.pth",
    "ssl_resnet18": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_supervised_resnet18-d92f0530.pth",
    "ssl_resnet50": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_supervised_resnet50-08389792.pth",
    "ssl_resnext50_32x4d": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_supervised_resnext50_32x4-ddb3e555.pth",
    "ssl_resnext101_32x4d": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_supervised_resnext101_32x4-dc43570a.pth",
    "ssl_resnext101_32x8d": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_supervised_resnext101_32x8-2cfe2f8b.pth",
    "ssl_resnext101_32x16d": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_supervised_resnext101_32x16-15fffa57.pth",
    "swsl_resnet18": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_weakly_supervised_resnet18-118f1556.pth",
    "swsl_resnet50": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_weakly_supervised_resnet50-16a12f1b.pth",
    "swsl_resnext50_32x4d": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_weakly_supervised_resnext50_32x4-72679e44.pth",
    "swsl_resnext101_32x4d": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_weakly_supervised_resnext101_32x4-3f87e46b.pth",
    "swsl_resnext101_32x8d": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_weakly_supervised_resnext101_32x8-b4712904.pth",
    "swsl_resnext101_32x16d": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_weakly_supervised_resnext101_32x16-f3559a9c.pth",
    "ig_resnext101_32x8d": "https://download.pytorch.org/models/ig_resnext101_32x8-c38310e5.pth",
    "ig_resnext101_32x16d": "https://download.pytorch.org/models/ig_resnext101_32x16-c6f796b0.pth",
    "ig_resnext101_32x32d": "https://download.pytorch.org/models/ig_resnext101_32x32-e4b90b00.pth",
    "ig_resnext101_32x48d": "https://download.pytorch.org/models/ig_resnext101_32x48-3e41cc8a.pth",
    # DPN big-stem variants (reference cfg models/dpn.py:40-49)
    "dpn92": "https://github.com/rwightman/pytorch-dpn-pretrained/releases/download/v0.1/dpn92_extra-b040e4a9b.pth",
    "dpn98": "https://github.com/rwightman/pytorch-dpn-pretrained/releases/download/v0.1/dpn98-5b90dec4d.pth",
    "dpn131": "https://github.com/rwightman/pytorch-dpn-pretrained/releases/download/v0.1/dpn131-71dfe43e0.pth",
    "dpn107": "https://github.com/rwightman/pytorch-dpn-pretrained/releases/download/v0.1/dpn107_extra-1ac7121e2.pth",
    # SelecSLS 60/60b (reference cfg models/selecsls.py:44-49)
    "selecsls60": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-selecsls/selecsls60-bbf87526.pth",
    "selecsls60b": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-selecsls/selecsls60b-94e619b5.pth",
    # ReXNet width variants (reference cfg models/rexnet.py:33-41)
    "rexnet_130": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-rexnet/rexnetv1_130-590d768e.pth",
    "rexnet_150": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-rexnet/rexnetv1_150-bd1a6aa8.pth",
    "rexnet_200": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-rexnet/rexnetv1_200-8c0b7f2d.pth",
    # Standalone timm ViT/DeiT classifiers (reference cfg tables
    # models/vision_transformer.py:49-132, vision_transformer_hybrid.py:36-47).
    # ACR short names above ("vitb", "deit", ...) stay the ACR-layout
    # converts; these vit_* names convert to ViTClassifier layout.
    # vit_huge ships via the hub scheme only (reference cfg :95-96).
    "vit_huge_patch14_224_in21k": "hf_hub:timm/vit_huge_patch14_224_in21k",
    "vit_small_patch16_224": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/vit_small_p16_224-15ec54c9.pth",
    "vit_base_patch16_224": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_base_p16_224-80ecf9dd.pth",
    "vit_base_patch16_384": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_base_p16_384-83fb41ba.pth",
    "vit_base_patch32_384": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_base_p32_384-830016f5.pth",
    "vit_large_patch16_224": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_large_p16_224-4ee7a4dc.pth",
    "vit_large_patch16_384": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_large_p16_384-b3be5167.pth",
    "vit_large_patch32_384": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_large_p32_384-9b920ba8.pth",
    "vit_base_patch16_224_in21k": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_base_patch16_224_in21k-e5005f0a.pth",
    "vit_base_patch32_224_in21k": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_base_patch32_224_in21k-8db57226.pth",
    "vit_large_patch16_224_in21k": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_large_patch16_224_in21k-606da67d.pth",
    "vit_large_patch32_224_in21k": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_large_patch32_224_in21k-9046d2e7.pth",
    "vit_deit_tiny_patch16_224": "https://dl.fbaipublicfiles.com/deit/deit_tiny_patch16_224-a1311bcf.pth",
    "vit_deit_small_patch16_224": "https://dl.fbaipublicfiles.com/deit/deit_small_patch16_224-cd65a155.pth",
    "vit_deit_base_patch16_224": "https://dl.fbaipublicfiles.com/deit/deit_base_patch16_224-b5f2ef4d.pth",
    "vit_deit_base_patch16_384": "https://dl.fbaipublicfiles.com/deit/deit_base_patch16_384-8de9b5d1.pth",
    "vit_deit_tiny_distilled_patch16_224": "https://dl.fbaipublicfiles.com/deit/deit_tiny_distilled_patch16_224-b40b3cf7.pth",
    "vit_deit_small_distilled_patch16_224": "https://dl.fbaipublicfiles.com/deit/deit_small_distilled_patch16_224-649709d9.pth",
    "vit_deit_base_distilled_patch16_224": "https://dl.fbaipublicfiles.com/deit/deit_base_distilled_patch16_224-df68dfff.pth",
    "vit_deit_base_distilled_patch16_384": "https://dl.fbaipublicfiles.com/deit/deit_base_distilled_patch16_384-d0272ac0.pth",
    "vit_base_patch16_224_miil_in21k": "https://miil-public-eu.oss-eu-central-1.aliyuncs.com/model-zoo/ImageNet_21K_P/models/timm/vit_base_patch16_224_in21k_miil.pth",
    "vit_base_patch16_224_miil": "https://miil-public-eu.oss-eu-central-1.aliyuncs.com/model-zoo/ImageNet_21K_P/models/timm/vit_base_patch16_224_1k_miil_84_4.pth",
    "vit_base_r50_s16_224_in21k": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_base_resnet50_224_in21k-6f7c7740.pth",
    "vit_base_resnet50_224_in21k": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_base_resnet50_224_in21k-6f7c7740.pth",
    "vit_base_r50_s16_384": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_base_resnet50_384-9fd3c705.pth",
    "vit_base_resnet50_384": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-vitjx/jx_vit_base_resnet50_384-9fd3c705.pth",
    # TResNet variants (reference cfg models/tresnet.py:30-47)
    "tresnet_l": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-tresnet/tresnet_l_81_5-235b486c.pth",
    "tresnet_xl": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-tresnet/tresnet_xl_82_0-a2d51b00.pth",
    "tresnet_m_miil_in21k": "https://miil-public-eu.oss-eu-central-1.aliyuncs.com/model-zoo/ImageNet_21K_P/models/timm/tresnet_m_miil_in21k.pth",
    # Generalized timm-ResNet family (reference cfg models/resnet.py:40-160
    # + gluon_resnet.py:25-70). Names with empty upstream cfg URLs
    # (seresnet18/34/152, senet154, resnext101_32x4d, ...) are omitted
    # here too — parity with the reference's own weightless registry rows.
    "resnet18d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/resnet18d_ra2-48a79e06.pth",
    "resnet26d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/resnet26d-69e92c46.pth",
    "resnet34d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/resnet34d_ra2-f8dcfcaf.pth",
    "resnet50d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/resnet50d_ra2-464e36ba.pth",
    "resnet101d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/resnet101d_ra2-2803ffab.pth",
    "resnet152d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/resnet152d_ra2-5cac0439.pth",
    "resnet200d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/resnet200d_ra2-bdba9bf9.pth",
    "resnext50d_32x4d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/resnext50d_32x4d-103e99f8.pth",
    "ecaresnet26t": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/ecaresnet26t_ra2-46609757.pth",
    "ecaresnet50d": "https://imvl-automl-sh.oss-cn-shanghai.aliyuncs.com/darts/hyperml/hyperml/job_45402/outputs/ECAResNet50D_833caf58.pth",
    "ecaresnet50t": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/ecaresnet50t_ra2-f7ac63c4.pth",
    "ecaresnet50d_pruned": "https://imvl-automl-sh.oss-cn-shanghai.aliyuncs.com/darts/hyperml/hyperml/job_45899/outputs/ECAResNet50D_P_9c67f710.pth",
    "ecaresnet101d_pruned": "https://imvl-automl-sh.oss-cn-shanghai.aliyuncs.com/darts/hyperml/hyperml/job_45610/outputs/ECAResNet101D_P_75a3370e.pth",
    "efficientnet_b1_pruned": "https://imvl-automl-sh.oss-cn-shanghai.aliyuncs.com/darts/hyperml/hyperml/job_45403/outputs/effnetb1_pruned_9ebb3fe6.pth",
    "efficientnet_b2_pruned": "https://imvl-automl-sh.oss-cn-shanghai.aliyuncs.com/darts/hyperml/hyperml/job_45403/outputs/effnetb2_pruned_203f55bc.pth",
    "efficientnet_b3_pruned": "https://imvl-automl-sh.oss-cn-shanghai.aliyuncs.com/darts/hyperml/hyperml/job_45403/outputs/effnetb3_pruned_5abcc29f.pth",
    "ecaresnetlight": "https://imvl-automl-sh.oss-cn-shanghai.aliyuncs.com/darts/hyperml/hyperml/job_45402/outputs/ECAResNetLight_4f34b35b.pth",
    "ecaresnet101d": "https://imvl-automl-sh.oss-cn-shanghai.aliyuncs.com/darts/hyperml/hyperml/job_45402/outputs/ECAResNet101D_281c5844.pth",
    "ecaresnet269d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/ecaresnet269d_320_ra2-7baa55cb.pth",
    "resnetrs50": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-rs-weights/resnetrs50_ema-6b53758b.pth",
    "resnetrs101": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-rs-weights/resnetrs101_i192_ema-1509bbf6.pth",
    "resnetrs152": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-rs-weights/resnetrs152_i256_ema-a9aff7f9.pth",
    "resnetrs200": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-rs-weights/resnetrs200_ema-623d2f59.pth",
    "resnetrs270": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-rs-weights/resnetrs270_ema-b40e674c.pth",
    "resnetrs350": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-rs-weights/resnetrs350_i256_ema-5a1aa8f1.pth",
    "resnetrs420": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-rs-weights/resnetrs420_ema-972dee69.pth",
    "resnetblur50": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/resnetblur50-84f4748f.pth",
    "seresnet152d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/seresnet152d_ra2-04464dd2.pth",
    "seresnext26d_32x4d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/seresnext26d_32x4d-80fa48a3.pth",
    "seresnext26t_32x4d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/seresnext26tn_32x4d-569cb627.pth",
    "seresnext26tn_32x4d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/seresnext26tn_32x4d-569cb627.pth",
    "seresnext50_32x4d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/seresnext50_32x4d_racm-a304a460.pth",
    "gluon_resnet18_v1b": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet18_v1b-0757602b.pth",
    "gluon_resnet34_v1b": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet34_v1b-c6d82d59.pth",
    "gluon_resnet50_v1b": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet50_v1b-0ebe02e2.pth",
    "gluon_resnet101_v1b": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet101_v1b-3b017079.pth",
    "gluon_resnet152_v1b": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet152_v1b-c1edb0dd.pth",
    "gluon_resnet50_v1c": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet50_v1c-48092f55.pth",
    "gluon_resnet101_v1c": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet101_v1c-1f26822a.pth",
    "gluon_resnet152_v1c": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet152_v1c-a3bb0b98.pth",
    "gluon_resnet101_v1d": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet101_v1d-0f9c8644.pth",
    "gluon_resnet152_v1d": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet152_v1d-bd354e12.pth",
    "gluon_resnet50_v1s": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet50_v1s-1762acc0.pth",
    "gluon_resnet101_v1s": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet101_v1s-60fe0cc1.pth",
    "gluon_resnet152_v1s": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnet152_v1s-dcc41b81.pth",
    "gluon_resnext50_32x4d": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnext50_32x4d-e6a097c1.pth",
    "gluon_resnext101_32x4d": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnext101_32x4d-b253c8c4.pth",
    "gluon_resnext101_64x4d": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_resnext101_64x4d-f9a8e184.pth",
    "gluon_seresnext50_32x4d": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_seresnext50_32x4d-90cf2d6e.pth",
    "gluon_seresnext101_32x4d": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_seresnext101_32x4d-cf52900d.pth",
    "gluon_seresnext101_64x4d": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_seresnext101_64x4d-f9926f93.pth",
    "gluon_senet154": "https://github.com/rwightman/pytorch-pretrained-gluonresnet/releases/download/v0.1/gluon_senet154-70a1a3c0.pth",
    # Generic efficientnet-builder zoo (reference cfg
    # models/efficientnet.py:40-260). b5-b8/l2 and the ap/ns-variant
    # checkpoints without upstream URLs are omitted here too — parity.
    "mnasnet_100": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/mnasnet_b1-74cb7081.pth",
    "semnasnet_100": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/mnasnet_a1-d9418771.pth",
    "mobilenetv2_100": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/mobilenetv2_100_ra-b33bc2c4.pth",
    "mobilenetv2_110d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/mobilenetv2_110d_ra-77090ade.pth",
    "mobilenetv2_120d": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/mobilenetv2_120d_ra-5987e2ed.pth",
    "mobilenetv2_140": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/mobilenetv2_140_ra-21a4e913.pth",
    "fbnetc_100": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/fbnetc_100-c345b898.pth",
    "spnasnet_100": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/spnasnet_100-048bc3f4.pth",
    "efficientnet_es": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/efficientnet_es_ra-f111e99c.pth",
    "efficientnet_em": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/efficientnet_em_ra2-66250f76.pth",
    "efficientnet_el": "https://github.com/DeGirum/pruned-models/releases/download/efficientnet_v1.0/efficientnet_el.pth",
    "efficientnet_es_pruned": "https://github.com/DeGirum/pruned-models/releases/download/efficientnet_v1.0/efficientnet_es_pruned75.pth",
    "efficientnet_el_pruned": "https://github.com/DeGirum/pruned-models/releases/download/efficientnet_v1.0/efficientnet_el_pruned70.pth",
    "efficientnet_lite0": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/efficientnet_lite0_ra-37913777.pth",
    "efficientnet_v2s": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/efficientnet_v2s_ra2_288-a6477665.pth",
    "tf_efficientnet_b0": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b0_aa-827b6e33.pth",
    "tf_efficientnet_b1": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b1_aa-ea7a6ee0.pth",
    "tf_efficientnet_b2": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b2_aa-60c94f97.pth",
    "tf_efficientnet_b3": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b3_aa-84b4657e.pth",
    "tf_efficientnet_b4": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b4_aa-818f208c.pth",
    "tf_efficientnet_b5": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b5_ra-9a3e5369.pth",
    "tf_efficientnet_b6": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b6_aa-80ba17e4.pth",
    "tf_efficientnet_b7": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b7_ra-6c08e654.pth",
    "tf_efficientnet_b8": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b8_ra-572d5dd9.pth",
    "tf_efficientnet_b0_ap": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b0_ap-f262efe1.pth",
    "tf_efficientnet_b1_ap": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b1_ap-44ef0a3d.pth",
    "tf_efficientnet_b2_ap": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b2_ap-2f8e7636.pth",
    "tf_efficientnet_b3_ap": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b3_ap-aad25bdd.pth",
    "tf_efficientnet_b4_ap": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b4_ap-dedb23e6.pth",
    "tf_efficientnet_b5_ap": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b5_ap-9e82fae8.pth",
    "tf_efficientnet_b6_ap": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b6_ap-4ffb161f.pth",
    "tf_efficientnet_b7_ap": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b7_ap-ddb28fec.pth",
    "tf_efficientnet_b8_ap": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b8_ap-00e169fa.pth",
    "tf_efficientnet_b0_ns": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b0_ns-c0e6a31c.pth",
    "tf_efficientnet_b1_ns": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b1_ns-99dd0c41.pth",
    "tf_efficientnet_b2_ns": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b2_ns-00306e48.pth",
    "tf_efficientnet_b3_ns": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b3_ns-9d44bf68.pth",
    "tf_efficientnet_b4_ns": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b4_ns-d6313a46.pth",
    "tf_efficientnet_b5_ns": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b5_ns-6f26d0cf.pth",
    "tf_efficientnet_b6_ns": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b6_ns-51548356.pth",
    "tf_efficientnet_b7_ns": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b7_ns-1dbc32de.pth",
    "tf_efficientnet_l2_ns_475": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_l2_ns_475-bebbd00a.pth",
    "tf_efficientnet_l2_ns": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_l2_ns-df73bb44.pth",
    "tf_efficientnet_es": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_es-ca1afbfe.pth",
    "tf_efficientnet_em": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_em-e78cfe58.pth",
    "tf_efficientnet_el": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_el-5143854e.pth",
    "tf_efficientnet_lite0": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_lite0-0aa007d2.pth",
    "tf_efficientnet_lite1": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_lite1-bde8b488.pth",
    "tf_efficientnet_lite2": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_lite2-dcccb7df.pth",
    "tf_efficientnet_lite3": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_lite3-b733e338.pth",
    "tf_efficientnet_lite4": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_lite4-741542c3.pth",
    "tf_efficientnet_cc_b0_4e": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_cc_b0_4e-4362b6b2.pth",
    "tf_efficientnet_cc_b0_8e": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_cc_b0_8e-66184a25.pth",
    "tf_efficientnet_cc_b1_8e": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_cc_b1_8e-f7c79ae1.pth",
    # MixNet (reference cfg models/efficientnet.py:246-262)
    "mixnet_s": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/mixnet_s-a907afbc.pth",
    "mixnet_m": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/mixnet_m-4647fc68.pth",
    "mixnet_l": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/mixnet_l-5a9a2ed8.pth",
    "mixnet_xl": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/mixnet_xl_ra-aac3c00c.pth",
    "tf_mixnet_s": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_mixnet_s-89d3354b.pth",
    "tf_mixnet_m": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_mixnet_m-0f4d8805.pth",
    "tf_mixnet_l": "https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_mixnet_l-6c92e0c8.pth",
}


def zoo_dir() -> str:
    return os.environ.get(
        "ACR_WSSS_ZOO",
        os.path.join(os.path.expanduser("~"), ".cache", "acr_wsss_tpu", "zoo"),
    )


def npz_path(backbone: str, directory: Optional[str] = None) -> str:
    return os.path.join(directory or zoo_dir(), f"{backbone}_in21k.npz")


def hf_file_url(hf_ref: str, filename: str) -> str:
    """URL of one file in an HF model repo (reference ``models/hub.py:
    hf_hub_url`` semantics). ``hf_ref`` is ``[hf_hub:]org/name[@revision]``.

    ``ACR_WSSS_HF_ENDPOINT`` overrides the hub host — pointing it at a
    ``file://`` tree serves hermetic fixtures in zero-egress environments
    (the test story for hf_hub-sourced ``create_model``)."""
    if hf_ref.startswith("hf_hub:"):
        hf_ref = hf_ref[len("hf_hub:"):]
    parts = hf_ref.split("@")
    if not (1 <= len(parts) <= 2) or not parts[0]:
        raise ValueError(f"bad hf_hub reference {hf_ref!r}")
    revision = parts[1] if len(parts) == 2 else "main"
    endpoint = os.environ.get("ACR_WSSS_HF_ENDPOINT",
                              "https://huggingface.co")
    return f"{endpoint}/{parts[0]}/resolve/{revision}/{filename}"


def hf_hub_to_url(hf_ref: str) -> str:
    """Resolve the reference's hub scheme to a plain checkpoint URL.

    ``hf_hub:org/name[@revision]`` (models/hub.py:63-96: ``hf_split`` +
    ``hf_hub_url(model_id, 'pytorch_model.bin', revision)``) resolves to
    the repo's ``pytorch_model.bin`` on the HF CDN. Same zero-egress story
    as plain URLs: fetch elsewhere, pass ``--url file://<path>`` here.
    """
    return hf_file_url(hf_ref, "pytorch_model.bin")


def fetch_hf_file(hf_ref: str, filename: str,
                  directory: Optional[str] = None,
                  timeout: float = 600.0) -> str:
    """Download-and-cache one HF repo file (reference ``models/hub.py:
    _download_from_hf``: ``cached_download(hf_hub_url(...))`` into the
    torch-hub ``hf`` cache dir). Cached under ``<zoo>/hf/<flat name>``."""
    import shutil
    import urllib.error
    import urllib.request

    import re

    directory = directory or os.path.join(zoo_dir(), "hf")
    if hf_ref.startswith("hf_hub:"):
        hf_ref = hf_ref[len("hf_hub:"):]
    # Collision-free cache layout: one directory level per repo-ref
    # component ("org/name[@rev]" -> <cache>/org/name@rev/<filename>),
    # so distinct repos can never flatten onto the same key (e.g.
    # "org_a/b" vs "org/a_b" under the old '_'-joined scheme).
    safe = [re.sub(r"[^A-Za-z0-9._@-]", "_", part) or "_"
            for part in hf_ref.split("/")]
    directory = os.path.join(directory, *safe)
    os.makedirs(directory, exist_ok=True)
    out = os.path.join(directory, filename)
    if os.path.exists(out):
        return out
    url = hf_file_url(hf_ref, filename)
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r:  # noqa: S310
            with open(out + ".part", "wb") as f:
                shutil.copyfileobj(r, f)
        os.replace(out + ".part", out)
    except (urllib.error.URLError, OSError) as e:
        raise RuntimeError(
            f"cannot download {url} (no egress?): {e}. Mirror the repo "
            "file tree locally and set ACR_WSSS_HF_ENDPOINT=file://<root>."
        ) from e
    return out


def load_hf_model_config(hf_ref: str) -> Dict:
    """Fetch + parse an HF repo's ``config.json`` (reference
    ``models/hub.py:load_model_config_from_hf``). The returned dict gains
    ``hf_hub: <model id>`` so the weight load can find the repo again."""
    import json

    path = fetch_hf_file(hf_ref, "config.json")
    with open(path, encoding="utf-8") as f:
        cfg = json.load(f)
    if hf_ref.startswith("hf_hub:"):
        hf_ref = hf_ref[len("hf_hub:"):]
    cfg["hf_hub"] = hf_ref
    return cfg


def load_hf_state_dict(hf_ref: str) -> Dict:
    """Fetch an HF repo's ``pytorch_model.bin`` and load the state dict
    (reference ``models/hub.py:load_state_dict_from_hf``)."""
    import torch

    path = fetch_hf_file(hf_ref, "pytorch_model.bin")
    state = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("model", "state_dict"):
        if isinstance(state, dict) and key in state:
            state = state[key]
    return state


def fetch(backbone: str, directory: Optional[str] = None,
          url: Optional[str] = None, timeout: float = 600.0) -> str:
    """Download + convert a pretrained checkpoint into the npz zoo.

    Returns the npz path. Raises a clear error when the environment has no
    egress — conversion from a local .pth works via ``url='file://...'``.
    """
    import urllib.error
    import urllib.request

    from acr_wsss_tpu.utils.checkpoint import save_params_npz

    url = url or ZOO_URLS.get(backbone)
    if not url:
        raise ValueError(f"no zoo URL for backbone {backbone!r}")
    local_name = None
    if url.startswith("hf_hub:"):
        # Every HF repo serves the same basename (pytorch_model.bin), so
        # cache hf downloads under a per-backbone filename.
        url = hf_hub_to_url(url)
        local_name = f"{backbone}_pytorch_model.bin"
    directory = directory or zoo_dir()
    os.makedirs(directory, exist_ok=True)
    out = npz_path(backbone, directory)
    if os.path.exists(out):
        return out

    pth = os.path.join(directory, local_name or os.path.basename(url))
    if not os.path.exists(pth):
        try:
            import shutil

            # urlopen (not urlretrieve) so the timeout applies; write to a
            # temp name so an interrupted download never shadows the cache.
            with urllib.request.urlopen(url, timeout=timeout) as r:  # noqa: S310
                with open(pth + ".part", "wb") as f:
                    shutil.copyfileobj(r, f)
            os.replace(pth + ".part", pth)
        except (urllib.error.URLError, OSError) as e:
            raise RuntimeError(
                f"cannot download {url} (no egress?): {e}. Fetch the file "
                f"on a connected machine and re-run with --url file://<path>."
            ) from e
    _validate_checkpoint_file(pth)

    if pth.endswith(".npz"):  # BiT releases ship TF-layout npz, not torch
        from acr_wsss_tpu.models.convert import bit_npz_to_torch_names

        state = bit_npz_to_torch_names(dict(np.load(pth)))
    else:
        import torch

        state = torch.load(pth, map_location="cpu", weights_only=True)
        if isinstance(state, dict) and "model" in state:
            state = state["model"]  # deit/swin checkpoints nest under 'model'
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]  # tnt .pth.tar style nesting
    params = convert_state_dict(backbone, state)
    save_params_npz(out, params)
    return out


def convert_state_dict(backbone: str, state: Dict):
    """Dispatch a raw timm state dict to the right family converter.

    ViT-family backbones go through the ACR converter (which expects the
    reference ``pretrained.model.`` prefix and emits a ``trunk`` subtree);
    Swin/PiT use their standalone converters (``models/convert.py``).
    """
    from acr_wsss_tpu.models.resnet_timm import _TIMM_RESNET_CFGS

    if backbone in _TIMM_RESNET_CFGS:
        # generalized timm-ResNet targets (d/t stems, eca, rs, blur,
        # senet154, gluon b/c/d/s) — checked BEFORE the prefix rules so
        # e.g. resnet50d doesn't fall into the plain-resnet converter
        from acr_wsss_tpu.models.convert import (
            timm_resnet_state_dict_to_flax,
        )

        return timm_resnet_state_dict_to_flax(state)
    if backbone.startswith("swin"):
        from acr_wsss_tpu.models.convert import swin_state_dict_to_flax

        return swin_state_dict_to_flax(state)
    if backbone.startswith("pit"):
        from acr_wsss_tpu.models.convert import pit_state_dict_to_flax

        return pit_state_dict_to_flax(state)
    if backbone.startswith("gluon_resnet"):
        from acr_wsss_tpu.models.convert import (
            gluon_resnet_d_state_dict_to_flax,
        )

        return gluon_resnet_d_state_dict_to_flax(state)
    if backbone.startswith("resnetv2") and ("_bitm" in backbone):
        from acr_wsss_tpu.models.convert import (
            resnetv2_bit_state_dict_to_flax,
        )

        return resnetv2_bit_state_dict_to_flax(state)
    if backbone.startswith(("resnet", "resnext", "wide_resnet", "tv_resnet",
                            "tv_resnext", "ssl_resne", "swsl_resne",
                            "ig_resnext")):
        # tv_/ssl_/swsl_/ig_ prefixed aliases all use the plain
        # torchvision-layout checkpoints (reference resnet.py:76-134).
        from acr_wsss_tpu.models.convert import resnet_state_dict_to_flax

        return resnet_state_dict_to_flax(state)
    if backbone.startswith("hrnet"):
        from acr_wsss_tpu.models.convert import hrnet_state_dict_to_flax

        return hrnet_state_dict_to_flax(state)
    if backbone.startswith(("legacy_seresnet", "legacy_senet",
                            "legacy_seresnext")):
        from acr_wsss_tpu.models.convert import (
            legacy_senet_state_dict_to_flax,
        )

        return legacy_senet_state_dict_to_flax(state)
    if backbone.startswith(("seresnet", "res2net", "resnest")):
        from acr_wsss_tpu.models.convert import (
            attn_resnet_state_dict_to_flax,
        )

        return attn_resnet_state_dict_to_flax(state)
    if backbone == "xception":
        from acr_wsss_tpu.models.convert import xception_state_dict_to_flax

        return xception_state_dict_to_flax(state)
    if re.match(r"xception\d+$", backbone):
        from acr_wsss_tpu.models.convert import (
            xception_aligned_state_dict_to_flax,
        )

        return xception_aligned_state_dict_to_flax(state)
    if backbone.startswith("gluon_xception"):
        from acr_wsss_tpu.models.convert import (
            gluon_xception_state_dict_to_flax,
        )

        return gluon_xception_state_dict_to_flax(state)
    if backbone.startswith("ghostnet"):
        from acr_wsss_tpu.models.convert import ghostnet_state_dict_to_flax

        return ghostnet_state_dict_to_flax(state)
    if backbone.startswith(("inception_resnet_v2",
                            "ens_adv_inception_resnet_v2")):
        from acr_wsss_tpu.models.convert import (
            inception_resnet_v2_state_dict_to_flax,
        )

        return inception_resnet_v2_state_dict_to_flax(state)
    if backbone.startswith("inception_v4"):
        from acr_wsss_tpu.models.convert import (
            inception_v4_state_dict_to_flax,
        )

        return inception_v4_state_dict_to_flax(state)
    if backbone.startswith(("inception_v3", "tf_inception_v3",
                            "adv_inception_v3", "gluon_inception_v3")):
        from acr_wsss_tpu.models.convert import (
            inception_v3_state_dict_to_flax,
        )

        return inception_v3_state_dict_to_flax(state)
    if (backbone.startswith(("tf_efficientnet", "tf_mobilenetv3",
                             "mixnet", "tf_mixnet",
                             "mnasnet", "semnasnet",
                             "mobilenetv2", "fbnetc", "spnasnet"))
            or backbone in ("mobilenetv3_large_075", "mobilenetv3_rw",
                            "mobilenetv3_small_075",
                            "mobilenetv3_small_100", "hardcorenas_b",
                            "hardcorenas_c", "hardcorenas_d",
                            "hardcorenas_e", "hardcorenas_f")
            or (backbone.startswith("efficientnet")
                and backbone not in ("efficientnet_b0", "efficientnet_b1",
                                     "efficientnet_b2", "efficientnet_b3",
                                     "efficientnet_b4"))):
        # all GenericEfficientNet targets (effnet b5-l2/lite/edge/v2s,
        # tf_ ports, mnasnet family, mbv2, fbnetc, spnasnet)
        from acr_wsss_tpu.models.convert import (
            generic_effnet_state_dict_to_flax,
        )

        return generic_effnet_state_dict_to_flax(state)
    if backbone.startswith("efficientnet"):
        from acr_wsss_tpu.models.convert import (
            efficientnet_state_dict_to_flax,
        )

        return efficientnet_state_dict_to_flax(state)
    if backbone.startswith("vgg"):
        from acr_wsss_tpu.models.convert import vgg_state_dict_to_flax

        return vgg_state_dict_to_flax(state)
    if backbone.startswith(("densenet", "tv_densenet")):
        from acr_wsss_tpu.models.convert import densenet_state_dict_to_flax

        return densenet_state_dict_to_flax(state)
    if backbone.startswith("gernet"):
        from acr_wsss_tpu.models.convert import gernet_state_dict_to_flax

        return gernet_state_dict_to_flax(state)
    if backbone.startswith("repvgg"):
        from acr_wsss_tpu.models.convert import repvgg_state_dict_to_flax

        return repvgg_state_dict_to_flax(state)
    if backbone.startswith("regnet"):
        from acr_wsss_tpu.models.convert import regnet_state_dict_to_flax

        return regnet_state_dict_to_flax(state)
    if backbone.startswith(("nf_resnet", "nf_seresnet", "nf_ecaresnet")):
        from acr_wsss_tpu.models.convert import nf_resnet_state_dict_to_flax

        return nf_resnet_state_dict_to_flax(state)
    if backbone.startswith(("pnasnet", "nasnet")):
        from acr_wsss_tpu.models.convert import pnasnet_state_dict_to_flax

        return pnasnet_state_dict_to_flax(state)
    if backbone.startswith(("dm_nfnet", "nfnet_f", "nfnet_l", "eca_nfnet",
                            "nf_regnet")) and backbone != "nfnet_f0":
        # nfnet_f0 keeps the haiku-style NFNet class (no timm checkpoint
        # upstream either); every other nfnet_* name is a NormFreeNetT.
        from acr_wsss_tpu.models.convert import dm_nfnet_state_dict_to_flax

        return dm_nfnet_state_dict_to_flax(state)
    if backbone.startswith(("skresnet", "skresnext")):
        from acr_wsss_tpu.models.convert import sknet_state_dict_to_flax

        return sknet_state_dict_to_flax(state)
    if backbone.startswith("coat"):
        from acr_wsss_tpu.models.convert import coat_state_dict_to_flax

        return coat_state_dict_to_flax(state)
    if backbone.startswith("tresnet"):
        from acr_wsss_tpu.models.convert import tresnet_state_dict_to_flax

        return tresnet_state_dict_to_flax(state)
    if backbone.startswith("dla"):
        from acr_wsss_tpu.models.convert import dla_state_dict_to_flax

        return dla_state_dict_to_flax(state)
    if backbone.startswith("dpn"):
        from acr_wsss_tpu.models.convert import dpn_state_dict_to_flax

        return dpn_state_dict_to_flax(state)
    if backbone.startswith("tnt"):
        from acr_wsss_tpu.models.convert import tnt_state_dict_to_flax

        return tnt_state_dict_to_flax(state)
    if backbone.startswith("rexnet"):
        from acr_wsss_tpu.models.convert import rexnet_state_dict_to_flax

        return rexnet_state_dict_to_flax(state)
    if backbone.startswith(("cspresnet", "cspresnext", "cspdarknet",
                            "darknet")):
        from acr_wsss_tpu.models.convert import cspnet_state_dict_to_flax

        return cspnet_state_dict_to_flax(state)
    if "vovnet" in backbone:
        from acr_wsss_tpu.models.convert import vovnet_state_dict_to_flax

        return vovnet_state_dict_to_flax(state)
    if backbone.startswith("selecsls"):
        from acr_wsss_tpu.models.convert import selecsls_state_dict_to_flax

        return selecsls_state_dict_to_flax(state)
    if backbone.startswith("hardcorenas"):
        from acr_wsss_tpu.models.convert import hardcorenas_state_dict_to_flax

        return hardcorenas_state_dict_to_flax(state)
    if backbone.startswith("mobilenetv3"):
        from acr_wsss_tpu.models.convert import (
            mobilenetv3_state_dict_to_flax,
        )

        return mobilenetv3_state_dict_to_flax(state)

    if backbone.startswith("vit_"):
        # standalone timm ViT/DeiT classifier checkpoints (incl. hybrids
        # and distilled heads) -> ViTClassifier layout
        from acr_wsss_tpu.models.convert import vit_timm_state_dict_to_flax

        return vit_timm_state_dict_to_flax(state)

    from acr_wsss_tpu.models.acr import resolve_backbone
    from acr_wsss_tpu.models.convert import torch_state_dict_to_flax

    spec = resolve_backbone(backbone)
    state = {f"pretrained.model.{k}": v for k, v in state.items()}
    return torch_state_dict_to_flax(
        state, num_prefix_tokens=spec.num_prefix_tokens)


def _validate_checkpoint_file(pth: str) -> None:
    """Fail fast with a clear message on truncated/corrupt downloads,
    instead of a shape error deep inside the converter.

    timm-convention filenames carry the first 8 hex chars of the file's
    sha256 after the last ``-`` (e.g. ``jx_vit_base_p16_384-83fb41ba.pth``);
    when present, the digest is verified.
    """
    import hashlib
    import re

    size = os.path.getsize(pth)
    if size < 1 << 20:
        raise RuntimeError(
            f"{pth} is only {size} bytes — truncated download or an error "
            f"page. Delete it and re-fetch.")
    m = re.search(r"-([0-9a-f]{8})\.pth$", os.path.basename(pth))
    if m:
        h = hashlib.sha256()
        with open(pth, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        if not h.hexdigest().startswith(m.group(1)):
            raise RuntimeError(
                f"{pth}: sha256 {h.hexdigest()[:8]} != filename digest "
                f"{m.group(1)} — corrupt download. Delete it and re-fetch.")


def load_backbone_params(backbone: str, directory: Optional[str] = None):
    """Zoo npz -> ``{'params': {'trunk': ...}}`` tree (no torch needed)."""
    from acr_wsss_tpu.utils.checkpoint import load_params_npz

    path = npz_path(backbone, directory)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found; run `python -m acr_wsss_tpu.models.zoo "
            f"fetch {backbone}` first (see module docstring for zero-egress "
            f"environments)")
    return load_params_npz(path)


def init_with_pretrained(model, rng, dummy_input,
                         directory: Optional[str] = None):
    """model.init with the trunk grafted from the zoo; head stays random
    (reference classifier-filtered ``load_pretrained``)."""
    params = model.init(rng, dummy_input)
    pretrained = load_backbone_params(model.backbone_name, directory)
    if ("blocks_scan" in params["params"]["trunk"]
            and any(k.startswith("blocks_") and k != "blocks_scan"
                    for k in pretrained["params"]["trunk"])):
        # scan_blocks models (pipeline parallelism, the inference trunk)
        # expect the stacked trunk/blocks_scan/block layout; zoo npz files
        # store the unrolled per-block one.
        from acr_wsss_tpu.models.convert import unrolled_to_scanned

        pretrained = unrolled_to_scanned(pretrained)
    params = dict(params)
    inner = dict(params["params"])
    inner["trunk"] = pretrained["params"]["trunk"]
    params["params"] = inner
    return params


def graft_standalone(params, pretrained, verbose: bool = True):
    """Graft zoo weights onto a standalone (Swin/PiT) model's init tree.

    timm classifier-filtering semantics (reference ``models/helpers.py:24-49``):
    leaves whose shapes match are copied; the ImageNet ``head`` (and any
    other shape-mismatched leaf) keeps its fresh initialization. PiT's
    ``pos_embed`` is the one resolution-dependent leaf — it is bilinearly
    resized over the grid axes when the training resolution differs from
    the checkpoint's (the standalone analogue of the ViT
    ``_resize_pos_embed``, reference ``models/vision_transformer.py``).
    """
    import jax
    import jax.numpy as jnp

    flat_init = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_pre = jax.tree_util.tree_flatten_with_path(pretrained)[0]
    out = dict(flat_init)
    skipped = []
    for path, leaf in flat_pre:
        if path not in flat_init:
            skipped.append((jax.tree_util.keystr(path), "no target"))
            continue
        target = flat_init[path]
        if target.shape == leaf.shape:
            out[path] = jnp.asarray(leaf, target.dtype)
        elif jax.tree_util.keystr(path).endswith("['pos_embed']") and \
                leaf.ndim == 4 and target.shape[-1] == leaf.shape[-1]:
            out[path] = jax.image.resize(
                jnp.asarray(leaf, jnp.float32),
                target.shape, method="bilinear").astype(target.dtype)
        else:
            skipped.append((jax.tree_util.keystr(path),
                            f"{leaf.shape} vs {target.shape}"))
    if verbose and skipped:
        print("zoo graft skipped:", skipped, flush=True)
    leaves = [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), leaves)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="pretrained-weight zoo")
    sub = parser.add_subparsers(dest="cmd", required=True)
    f = sub.add_parser("fetch", help="download + convert to npz")
    f.add_argument("backbone", choices=sorted(ZOO_URLS))
    f.add_argument("--dir", default=None)
    f.add_argument("--url", default=None,
                   help="override source (file://... for local .pth)")
    ls = sub.add_parser("list", help="show zoo contents")
    ls.add_argument("--dir", default=None)
    args = parser.parse_args(argv)
    if args.cmd == "fetch":
        print(fetch(args.backbone, args.dir, args.url))
    else:
        d = args.dir or zoo_dir()
        for fn in sorted(os.listdir(d)) if os.path.isdir(d) else []:
            print(os.path.join(d, fn))


if __name__ == "__main__":
    main()
