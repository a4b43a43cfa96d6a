from acr_wsss_tpu.models import acr as _acr  # noqa: F401  (registers ACR builders)
from acr_wsss_tpu.models.acr import ACR, BACKBONES, resolve_backbone  # noqa: F401
from acr_wsss_tpu.models.registry import (  # noqa: F401
    create_model,
    get_default_cfg,
    get_model_default_value,
    has_model_default_key,
    is_model,
    is_model_default_key,
    is_model_in_modules,
    is_model_pretrained,
    list_models,
    list_modules,
    register_model,
    safe_model_name,
    split_model_name,
)
from acr_wsss_tpu.models.vit import VisionTransformer  # noqa: F401
from acr_wsss_tpu.models.hybrid import ResNetV2Stem  # noqa: F401
from acr_wsss_tpu.models import cnn as _cnn  # noqa: F401  (resnet/vgg/densenet)
from acr_wsss_tpu.models import cnn_mobile as _cnnm  # noqa: F401  (effnet/mbv3/regnet)
from acr_wsss_tpu.models import cnn_attn as _cnna  # noqa: F401  (senet/sknet/res2net/resnest)
from acr_wsss_tpu.models import inception as _inc  # noqa: F401  (inception v3/v4/resnet-v2, xception x3)
from acr_wsss_tpu.models import cnn_misc as _cnnx  # noqa: F401  (dpn/dla/csp/vovnet/ghost/rexnet/selecsls/tresnet/gluon-d/hardcorenas)
from acr_wsss_tpu.models import vit_classifier as _vitc  # noqa: F401  (timm ViT/DeiT classifier registry)
from acr_wsss_tpu.models import resnet_timm as _rtimm  # noqa: F401  (generalized timm-ResNet long tail: d/t stems, eca, rs, blur, senet154, gluon)
from acr_wsss_tpu.models import effnet_builder as _effb  # noqa: F401  (generic MBConv-stack zoo: effnet b5-l2/lite/edge/v2s, tf_ ports, mnasnet/mbv2/fbnetc/spnasnet)
from acr_wsss_tpu.models import hrnet as _hrnet  # noqa: F401  (hrnet w18/w32)
from acr_wsss_tpu.models import nfnet as _nfnet  # noqa: F401  (nfnet_f0/nf_resnet50)
from acr_wsss_tpu.models import tnt_coat as _tntc  # noqa: F401  (tnt_s, coat_lite)
from acr_wsss_tpu.models import byob as _byob  # noqa: F401  (gernet/repvgg/botnet)
from acr_wsss_tpu.models import nasnet as _nas  # noqa: F401  (nasnet-a, pnasnet-5)
from acr_wsss_tpu.models import swin as _swin  # noqa: F401
from acr_wsss_tpu.models import pit as _pit  # noqa: F401
