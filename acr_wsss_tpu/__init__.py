"""acr_wsss_tpu — TPU-native framework for All-pairs Consistency Learning WSSS.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
OpenNLPLab/ACR_WSSS (ICCV 2023 Workshop, arXiv:2308.04321):

* multi-label ViT classifier training with siamese all-pairs attention
  consistency (reference ``train_acr.py``),
* gradient-weighted attention CAM generation, "GETAM"
  (reference ``infer_cam.py`` / ``DPT/ACR.py:177-215``),
* pseudo-mask evaluation with background-threshold sweep
  (reference ``evaluation.py``),
* refinement kernels: PAMR, dense-CRF mean-field, permutohedral bilateral
  filtering (reference ``pamr.py``, ``tool/imutils.py``,
  ``wrapper/bilateralfilter/``).

Everything on the device side is functional JAX compiled by XLA; the hot
attention op has a fused Pallas TPU kernel; parallelism is expressed with
``jax.sharding`` over a device mesh rather than NCCL process groups.
"""

__version__ = "0.1.0"
